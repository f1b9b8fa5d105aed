"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

No ``ray.init()``/``ray.shutdown()`` here or in the library — the driver
owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full KG construction (extract → link → triples)
    over pages derived from /root/testdata/sf0.001 documents."""
    from code_graph_rag_ray.context import configure_data_context
    from code_graph_rag_ray.pipelines.catalog import kg_doc_triples

    configure_data_context()
    return kg_doc_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from code_graph_rag_ray.context import configure_data_context
    from code_graph_rag_ray.pipelines.catalog import QUERIES

    configure_data_context()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from code_graph_rag_ray.pipelines.catalog import ORACLES

    return dict(ORACLES)
