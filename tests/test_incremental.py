"""Incremental-update equivalence: incremental == clean rebuild.

The reference's hardest-won invariant (issue #532,
``evals/README.md:133-175``): after editing pages, updating the existing
graph must produce exactly what a clean rebuild over the edited corpus
produces — for edges AND nodes.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.pipelines.kg import build_kg, incremental_update
from code_graph_rag_ray.sources.pages import generate_pages


def _edge_set(df):
    return set(map(tuple, df[["subj", "pred", "obj", "provenance_url"]].itertuples(index=False)))


def test_incremental_equals_clean_rebuild():
    fx_a = generate_pages(150, seed=42)
    fx_b = generate_pages(150, seed=99)

    # v2 corpus: pages 0-19 get page B's html under page A's url (an edit);
    # pages 20-24 are deleted (empty html)
    a = fx_a.pages.to_pylist()
    b = fx_b.pages.to_pylist()
    v2 = []
    changed = []
    for i, row in enumerate(a):
        r = dict(row)
        if i < 20:
            r["html"] = b[i]["html"]
            changed.append(r)
        elif i < 25:
            r["html"] = b""
            changed.append(r)
        v2.append(r)

    schema = fx_a.pages.schema
    v2_tbl = pa.Table.from_pylist(v2, schema=schema)
    changed_tbl = pa.Table.from_pylist(changed, schema=schema)

    # v1 build (the "existing graph" state)
    kg1 = build_kg(rd.from_arrow(fx_a.pages), fx_a.alias_dict)

    # incremental: apply the 25 changed pages on top of v1's mentions
    inc = incremental_update(
        rd.from_arrow(changed_tbl), fx_a.alias_dict, prev_mentions=kg1["mentions"]
    )
    # clean rebuild over the full v2 corpus
    clean = build_kg(rd.from_arrow(v2_tbl), fx_a.alias_dict)

    assert _edge_set(inc["edges"].to_pandas()) == _edge_set(clean["edges"].to_pandas())

    inc_nodes = inc["nodes"].to_pandas().sort_values("entity_id").reset_index(drop=True)
    clean_nodes = clean["nodes"].to_pandas().sort_values("entity_id").reset_index(drop=True)
    assert inc_nodes[["entity_id", "name", "label", "n_mentions"]].equals(
        clean_nodes[["entity_id", "name", "label", "n_mentions"]]
    )

    ext_i = set(inc["external_edges"].to_pandas().obj)
    ext_c = set(clean["external_edges"].to_pandas().obj)
    assert ext_i == ext_c


def test_incremental_bucketed_fallback_bit_equal(monkeypatch):
    """Budget forced to 0 → the changed-url drop takes the bucketed ANTI
    semi-join path; the result must be bit-equal to the broadcast path
    (the adaptive_join contract applied to incremental_update)."""
    fx_a = generate_pages(80, seed=43)
    fx_b = generate_pages(80, seed=77)
    a, b = fx_a.pages.to_pylist(), fx_b.pages.to_pylist()
    changed = []
    for i in range(10):
        r = dict(a[i])
        r["html"] = b[i]["html"]
        changed.append(r)
    changed_tbl = pa.Table.from_pylist(changed, schema=fx_a.pages.schema)

    kg1 = build_kg(rd.from_arrow(fx_a.pages), fx_a.alias_dict)
    prev = kg1["mentions"].materialize()

    broadcast = incremental_update(
        rd.from_arrow(changed_tbl), fx_a.alias_dict, prev_mentions=prev,
        build_nodes=False,
    )
    e_broadcast = _edge_set(broadcast["edges"].to_pandas())

    monkeypatch.setenv("GRAFT_BROADCAST_BUDGET", "0")
    bucketed = incremental_update(
        rd.from_arrow(changed_tbl), fx_a.alias_dict, prev_mentions=prev,
        build_nodes=False,
    )
    assert _edge_set(bucketed["edges"].to_pandas()) == e_broadcast
