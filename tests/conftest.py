"""Shared test fixtures.

One Ray session per pytest run (session-scoped), per the driver contract.
Mirrors the reference's conftest philosophy (``tests/conftest.py:104-147``):
tests must FAIL on silently-swallowed per-row errors — pipelines expose an
``error`` side-channel column, and fixtures assert it where relevant.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    from code_graph_rag_ray.context import configure_data_context

    # 8 CPUs: enough headroom that a 2-actor pool plus read/write tasks never
    # starve each other (at 4 CPUs two stacked actor stages can deadlock the
    # streaming executor on a tiny cluster)
    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    configure_data_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_fixture(tmp_path_factory):
    """Seeded 300-page corpus with oracle companions, written to parquet."""
    from code_graph_rag_ray.sources.pages import write_fixture

    out = tmp_path_factory.mktemp("pages_fx")
    fx = write_fixture(str(out), n_pages=300, seed=42)
    return fx, str(out)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
