"""Catalog ↔ DuckDB-oracle parity at sf0.001 (mirrors the driver's gate)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")  # tools/ + __ray_entry__ live at repo root

from tools.check_oracles import compare, to_pandas  # noqa: E402

from code_graph_rag_ray.pipelines.catalog import ORACLES, QUERIES  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def test_oracles_are_a_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, sf_dir, duck):
    ray_df = to_pandas(QUERIES[name](sf_dir))
    sql_df = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, ray_df, sql_df)
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, sf_dir):
    """Oracle-less operators must still run end-to-end and return a frame
    with stable, non-empty schema (the driver's weaker check)."""
    df = to_pandas(QUERIES[name](sf_dir))
    assert list(df.columns)  # stable schema
    # near-dup searches may legitimately find nothing in the synthetic
    # corpus; everything else must produce rows
    if name not in ("doc_minhash_pairs", "embedding_dup_pairs"):
        assert len(df) > 0
