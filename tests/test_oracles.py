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


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, sf_dir, duck):
    ray_df = to_pandas(QUERIES[name](sf_dir))
    sql_df = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, ray_df, sql_df)
    assert not problems, problems
