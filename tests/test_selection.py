"""Exact continuous-quantile selection (stages/selection.py) vs DuckDB."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from code_graph_rag_ray.stages.selection import quantile_select

QS = {"p01": 0.01, "p25": 0.25, "p50": 0.5, "p90": 0.9, "p999": 0.999}


def _check(vals: np.ndarray, **kw):
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(13)
    got = quantile_select(ds, value_col="v", qs=QS, **kw)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    exp = con.execute(
        """SELECT count(v)::BIGINT AS n,
                  quantile_disc(v, 0.01) AS p01, quantile_disc(v, 0.25) AS p25,
                  quantile_disc(v, 0.50) AS p50, quantile_disc(v, 0.90) AS p90,
                  quantile_disc(v, 0.999) AS p999
           FROM t"""
    ).fetchone()
    assert got["n"] == exp[0]
    for i, a in enumerate(["p01", "p25", "p50", "p90", "p999"]):
        assert got[a] == exp[i + 1], (a, got[a], exp[i + 1])


def test_uniform_forced_refinement():
    rng = np.random.default_rng(5)
    _check(rng.uniform(-1000, 1000, 20_000), pull_threshold=200, bins=64)


def test_lognormal_heavy_tail():
    rng = np.random.default_rng(6)
    _check(rng.lognormal(0, 4, 20_000), pull_threshold=200, bins=64)


def test_heavy_duplicates_and_spike():
    rng = np.random.default_rng(8)
    v = np.concatenate([
        np.full(5000, 42.5),                       # one value holds the median
        rng.normal(0, 1, 3000),
        np.full(2000, 42.5 + 1e-12),               # 1-ulp-ish neighbor
    ])
    _check(v, pull_threshold=100, bins=32)


def test_all_equal():
    _check(np.full(5000, 7.25), pull_threshold=100)


def test_with_nulls_and_nan():
    rng = np.random.default_rng(9)
    v = rng.uniform(0, 10, 5000)
    df = pd.DataFrame({"v": v})
    df.loc[::7, "v"] = np.nan  # pandas NaN → excluded on both sides
    ds = rd.from_pandas(df).repartition(7)
    got = quantile_select(ds, value_col="v", qs={"p50": 0.5},
                          pull_threshold=100, bins=32)
    con = duckdb.connect(); con.register("t", df)
    n, p50 = con.execute(
        "SELECT count(v)::BIGINT, quantile_disc(v, 0.5) FROM t WHERE NOT isnan(v)"
    ).fetchone()
    assert got["n"] == n and got["p50"] == p50


def test_grouped_quantiles_match_duckdb():
    from code_graph_rag_ray.stages.selection import grouped_quantile_select

    rng = np.random.default_rng(12)
    n = 12_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n, p=[0.7, 0.29, 0.01]),
            "v": rng.lognormal(0, 3, n),
        }
    )
    # a single-row group and a constant-value group
    df = pd.concat(
        [df,
         pd.DataFrame({"g": ["solo"], "v": [3.25]}),
         pd.DataFrame({"g": ["flat"] * 500, "v": [9.5] * 500})],
        ignore_index=True,
    )
    ds = rd.from_pandas(df).repartition(11)
    got = grouped_quantile_select(
        ds, group_col="g", value_col="v",
        qs={"p50": 0.5, "p90": 0.9}, pull_threshold=150, bins=64,
    ).to_pandas().sort_values("g").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        """SELECT g, count(v)::BIGINT AS n, quantile_disc(v, 0.5) AS p50,
                  quantile_disc(v, 0.9) AS p90
           FROM t GROUP BY g ORDER BY g"""
    ).df()
    exp = exp.astype(got.dtypes.to_dict())
    assert got.equals(exp), f"\n{got}\n{exp}"


def test_nonfinite_and_null_groups_excluded():
    """Hardening pins: ±inf values are excluded (they'd poison the float
    bin arithmetic), and NULL group keys are dropped rather than crashing
    the driver-side sort."""
    from code_graph_rag_ray.stages.selection import (
        grouped_quantile_select,
        quantile_select,
    )

    rng = np.random.default_rng(17)
    v = rng.uniform(0, 10, 3000)
    df = pd.DataFrame({"v": v})
    df.loc[::11, "v"] = np.inf
    df.loc[1::13, "v"] = -np.inf
    got = quantile_select(rd.from_pandas(df).repartition(7),
                          value_col="v", qs={"p50": 0.5},
                          pull_threshold=100, bins=32)
    con = duckdb.connect(); con.register("t", df)
    n, p50 = con.execute(
        "SELECT count(v)::BIGINT, quantile_disc(v, 0.5) FROM t WHERE isfinite(v)"
    ).fetchone()
    assert got["n"] == n and got["p50"] == p50

    gdf = pd.DataFrame({"g": ["a", None, "b", "a", None, "b"] * 50,
                        "v": rng.uniform(0, 5, 300)})
    out = grouped_quantile_select(
        rd.from_pandas(gdf).repartition(5), group_col="g", value_col="v",
        qs={"p50": 0.5}, pull_threshold=50, bins=16,
    ).to_pandas()
    assert set(out["g"]) == {"a", "b"}  # NULL group dropped, no crash
