"""ROLLUP and PIVOT reshaping aggregates vs scalar replays, at multiple
block layouts (levels must agree exactly — integer sums)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.reshape import pivot_sum, rollup_sum

ROWS = [
    {"k1": "a", "k2": "x", "v": 1},
    {"k1": "a", "k2": "x", "v": 10},
    {"k1": "a", "k2": "y", "v": 100},
    {"k1": "b", "k2": "x", "v": 1000},
    {"k1": "b", "k2": "z", "v": 10000},
]


def test_rollup_levels_exact():
    for blocks in (1, 4):
        ds = rd.from_arrow(pa.Table.from_pylist(ROWS)).repartition(blocks)
        out = rollup_sum(ds, ["k1", "k2"], "v").take_all()
        got = {(r["k1"], r["k2"]): r["total"] for r in out}
        assert got == {
            ("a", "x"): 11, ("a", "y"): 100, ("b", "x"): 1000,
            ("b", "z"): 10000,
            ("a", None): 111, ("b", None): 11000,
            (None, None): 11111,
        }
        assert len(out) == 7  # no duplicate level rows


def test_pivot_fills_zero_and_ignores_unknown():
    ds = rd.from_arrow(pa.Table.from_pylist(
        ROWS + [{"k1": "a", "k2": "zz", "v": 7}]  # outside column set
    )).repartition(3)
    out = {r["k1"]: r for r in
           pivot_sum(ds, "k1", "k2", "v", ["x", "y", "z"]).take_all()}
    assert out["a"]["x"] == 11 and out["a"]["y"] == 100 and out["a"]["z"] == 0
    assert out["b"]["x"] == 1000 and out["b"]["y"] == 0 and out["b"]["z"] == 10000


def test_cube_all_grouping_sets_exact():
    from code_graph_rag_ray.stages.reshape import cube_sum

    for blocks in (1, 4):
        ds = rd.from_arrow(pa.Table.from_pylist(ROWS)).repartition(blocks)
        out = cube_sum(ds, ["k1", "k2"], "v").take_all()
        got = {(r["k1"], r["k2"]): r["total"] for r in out}
        assert got == {
            ("a", "x"): 11, ("a", "y"): 100, ("b", "x"): 1000,
            ("b", "z"): 10000,
            ("a", None): 111, ("b", None): 11000,
            # the k2-only marginals ROLLUP does not produce
            (None, "x"): 1011, (None, "y"): 100, (None, "z"): 10000,
            (None, None): 11111,
        }
        assert len(out) == 10
