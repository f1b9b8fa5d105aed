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


def test_rollup_empty_input_emits_grand_total_row():
    # SQL ROLLUP over an empty table still returns the () grouping set:
    # one row, all keys NULL, sum NULL
    empty = rd.from_arrow(pa.table(
        {"k1": pa.array([], pa.string()), "k2": pa.array([], pa.string()),
         "v": pa.array([], pa.int64())}
    ))
    out = rollup_sum(empty, ["k1", "k2"], "v").take_all()
    assert len(out) == 1
    assert out[0]["k1"] is None and out[0]["k2"] is None
    assert out[0]["total"] is None


def test_grouping_sets_single_shuffle_matches_manual():
    from code_graph_rag_ray.stages.reshape import grouping_sets_sum

    ds = rd.from_arrow(pa.Table.from_pylist(ROWS)).repartition(2)
    out = grouping_sets_sum(ds, ["k1", "k2"], "v",
                            [("k1",), ()], out_col="t").take_all()
    got = {(r["k1"], r["k2"]): r["t"] for r in out}
    assert got == {("a", None): 111, ("b", None): 11000, (None, None): 11111}


def test_unpivot_melts_and_types():
    from code_graph_rag_ray.stages.reshape import unpivot

    rows = [{"id": 1, "x": 10, "y": 20}, {"id": 2, "x": 30, "y": 40}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = unpivot(ds, ["id"], ["x", "y"]).take_all()
    got = {(r["id"], r["measure"]): r["value"] for r in out}
    assert got == {(1, "x"): 10, (1, "y"): 20, (2, "x"): 30, (2, "y"): 40}
    assert len(out) == 4


def test_unpivot_value_type_cast_and_empty_blocks():
    from code_graph_rag_ray.stages.reshape import unpivot

    rows = [{"id": 1, "x": 1, "y": 2.5}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)  # empty blocks
    out = unpivot(ds, ["id"], ["x", "y"],
                  value_type=pa.float64()).take_all()
    got = {r["measure"]: r["value"] for r in out}
    assert got == {"x": 1.0, "y": 2.5}
