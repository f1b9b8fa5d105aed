"""snapshot_diff: classification against a brute-force reference."""

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.diff import snapshot_diff


def test_snapshot_diff_classes_and_unchanged_toggle():
    old = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "a": pa.array(["x", "y", "z", "w"], pa.string()),
        "b": pa.array([10, 20, 30, 40], pa.int64()),
    })).repartition(2)
    new = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 4, 5], pa.int64()),
        "a": pa.array(["y", "z2", "w", "v"], pa.string()),
        "b": pa.array([20, 30, 41, 50], pa.int64()),
    })).repartition(2)
    out = {r["k"]: r["status"] for r in
           snapshot_diff(old, new, key="k", compare_cols=["a", "b"]).take_all()}
    # 1 removed; 2 unchanged (dropped); 3 changed (a); 4 changed (b); 5 added
    assert out == {1: "removed", 3: "changed", 4: "changed", 5: "added"}
    full = {r["k"]: r["status"] for r in
            snapshot_diff(old, new, key="k", compare_cols=["a", "b"],
                          keep_unchanged=True).take_all()}
    assert full[2] == "unchanged" and len(full) == 5


def test_scd2_history_runs_and_nullable_valid_to():
    from code_graph_rag_ray.stages.diff import scd2_history

    rows = [
        # key "u": A A B A — three runs (A, B, A: same state REOPENS a run)
        {"k": "u", "ts": 1, "tb": 0, "st": "A"},
        {"k": "u", "ts": 2, "tb": 0, "st": "A"},
        {"k": "u", "ts": 3, "tb": 0, "st": "B"},
        {"k": "u", "ts": 4, "tb": 0, "st": "A"},
        # tie on ts → tiebreak decides order (B first, then A)
        {"k": "v", "ts": 5, "tb": 1, "st": "B"},
        {"k": "v", "ts": 5, "tb": 2, "st": "A"},
        # single observation
        {"k": "w", "ts": 9, "tb": 0, "st": "Z"},
    ]
    t = pa.Table.from_pylist(rows)
    for blocks in (1, 4):
        got = scd2_history(rd.from_arrow(t).repartition(blocks), key="k",
                           order_by="ts", state_cols=["st"],
                           tiebreak="tb").take_all()
        by = {}
        for r in got:
            by.setdefault(r["k"], []).append(
                (r["valid_from"], r["valid_to"], r["st"], r["n_obs"]))
        for v in by.values():
            v.sort(key=lambda x: (x[0], x[2]))
        assert by["u"] == [(1, 3, "A", 2), (3, 4, "B", 1), (4, None, "A", 1)]
        assert by["v"] == [(5, None, "A", 1), (5, 5, "B", 1)]
        assert by["w"] == [(9, None, "Z", 1)]
