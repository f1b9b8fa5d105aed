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
