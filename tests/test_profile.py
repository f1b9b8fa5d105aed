"""profile_table: exact per-column stats with planted nulls/dupes."""

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.profile import profile_table


def test_profile_table_nulls_distinct_minmax():
    tbl = pa.table({
        "a": pa.array([3, 1, 2, None, 2, 1], pa.int64()),
        "b": pa.array(["z", None, "a", None, "z", "m"], pa.string()),
    })
    out = profile_table(rd.from_arrow(tbl).repartition(3), ["a", "b"])
    rows = {r["col"]: r for _, r in out.iterrows()}
    assert rows["a"]["n_rows"] == 6 and rows["a"]["n_nulls"] == 1
    assert rows["a"]["n_distinct"] == 3
    assert rows["a"]["min_s"] == "1" and rows["a"]["max_s"] == "3"
    assert rows["b"]["n_rows"] == 6 and rows["b"]["n_nulls"] == 2
    assert rows["b"]["n_distinct"] == 3
    assert rows["b"]["min_s"] == "a" and rows["b"]["max_s"] == "z"
    assert list(out["col"]) == ["a", "b"]  # sorted, one row per column
