"""Table profiling: per-column data-quality stats in a fixed number of
distributed passes.

The operator a curation pipeline runs FIRST on a new 100 TB drop: row
count, null count, exact distinct count, lexicographic min/max per column.
The reference surfaces the equivalent as its graph-summary queries
(``graph_service.py`` label/property count Cypher); here it is a dataset
operator over any table.

Scale shape: one streaming pass emits long-format (col, val) rows with
batch-local pre-reduction per branch — null/row counts shrink to one row
per (col, batch) before their grouped sum; the distinct branch dedups
(col, val) inside each batch before the one global dedup shuffle; min/max
reduce to one row per (col, batch) first. The final assembly joins
per-column tables of O(columns) rows on the driver — dictionary-scale by
construction.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.stages.materialize import dedup_batch_local
from code_graph_rag_ray.stages.relational import partial_groupby_sum


def profile_table(ds: Dataset, columns: list[str]) -> pd.DataFrame:
    """→ pandas (col, n_rows, n_nulls, n_distinct, min_s, max_s), one row
    per profiled column; values compared as strings (the cross-type
    normalization SQL's ``CAST(x AS VARCHAR)`` replays). Distinct counts
    ignore nulls; min/max ignore nulls."""
    from ray.data.aggregate import Count, Max, Min

    def long_rows(b: pa.Table) -> pa.Table:
        outs = []
        for c in columns:
            v = pc.cast(b[c], pa.string())
            outs.append(pa.table({"col": pa.array([c] * len(v), pa.string()),
                                  "val": v}))
        return pa.concat_tables(outs)

    long = ds.map_batches(long_rows, batch_format="pyarrow")

    def counts_partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["col"], use_threads=False).aggregate(
            [([], "count_all"), ("val", "count")]
        )
        # count_all = rows, count = non-null
        return pa.table(
            {"col": g["col"],
             "__rows": pc.cast(g["count_all"], pa.int64()),
             "__nn": pc.cast(g["val_count"], pa.int64())}
        )

    counts = partial_groupby_sum(
        long.map_batches(counts_partial, batch_format="pyarrow"),
        ["col"], {"__rows": "n_rows", "__nn": "n_nonnull"},
    )

    def distinct_partial(b: pa.Table) -> pa.Table:
        nn = b.filter(pc.is_valid(b["val"]))
        return dedup_batch_local(nn, ["col", "val"])

    distinct = (
        long.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["col", "val"])
        .aggregate(Count(alias_name="__k"))
        .groupby("col")
        .aggregate(Count(alias_name="n_distinct"))
    )

    def minmax_partial(b: pa.Table) -> pa.Table:
        nn = b.filter(pc.is_valid(b["val"]))
        g = pa.TableGroupBy(nn, ["col"], use_threads=False).aggregate(
            [("val", "min"), ("val", "max")]
        )
        return pa.table({"col": g["col"], "mn": g["val_min"], "mx": g["val_max"]})

    minmax = (
        long.map_batches(minmax_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(Min("mn", alias_name="min_s"), Max("mx", alias_name="max_s"))
    )

    # O(columns) rows per branch — driver assembly is dictionary-scale
    out = (
        counts.to_pandas()
        .merge(distinct.to_pandas(), on="col", how="left")
        .merge(minmax.to_pandas(), on="col", how="left")
    )
    out["n_nulls"] = (out["n_rows"] - out["n_nonnull"]).astype("int64")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    return out[["col", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s"]].sort_values(
        "col", kind="mergesort"
    ).reset_index(drop=True)
