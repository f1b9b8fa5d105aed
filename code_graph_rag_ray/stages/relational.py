"""Reusable relational operators: broadcast joins, two-phase aggregates,
semi/anti joins, top-k — the generic engine surface the DuckDB oracle
exercises over the TPC-H-ish tables.

Design rules (SURVEY.md §4 + ray_guide):
- small side broadcast via ``ray.put`` + per-batch vectorized lookup
  (pandas merge / numpy take) — no shuffle,
- large-large joins go through ``Dataset.join`` (hash-partitioned) with
  ``num_partitions`` sized to the cluster,
- aggregates pre-reduce inside ``map_batches`` (one partial row per key per
  batch) before the groupby, so hot keys exchange O(blocks) not O(rows).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def broadcast_join(
    ds: Dataset,
    small_df: pd.DataFrame,
    *,
    on: str,
    how: str = "inner",
    right_on: str | None = None,
) -> Dataset:
    """Map-side hash join: ``small_df`` shipped once via ``ray.put``,
    looked up per batch with a pandas merge (vectorized)."""
    import ray

    from code_graph_rag_ray.functions.broadcast import get_broadcast

    ref = ray.put(small_df)
    rkey = right_on or on

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(get_broadcast(ref), how=how, left_on=on, right_on=rkey)

    # plain task fn + worker-global cache: no per-stage actor startup
    return ds.map_batches(join, batch_format="pandas")


def broadcast_semi_join(ds: Dataset, keys: set, *, on: str, anti: bool = False) -> Dataset:
    """Semi (or anti) join against a broadcast key set — filter, no shuffle."""
    import ray

    import pyarrow.compute as pc

    from code_graph_rag_ray.functions.broadcast import get_broadcast

    ref = ray.put(pa.array(sorted(keys)))

    def semi(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[on], value_set=get_broadcast(ref))
        if anti:
            m = pc.invert(m)
        return batch.filter(m)

    return ds.map_batches(semi, batch_format="pyarrow")


def bucketed_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    num_buckets: int = 32,
    how: str = "inner",
) -> Dataset:
    """Large-large equi-join as an explicit bucketed cogroup hash join.

    Both sides get ``bucket = crc32(key) % B``; the union is grouped by
    bucket and each group does ONE vectorized pandas merge. This is the
    portable partitioned-hash-join pattern (ray_guide «Joins»): we use it
    instead of ``Dataset.join`` because Ray 2.49's join emits schema-less
    empty hash partitions that break on sparse keys (see
    stages/components.py). Hot keys: all rows of one key share a bucket but
    the merge is columnar; raise ``num_buckets`` or pre-salt a known whale
    key if a single bucket outgrows a worker.

    Column collision: right-side columns that clash with left names get a
    ``_r`` suffix (except the join key, which is dropped from the right).
    """
    from code_graph_rag_ray.functions.hashing import partition_ids

    rkey = right_on or on

    lschema, rschema = left.schema(), right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != rkey]
    rename_r = {c: (c + "_r" if c in lcols else c) for c in rcols}

    def tag_left(b: pa.Table) -> pa.Table:
        key = b[on].cast(pa.string())
        out = {"__bucket": pa.array(partition_ids(key, num_buckets), pa.int32()),
               "__side": pa.array([0] * b.num_rows, pa.int8()), "__key": key}
        for c in lcols:
            out["l_" + c] = b[c]
        for c in rcols:
            out["r_" + rename_r[c]] = pa.nulls(b.num_rows, rtypes[c])
        return pa.table(out)

    def tag_right(b: pa.Table) -> pa.Table:
        key = b[rkey].cast(pa.string())
        out = {"__bucket": pa.array(partition_ids(key, num_buckets), pa.int32()),
               "__side": pa.array([1] * b.num_rows, pa.int8()), "__key": key}
        for c in lcols:
            out["l_" + c] = pa.nulls(b.num_rows, ltypes[c])
        for c in rcols:
            out["r_" + rename_r[c]] = b[c]
        return pa.table(out)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    out_l = {"l_" + c: c for c in lcols}
    out_r = {"r_" + rename_r[c]: rename_r[c] for c in rcols}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 0][["__key", *out_l]].rename(columns=out_l)
        rf = g[g["__side"] == 1][["__key", *out_r]].rename(columns=out_r)
        m = lf.merge(rf, on="__key", how=how)
        return m.drop(columns=["__key"])

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")


def partial_groupby_sum(
    ds: Dataset,
    keys: list[str],
    sums: dict[str, str],
    *,
    count_alias: str | None = None,
) -> Dataset:
    """Two-phase grouped sum/count: Arrow group_by per batch (combiner),
    then a global groupby over the much smaller partials.

    ``sums`` maps input column → output alias. The partial stage emits one
    row per key per batch; the final stage sums partials.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sums]
        gb = pa.TableGroupBy(b, keys, use_threads=False)
        if count_alias:
            aggs.append(([], "count_all"))
        t = gb.aggregate(aggs)
        names = list(keys) + [f"{alias}__p" for alias in sums.values()]
        if count_alias:
            names.append(f"{count_alias}__p")
        # pyarrow returns key cols last or first depending on version — map by name
        colmap = {}
        for c, alias in sums.items():
            colmap[f"{c}_sum"] = f"{alias}__p"
        if count_alias:
            colmap["count_all"] = f"{count_alias}__p"
        arrays, out_names = [], []
        for name in t.column_names:
            out = colmap.get(name, name)
            arrays.append(t[name])
            out_names.append(out)
        return pa.Table.from_arrays([a.combine_chunks() for a in arrays], names=out_names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(f"{alias}__p", alias_name=alias) for alias in sums.values()]
    if count_alias:
        aggs.append(Sum(f"{count_alias}__p", alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


def top_k(ds: Dataset, by: str, k: int, *, descending: bool = True) -> Dataset:
    """Global top-k: per-batch local top-k (partial), then one small sort.

    Avoids a full distributed sort of the input — only k rows per block
    reach the final stage."""

    def local(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = "descending" if descending else "ascending"
        idx = pc.sort_indices(b, sort_keys=[(by, order)])[: k]
        return b.take(idx)

    return ds.map_batches(local, batch_format="pyarrow").sort(by, descending=descending).limit(k)
