"""Exact dedup + partitioned, sorted graph materialization (A1/A2 analog).

The reference's MERGE semantics (``services/graph_service.py:452-546``: node
upsert by per-label unique key, edge dedup by endpoint pattern + merge-key
signature) become explicit dataset operators here:

- :func:`exact_dedup` — two-phase: a vectorized WITHIN-BATCH Arrow dedup
  first (combiner; shrinks the exchange by the local duplication factor),
  then one groupby shuffle on the key with a deterministic per-group pick
  (sorted by the full key, first row wins — order-free determinism, the
  SURVEY.md §7 "tie-breaks must not depend on arrival order" rule).
- :func:`materialize_graph` — adds ``part = crc32(subj) % P``, sorts within
  each hash partition, writes hive-partitioned parquet (one directory per
  partition, resumable layout) — the north-star final stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.functions.hashing import partition_ids


def dedup_batch_local(batch: pa.Table, keys: list[str]) -> pa.Table:
    """Drop exact-key duplicates inside one Arrow batch (vectorized)."""
    if batch.num_rows == 0:
        return batch
    # stable: first occurrence per key wins within the batch
    idx = pa.table(
        {**{k: batch[k] for k in keys}, "__i": pa.array(range(batch.num_rows), pa.int64())}
    )
    first = idx.group_by(keys, use_threads=False).aggregate([("__i", "min")])
    take = pc.sort_indices(first["__i_min"])
    return batch.take(pc.take(first["__i_min"], take))


def exact_dedup(
    ds: Dataset,
    keys: list[str],
    sort_cols: list[str] | None = None,
    columns: list[str] | None = None,
) -> Dataset:
    """MERGE-equivalent exact dedup on ``keys``; deterministic winner.

    Two-phase and fully vectorized: batch-local Arrow dedup (combiner), then
    ONE groupby shuffle where every non-key column is reduced with Min —
    content-determined, never arrival-order-determined. Column-independent
    Min matches cgr's MERGE property semantics (props merged per key, not
    row-atomic, ``graph_service.py:395-428``); use
    :func:`exact_dedup_rows` when whole-row integrity matters.

    ``sort_cols`` is accepted for API compatibility (the deterministic
    winner is the per-column minimum regardless).

    Pass ``columns`` (the full output column list) whenever ``ds`` has an
    all-to-all upstream (groupby/sort): without it the driver-side
    ``ds.schema()`` probe executes the whole upstream plan once just for
    the names (limit-1 only truncates post-sort stages), doubling the cost
    AND exercising the limit-cancellation path that crashes Ray 2.49's
    reference counter (NOTES.md fact 22).
    """
    from ray.data.aggregate import Min

    del sort_cols
    if columns is None:
        s = ds.schema(fetch_if_missing=False)  # free when the plan knows it
        columns = list((s if s is not None else ds.schema()).names)
    other = [c for c in columns if c not in keys]

    def partial_min(b: pa.Table) -> pa.Table:
        # batch-local combiner with the SAME per-column-min semantics as the
        # global phase — never first-row-wins, which would reintroduce
        # arrival-order dependence
        if b.num_rows == 0:
            return b
        if not other:
            return dedup_batch_local(b, keys)
        t = pa.TableGroupBy(b, keys, use_threads=False).aggregate(
            [(c, "min") for c in other]
        )
        rename = {f"{c}_min": c for c in other}
        return t.rename_columns([rename.get(n, n) for n in t.column_names]).select(
            keys + other
        )

    local = ds.map_batches(partial_min, batch_format="pyarrow")
    # right-size blocks for the sort shuffle: too-few fat blocks serialize
    # the sort, too-many slivers drown it in task overhead (measured on the
    # 800k-triple bench: 18s unpartitioned → 12s at ncpus blocks)
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        local = local.repartition(max(8, ncpu))
    except Exception:  # pragma: no cover - no cluster yet
        pass
    if not other:
        # pure key rows: distinct via count + drop
        from ray.data.aggregate import Count

        return local.groupby(keys).aggregate(Count(alias_name="__n")).drop_columns(["__n"])
    return local.groupby(keys).aggregate(*[Min(c, alias_name=c) for c in other])


def exact_dedup_rows(ds: Dataset, keys: list[str], sort_cols: list[str] | None = None) -> Dataset:
    """Row-atomic exact dedup: per-group sort + first (slower: Python per
    group). Use only when the surviving row must be one original row.
    The batch-local combiner sorts by ``sort_cols`` before dropping local
    duplicates, so the survivor is content-determined end to end."""
    import pandas as pd

    sc = sort_cols

    def local_first(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        cols = sc or b.column_names
        order = pc.sort_indices(b, sort_keys=[(c, "ascending") for c in cols])
        return dedup_batch_local(b.take(order), keys)

    local = ds.map_batches(local_first, batch_format="pyarrow")

    # bucketed cogroup (hash(keys) buckets): per-key map_groups would pay a
    # Python call per DISTINCT KEY; here each bucket sorts once and keeps
    # the first row of every key run — same winner (min by sort_cols within
    # key), vectorized
    def add_bucket(b: pa.Table) -> pa.Table:
        kimg = b[keys[0]] if len(keys) == 1 else pc.binary_join_element_wise(
            *[pc.cast(b[k], pa.string()) for k in keys], "\x1f"
        )
        return b.append_column("__db", pa.array(partition_ids(kimg, 64)))

    def pick_first(g: pd.DataFrame) -> pd.DataFrame:
        cols = [c for c in (sc or list(g.columns)) if c != "__db"]
        g = g.sort_values(keys + cols, kind="mergesort")
        kv = g[keys].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (kv[1:] != kv[:-1]).any(axis=1)
        return g[new].drop(columns=["__db"])

    return (
        local.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(pick_first, batch_format="pandas")
    )


def add_partition_column(ds: Dataset, key: str, num_partitions: int, col: str = "part") -> Dataset:
    def add(b: pa.Table) -> pa.Table:
        return b.append_column(col, pa.array(partition_ids(b[key], num_partitions), pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")


def materialize_graph(
    ds: Dataset,
    out_dir: str,
    *,
    key: str,
    sort_by: list[str],
    num_partitions: int = 16,
) -> None:
    """Write ``ds`` hive-partitioned by ``crc32(key) % num_partitions``,
    sorted by ``sort_by`` within each partition.

    One directory per hash partition (``part=K/``) → a failed run skips
    finished partitions on resume; never one giant file. Sorting happens
    per-group (each group = one hash partition), so the only all-to-all is
    the partition groupby itself.
    """
    import pandas as pd

    parted = add_partition_column(ds, key, num_partitions)

    def sort_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_by, kind="mergesort")

    (
        parted.groupby("part")
        .map_groups(sort_group, batch_format="pandas")
        .write_parquet(out_dir, partition_cols=["part"])
    )
