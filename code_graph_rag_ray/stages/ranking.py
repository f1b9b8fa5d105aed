"""Global ranking (distributed row_number) — order the whole corpus by a
key without ever holding it in one place.

Curriculum ordering, "keep the best N per corpus", and stable exports all
need a total order ``ORDER BY key [DESC], tiebreak`` with a 1-based global
rank. The classic way is a full sort plus a driver-side index — neither
survives 100 TB. This is the two-pass range-bucket scheme every distributed
sort uses, with driver state bounded at O(blocks × num_buckets) sample
rows + O(num_buckets) count rows — never a function of corpus row count:

1. **Sample** keys with a bounded per-block quantile sketch (each block
   emits ≤ num_buckets+1 evenly-spaced local keys; the driver merges
   O(blocks × num_buckets) rows — never a rate-sample of all keys) and
   cut ``num_buckets`` range boundaries. Boundaries affect only balance —
   the final ranks are a pure function of the data, so ANY boundary choice
   yields identical output.
2. **Bucket** each row by ``searchsorted(boundaries, key)`` — equal keys
   always co-locate.
3. **Count** rows per bucket two-phase (block partials → tiny grouped sum)
   and prefix-sum the ≤ num_buckets counts into bucket offsets.
4. **Rank** inside each bucket: ``groupby(bucket).map_groups`` sorts the
   group by (key, tiebreak) and adds ``offset + arange``.

The input pipeline executes twice (count pass + rank pass) — like any
distributed sort, cheaper than materializing; feed it a checkpointed /
parquet-backed dataset for expensive upstreams. A whale key co-locates its
rows in one bucket — inherent to total-order semantics (same as SQL
row_number); size num_buckets to the key distribution, not the corpus.

Reference parity: the reference ranks retrieval candidates wholesale in
one process (``evals/retrieval.py`` score sort); this is the corpus-scale
equivalent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.stages.relational import partial_groupby_sum


def _block_key_sample(ds: Dataset, by: str, cap: int) -> Dataset:
    """Per-block bounded key sample: each input block contributes at most
    ``cap`` evenly-spaced keys from its own sorted key column. Driver-side
    sample size is O(blocks × cap) — independent of row count, unlike a
    hash-rate sample (which ships ~n/mod of ALL keys and OOMs the driver
    at corpus scale)."""

    def pick(b: pa.Table) -> pa.Table:
        key_type = b.schema.field(by).type
        col = pc.drop_null(b[by]).combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({by: pa.array([], type=key_type)})
        srt = col.take(pc.sort_indices(col))
        idx = np.unique(np.linspace(0, n - 1, min(cap, n)).astype(np.int64))
        return pa.table({by: srt.take(idx)})

    return ds.map_batches(pick, batch_format="pyarrow")


def _sample_boundaries(
    ds: Dataset, by: str, num_buckets: int, sample_mod: int | None = None
) -> list:
    """Bounded two-phase key sample → ≤ num_buckets-1 sorted cut points.

    Phase 1 (distributed): each block emits ≤ num_buckets+1 evenly-spaced
    local keys (per-block quantile sketch). Phase 2 (driver): merge the
    O(blocks × num_buckets) sampled keys and cut evenly-spaced boundaries.
    Boundary choice affects only bucket balance — ranks/offsets downstream
    are a pure function of the data, so any sample yields identical
    output. ``sample_mod`` is accepted for call compatibility with the
    retired hash-rate sampler and ignored."""
    del sample_mod
    sample = _block_key_sample(ds, by, num_buckets + 1).take_all()
    keys = sorted(r[by] for r in sample)
    if not keys:
        return []
    idx = np.linspace(0, len(keys) - 1, num_buckets + 1).astype(int)[1:-1]
    return sorted(set(keys[i] for i in idx))


def global_rank(
    ds: Dataset,
    by: str,
    *,
    tiebreak: str,
    descending: bool = False,
    num_buckets: int = 64,
    out_col: str = "rank",
    sample_mod: int = 64,
) -> Dataset:
    """Add ``out_col`` = 1-based global row_number over
    ``ORDER BY by [DESC], tiebreak ASC``. ``tiebreak`` must be unique for
    a deterministic total order (SQL row_number's requirement too)."""
    bounds = _sample_boundaries(ds, by, num_buckets, sample_mod)
    bounds_np = np.asarray(bounds) if bounds else None

    def bucketize(b: pa.Table) -> pa.Table:
        if bounds_np is None:
            bucket = np.zeros(len(b), np.int64)
        else:
            keys = b[by].to_numpy(zero_copy_only=False)
            bucket = np.searchsorted(bounds_np, keys, side="right").astype(np.int64)
        return b.append_column("__bucket", pa.array(bucket))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    # pass 1: per-bucket totals (tiny — ≤ num_buckets rows reach the driver)
    counts = partial_groupby_sum(
        bucketed, ["__bucket"], {}, count_alias="n"
    ).take_all()
    counts.sort(key=lambda r: r["__bucket"], reverse=descending)
    offsets: dict[int, int] = {}
    acc = 0
    for r in counts:
        offsets[r["__bucket"]] = acc
        acc += r["n"]

    order = "descending" if descending else "ascending"

    def rank_group(g: pa.Table) -> pa.Table:
        off = offsets[g["__bucket"][0].as_py()]
        idx = pc.sort_indices(
            g, sort_keys=[(by, order), (tiebreak, "ascending")]
        )
        g = g.take(idx).drop_columns("__bucket")
        return g.append_column(
            out_col, pa.array(off + 1 + np.arange(len(g), dtype=np.int64))
        )

    # pass 2: rank inside each bucket (equal keys are co-located by step 2)
    return bucketed.groupby("__bucket").map_groups(
        rank_group, batch_format="pyarrow"
    )


def shuffle_rank(
    ds: Dataset,
    *,
    id_col: str,
    shard_size: int,
    num_buckets: int = 64,
) -> Dataset:
    """Deterministic global pseudorandom shuffle order + shard assignment —
    the "shuffle the corpus before writing train shards" step, without a
    ``random_shuffle`` (whose output depends on block layout and seed
    plumbing). The order key is the md5-low32 policy hash of the id, so
    the permutation is a pure function of the data: resumable, identical
    at any parallelism, and replayable by ``row_number() OVER (ORDER BY
    md5key, id)`` in SQL.

    Output: input columns + ``shuffle_rank`` (1-based) + ``shard``
    (0-based, ``(rank-1) // shard_size``) — ready to feed a partitioned
    writer one shard directory per shard id.

    Scale shape: delegates to :func:`global_rank` (two-pass range-bucket
    row_number, O(num_buckets) driver rows); md5 keys are uniform so the
    range buckets are balanced by construction.
    """
    from code_graph_rag_ray.functions.hashing import md5_low32_array

    def key(b: pa.Table) -> pa.Table:
        u = md5_low32_array(b[id_col]).astype(np.int64)
        return b.append_column("__sk", pa.array(u))

    ranked = global_rank(
        ds.map_batches(key, batch_format="pyarrow"),
        "__sk", tiebreak=id_col, num_buckets=num_buckets,
        out_col="shuffle_rank",
    )

    def finish(b: pa.Table) -> pa.Table:
        r = b["shuffle_rank"].to_numpy(zero_copy_only=False)
        shard = (r - 1) // shard_size
        return b.drop_columns("__sk").append_column(
            "shard", pa.array(shard.astype(np.int64)))

    return ranked.map_batches(finish, batch_format="pyarrow")


def group_rank(
    ds: Dataset,
    group: str,
    by: str,
    *,
    tiebreak: str,
    descending: bool = True,
    out_col: str = "rank",
) -> Dataset:
    """Per-group 1-based dense row_number (``row_number() OVER (PARTITION
    BY group ORDER BY by [DESC], tiebreak)``) via ``groupby.map_groups``.

    Meant for SMALL groups (top-k lists, per-query candidates): the whole
    group transits one task. For corpus-scale groups use
    :func:`global_rank` per partition or `grouped_top_k` first.
    """

    def rank_group(g):
        g = g.sort_values([by, tiebreak], ascending=[not descending, True],
                          kind="mergesort")
        g[out_col] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.groupby(group).map_groups(rank_group, batch_format="pandas")


def rrf_fuse(
    ranked_lists: list[Dataset],
    *,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    kappa: int = 60,
    scale: int = 10**6,
) -> Dataset:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009, public):
    fuse N per-query rankings into one, score(q, d) = Σ over lists
    containing d of ``scale // (kappa + rank)`` — the fixed-point integer
    variant of Σ 1/(κ+r), so the fused ranking is bit-exact replayable in
    BIGINT SQL. Returns (query_col, id_col, rrf_micro, n_systems) rows —
    the per-query top-``k`` by (rrf_micro DESC, id ASC).

    Scale shape: each input list is already top-k-per-query (tiny rows per
    query); contributions union and fold through ONE two-phase grouped
    sum; grouped_top_k caps the fused output. No broadcast, no driver
    materialization — fusing 10^9 queries streams.

    cgr analog: the reference's retrieval layer merges graph-lookup
    candidates with vector-search candidates before prompting
    (codebase_rag/services/llm.py); RRF is the standard public fusion.
    """
    from code_graph_rag_ray.stages.relational import (
        grouped_top_k,
        partial_groupby_sum,
    )

    def contrib(b: pa.Table) -> pa.Table:
        r = b[rank_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {query_col: b[query_col], id_col: b[id_col],
             "c": pa.array(scale // (kappa + r)),
             "one": pa.array(np.ones(len(r), np.int64))}
        )

    parts = [d.map_batches(contrib, batch_format="pyarrow")
             for d in ranked_lists]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    s = partial_groupby_sum(
        u, [query_col, id_col], {"c": "rrf_micro", "one": "n_systems"})
    return grouped_top_k(s, query_col, "rrf_micro", k,
                         descending=True, tiebreak=id_col)
