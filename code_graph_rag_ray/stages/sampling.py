"""Deterministic dataset splitting & stratified sampling (training-data ops).

A 100 TB training corpus needs train/val/test assignment and per-stratum
downsampling that are (a) pure functions of the row key — reproducible
across runs, machines and engine versions, never dependent on row order or
partitioning — and (b) auditable: a user must be able to recompute the
assignment in SQL. Both operators therefore key off the md5-low32 bucket of
the id column (``functions.hashing.md5_low32_array``), which DuckDB rebuilds
exactly (``('0x' || substr(md5(CAST(id AS VARCHAR)),1,8))::UBIGINT``) — the
same auditability rule the reference applies to its MD5 change detection
(``graph_updater.py:129-141``).

Both are stateless single-pass ``map_batches`` — no shuffle, no state, and
the split never changes when the corpus is re-partitioned or appended to.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.functions.hashing import md5_low32_array

_BUCKETS = 10_000


def hash_split(
    ds: Dataset,
    *,
    id_col: str,
    splits: dict[str, float] | None = None,
    buckets: int = _BUCKETS,
) -> Dataset:
    """Append a ``split`` column assigned by hash bucket.

    ``splits`` maps name → fraction (must sum to ≤ 1; any remainder falls
    into the LAST split). Assignment: bucket = md5_low32(id) % buckets;
    cumulative fraction ranges in the given order. Rows with equal ids land
    in the same split by construction (leak-free for duplicated keys).
    """
    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(splits)
    # integer cut points: split i covers [cuts[i-1], cuts[i])
    cuts = np.minimum(
        np.round(np.cumsum([splits[n] for n in names]) * buckets).astype(np.int64),
        buckets,
    )
    cuts[-1] = buckets
    names_arr = np.asarray(names, dtype=object)

    def assign(b: pa.Table) -> pa.Table:
        bk = (md5_low32_array(b[id_col]) % np.uint32(buckets)).astype(np.int64)
        idx = np.searchsorted(cuts, bk, side="right")
        return b.append_column("split", pa.array(names_arr[idx], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_sample(
    ds: Dataset,
    *,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = _BUCKETS,
) -> Dataset:
    """Keep a deterministic per-stratum fraction of rows.

    Row kept iff md5_low32(id) % buckets < round(frac(stratum) × buckets).
    Per-stratum fractions let a pipeline rebalance skewed strata (e.g. keep
    5% of English pages but 100% of a low-resource language) — the standard
    training-data curation shape. Stateless and shuffle-free: the keep
    decision depends only on (id, stratum).
    """
    thresholds = {k: int(round(v * buckets)) for k, v in fractions.items()}
    default_thr = int(round(default_fraction * buckets))

    def keep(b: pa.Table) -> pa.Table:
        bk = (md5_low32_array(b[id_col]) % np.uint32(buckets)).astype(np.int64)
        strata = b[strata_col].to_pylist()
        thr = np.fromiter(
            (thresholds.get(s, default_thr) for s in strata),
            dtype=np.int64,
            count=len(strata),
        )
        return b.filter(pa.array(bk < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(
    ds: Dataset,
    *,
    id_col: str,
    weight_col: str,
    rate_per_unit: float,
    buckets: int = _BUCKETS,
) -> Dataset:
    """Weight-proportional Bernoulli sampling: row kept with probability
    min(1, weight × rate_per_unit) — quality-weighted corpus downsampling
    (keep high-scoring docs more often) without any shuffle or RNG.

    Kept iff md5_low32(id) % buckets < floor(min(1, w·rate) × buckets + .5)
    (half-up — matches SQL ``floor(x + 0.5)``; numpy/Python ``round`` are
    half-to-even and would diverge from the oracle on exact halves), so
    the decision is a pure (id, weight) function: reproducible at any
    layout, auditable in SQL, and monotone in the weight — raising a doc's
    score can only move it INTO the sample, never out.
    """

    def keep(b: pa.Table) -> pa.Table:
        bk = (md5_low32_array(b[id_col]) % np.uint32(buckets)).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        thr = np.floor(
            np.minimum(w * rate_per_unit, 1.0) * buckets + 0.5
        ).astype(np.int64)
        return b.filter(pa.array(bk < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def cross_split_leaks(
    ds: Dataset,
    *,
    id_col: str,
    text_col: str,
    splits: dict[str, float] | None = None,
    prefix_tokens: int = 8,
    buckets: int = _BUCKETS,
) -> Dataset:
    """Decontamination check: content fingerprints present in ≥2 splits.

    The fingerprint is md5 of the first ``prefix_tokens`` whitespace tokens
    (the standard n-gram-overlap contamination key — exact-duplicate AND
    shared-boilerplate leaks both surface; whole-doc equality misses the
    latter). Two-phase: per-batch partial pivot counts per fingerprint,
    one dictionary-scale groupby over fingerprints (# distinct fingerprints
    ≪ corpus when leaks exist; the groupby payload is counts, not text).

    Returns (fingerprint, n_<split>…) rows for fingerprints spanning more
    than one split — the rows a curation pipeline would quarantine.
    """
    import hashlib

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(splits)
    assigned = hash_split(ds, id_col=id_col, splits=splits, buckets=buckets)

    def partial(b: pa.Table) -> pa.Table:
        fps = pa.array(
            [
                hashlib.md5(
                    " ".join((t or "").split()[:prefix_tokens]).encode()
                ).hexdigest()
                for t in b[text_col].to_pylist()
            ],
            pa.string(),
        )
        cols = {"fingerprint": fps}
        for n in names:
            cols[f"n_{n}"] = pc.cast(pc.equal(b["split"], n), pa.int64())
        t = pa.table(cols)
        return (
            pa.TableGroupBy(t, ["fingerprint"], use_threads=False)
            .aggregate([(f"n_{n}", "sum") for n in names])
            .rename_columns(["fingerprint"] + [f"n_{n}" for n in names])
        )

    counts = assigned.map_batches(partial, batch_format="pyarrow").groupby(
        "fingerprint"
    ).aggregate(*[Sum(f"n_{n}", alias_name=f"n_{n}") for n in names])

    def leaks_only(b: pa.Table) -> pa.Table:
        nz = None
        for n in names:
            ind = pc.cast(pc.greater(b[f"n_{n}"], 0), pa.int64())
            nz = ind if nz is None else pc.add(nz, ind)
        return b.filter(pc.greater(nz, 1))

    return counts.map_batches(leaks_only, batch_format="pyarrow")


def reservoir_per_key(
    ds: Dataset,
    *,
    key_col: str,
    id_col: str = "doc_id",
    k: int = 5,
) -> Dataset:
    """Deterministic exact-k per-key sample — the distributed stand-in for
    per-stratum reservoir sampling: keep each key's k rows with the
    SMALLEST (md5_low32(id), id) rank. The md5 order is uniform-ish and
    content-determined (same sample at any parallelism/partitioning, and
    SQL-replayable via the usual md5-low32 expression), unlike a true
    reservoir whose result depends on arrival order. Exact k per stratum,
    where stratified_sample gives a per-row keep PROBABILITY.

    Scale shape = grouped_top_k: each block truncates to k rows per key
    locally, so a whale stratum exchanges O(blocks × k) rows.
    """
    from code_graph_rag_ray.stages.relational import grouped_top_k

    def add_rank(b: pa.Table) -> pa.Table:
        h = md5_low32_array(b[id_col]).astype(np.int64)
        return b.append_column("__h", pa.array(h, pa.int64()))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    out = grouped_top_k(ranked, key_col, "__h", k, descending=False,
                        tiebreak=id_col)
    return out.map_batches(
        lambda b: b.drop_columns(["__h"]), batch_format="pyarrow"
    )


def negative_samples(
    edges: Dataset,
    nodes: Dataset,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    node_col: str = "url",
    k: int = 2,
    n_nodes: int | None = None,
) -> Dataset:
    """Filtered negative sampling for KG-embedding training: each positive
    edge mints ``k`` corrupted triples by replacing the object with a
    deterministically drawn node, then TRUE edges are anti-joined away
    (the standard "filtered" protocol) — so the output is a pure function
    of the graph, batch-layout-independent, and SQL-auditable.

    Draw: node index = md5_low64(src|dst|j) mod n — the policy-auditable
    hash family (DuckDB recomputes it exactly), over a dense node indexing
    built by the distributed two-pass ``global_rank`` (ORDER BY node id).
    Scale shape: candidates are edge-scale × k; the index→node gather and
    the (src, neg) anti-join are bucketed cogroup joins (both sides
    corpus-scale, never a broadcast). Self-loops (neg == src) are kept —
    filter downstream if the training recipe excludes them.

    Output: (src, dst, neg_ix, neg) — the positive pair, the draw index,
    and the corrupted object.
    """
    from code_graph_rag_ray.functions.hashing import md5_low64_array
    from code_graph_rag_ray.stages.ranking import global_rank
    from code_graph_rag_ray.stages.relational import bucketed_join

    if n_nodes is None:
        n_nodes = nodes.count()
    idxed = global_rank(nodes.select_columns([node_col]), node_col,
                        tiebreak=node_col, out_col="rank")

    def to_idx(b: pa.Table) -> pa.Table:
        r = pc.subtract(pc.cast(b["rank"], pa.int64()), 1)
        return pa.table({"idx": r, "neg": b[node_col]})

    idxed = idxed.map_batches(to_idx, batch_format="pyarrow")

    def candidates(b: pa.Table) -> pa.Table:
        outs = []
        for j in range(k):
            key = pc.binary_join_element_wise(
                pc.cast(b[src_col], pa.string()), pc.cast(b[dst_col], pa.string()),
                pa.array([str(j)] * b.num_rows, pa.string()), "|")
            idx = (md5_low64_array(key) % np.uint64(n_nodes)).astype(np.int64)
            outs.append(pa.table({
                "src": b[src_col], "dst": b[dst_col],
                "neg_ix": pa.array(np.full(b.num_rows, j, np.int64)),
                "idx": pa.array(idx),
            }))
        return pa.concat_tables(outs)

    cand = edges.map_batches(candidates, batch_format="pyarrow")
    gathered = bucketed_join(
        cand, idxed, on="idx",
        left_schema=pa.schema([("src", pa.string()), ("dst", pa.string()),
                               ("neg_ix", pa.int64()), ("idx", pa.int64())]),
        right_schema=pa.schema([("idx", pa.int64()), ("neg", pa.string())]),
    ).drop_columns(["idx"])
    true_edges = edges.map_batches(
        lambda b: pa.table({"src": b[src_col], "neg": b[dst_col]}),
        batch_format="pyarrow")
    return bucketed_join(
        gathered, true_edges, on=["src", "neg"], how="anti",
        left_schema=pa.schema([("src", pa.string()), ("dst", pa.string()),
                               ("neg_ix", pa.int64()), ("neg", pa.string())]),
        right_schema=pa.schema([("src", pa.string()), ("neg", pa.string())]),
    )


def source_mix_sample(
    ds: Dataset,
    *,
    id_col: str,
    source_col: str,
    size_col: str,
    weights: dict[str, int],
) -> Dataset:
    """Curriculum / source-mix rebalancing: downsample each source so the
    retained corpus matches target mix ``weights`` (integer ratios, e.g.
    wiki:3 web:1) as closely as the data allows — the static-weight data
    mixing step of every large pretraining pipeline (DoReMi et al. use
    learned weights; the APPLY mechanics are identical).

    The binding source m (smallest size/weight ratio) is kept whole; every
    other source s is thinned to rate ``w_s·t_m / (w_m·t_s)`` by the
    md5-low32 policy hash, so the decision is a pure function of
    (id, source) — partitioning-independent and leak-free for duplicated
    ids. The accept test is INTEGER-exact (``u32·t_s·w_m < 2³²·w_s·t_m``,
    unbounded ints / HUGEINT in the oracle) — no float rounding at the
    acceptance boundary. Output: one row per input row,
    ``(id_col, source_col, sampled bool)``.

    Scale shape: per-source totals are a two-phase grouped sum whose
    result is O(#sources) — a legitimate driver-side broadcast (the
    centroid pattern); the accept pass is stateless map_batches.
    """
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    totals = {
        r[source_col]: int(r["t"])
        for r in partial_groupby_sum(
            ds.select_columns([source_col, size_col]),
            [source_col], {size_col: "t"},
        ).take_all()
    }
    missing = set(totals) - set(weights)
    if missing:
        raise ValueError(f"no target weight for sources: {sorted(missing)}")
    # binding source: smallest size/weight ratio — double ratio ordering
    # with a source-name tie-break, mirrored EXACTLY by the oracle's
    # ORDER BY CAST(t AS DOUBLE)/CAST(w AS DOUBLE), source LIMIT 1
    m = min(totals, key=lambda s: (totals[s] / float(weights[s]), s))
    wm, tm = int(weights[m]), totals[m]
    rhs = {s: (1 << 32) * int(weights[s]) * tm for s in totals}
    lhs_f = {s: totals[s] * wm for s in totals}

    def accept(b: pa.Table) -> pa.Table:
        u = md5_low32_array(b[id_col]).astype(object)  # unbounded ints
        src = b[source_col].to_pylist()
        ok = [int(ui) * lhs_f[s] < rhs[s] for ui, s in zip(u, src)]
        return pa.table({
            id_col: b[id_col],
            source_col: b[source_col],
            "sampled": pa.array(ok, pa.bool_()),
        })

    return ds.map_batches(accept, batch_format="pyarrow")
