"""DSIR-style importance scoring for training-data selection.

Data Selection via Importance Resampling (Xie et al. 2023, public): score
every raw document by how much its hashed n-gram feature distribution
looks like a TARGET domain, estimated from the corpus itself. The
pipeline is two streaming passes, no full-corpus materialization:

1. COUNT — per-batch vectorized tokenize (the shared ``[^a-z0-9]+``
   RE2 split, identical to DuckDB's ``regexp_split_to_array``), hashed
   unigram + bigram feature buckets, block-local ``np.bincount`` partials
   (one (bucket, ct, cr) row per bucket per batch — a hot bucket
   exchanges O(blocks), never O(tokens)), then one tiny grouped sum over
   ≤ ``num_buckets`` rows.
2. SCORE — the bucket weight table is dictionary-scale
   (``num_buckets`` ≤ a few thousand rows), so it is ``ray.put`` once and
   indexed as a flat numpy array inside every score task; each document's
   score is one ``lam[buckets].sum()`` gather — no shuffle at all.

Fixed-point weight (the bit-exact-oracle variant of the paper's
log-likelihood ratio): per bucket f,

    q[f]   = ((ct[f] + 1) << S) // (cr[f] + 1)      # smoothed ratio, int
    lam[f] = bit_length(q[f]) - (S + 1)             # integer log2(q) - S

so ratio 1 ⇒ lam 0, each doubling of the target/raw ratio ⇒ +1.
``bit_length`` is computed by bit-smearing + popcount (never
``floor(log2(x))``, whose libm rounding can disagree near 2^53 — the HLL
rho lesson), which DuckDB replays exactly with ``bit_count``; the
division is non-negative BIGINT // BIGINT, truncation == floor on both
sides. score(doc) = Σ over the doc's feature OCCURRENCES of lam[bucket]
— the paper's sum of per-token log ratios, quantized to integer log2
steps. A finer-grained float path would diverge libm-by-libm; the
quantized weights keep the whole op bit-exact against the SQL oracle.

Hash families mirror ``stages/dedup.py``: ``md5`` (default) is the
auditable convention DuckDB can replay (``('0x' || substr(md5(f),1,8))
::UBIGINT % B``); ``fast`` swaps in the vectorized polynomial family
(``functions/hashing.stable_hash_array``) for production throughput where
SQL parity is not needed.

cgr analog: the reference scores/filters repository files by heuristic
relevance before ingest (graph_updater.py file-tree pruning +
.gitignore/queries routing); this is the corpus-statistical version a
web-scale training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_TOKEN_SPLIT = "[^a-z0-9]+"


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for non-negative int64/uint64 values:
    popcount(x | x>>1 | ... | x>>32) — integer-only, no libm."""
    from code_graph_rag_ray.stages.sketch import _popcount64

    s = x.astype(np.uint64)
    for shift in (1, 2, 4, 8, 16, 32):
        s = s | (s >> np.uint64(shift))
    return _popcount64(s).astype(np.int64)


def _feature_strings(texts: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray]:
    """(features, parent_row): hashed-feature INPUT strings — every
    unigram token plus every adjacent in-document bigram joined with one
    space (tokens are alnum-only, so the two families cannot collide
    before hashing). Fully vectorized: list offsets drive the adjacency
    mask; no Python loop over rows or tokens."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=_TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parent = parent[keep]
    n = len(flat)
    if n == 0:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    feats = [flat]
    parents = [parent]
    if n > 1:
        adj = parent[:-1] == parent[1:]
        if adj.any():
            big = pc.binary_join_element_wise(
                flat.slice(0, n - 1), flat.slice(1, n - 1), " "
            ).filter(pa.array(adj))
            feats.append(big)
            parents.append(parent[:-1][adj])
    return pa.concat_arrays([f.combine_chunks() if isinstance(f, pa.ChunkedArray)
                             else f for f in feats]), np.concatenate(parents)


def _buckets(feats: pa.Array, num_buckets: int, hash_family: str) -> np.ndarray:
    if hash_family == "md5":
        from code_graph_rag_ray.functions.hashing import md5_low32_array

        h = md5_low32_array(feats).astype(np.uint64)
    else:
        from code_graph_rag_ray.functions.hashing import stable_hash_array

        h = stable_hash_array(feats)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def dsir_scores(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "lang",
    target_value: str = "en",
    num_buckets: int = 1024,
    scale_bits: int = 16,
    hash_family: str = "md5",
) -> Dataset:
    """Per-document fixed-point DSIR importance score vs the target domain
    ``domain_col == target_value``. Returns (id, in_target, n_feats,
    dsir_score) for EVERY input document (empty/alnum-free texts score 0
    with n_feats 0). See module docstring for the exact weight algebra."""
    import ray

    from code_graph_rag_ray.functions.broadcast import get_broadcast
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    def count_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "ct": pa.array([], pa.int64()),
                          "cr": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        feats, parent = _feature_strings(b[text_col])
        if len(feats) == 0:
            return empty
        bk = _buckets(feats, num_buckets, hash_family)
        # null domain counts as raw (oracle: coalesce(lang = 'en', FALSE))
        is_t = pc.fill_null(
            pc.equal(b[domain_col], target_value), False
        ).to_numpy(zero_copy_only=False)[parent]
        ct = np.bincount(bk[is_t], minlength=num_buckets)
        cr = np.bincount(bk[~is_t], minlength=num_buckets)
        used = (ct > 0) | (cr > 0)
        idx = np.flatnonzero(used)
        return pa.table({"bucket": pa.array(idx, pa.int64()),
                         "ct": pa.array(ct[idx], pa.int64()),
                         "cr": pa.array(cr[idx], pa.int64())})

    counts = partial_groupby_sum(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["bucket"], {"ct": "ct", "cr": "cr"},
    ).to_pandas()  # ≤ num_buckets rows — dictionary-scale by construction

    ct = np.zeros(num_buckets, dtype=np.int64)
    cr = np.zeros(num_buckets, dtype=np.int64)
    if len(counts):
        ct[counts["bucket"].to_numpy()] = counts["ct"].to_numpy()
        cr[counts["bucket"].to_numpy()] = counts["cr"].to_numpy()
    # shift in uint64 with an exact headroom check: int64 would wrap
    # silently once a bucket's smoothed count reaches 2^(63-scale_bits)
    max_ct = int(ct.max()) if len(ct) else 0
    if (max_ct + 1) >= (1 << (64 - scale_bits)):
        raise OverflowError(
            f"dsir bucket count {max_ct} overflows the uint64 ratio at "
            f"scale_bits={scale_bits}; raise num_buckets or lower scale_bits"
        )
    q = ((ct.astype(np.uint64) + np.uint64(1)) << np.uint64(scale_bits)) // (
        cr.astype(np.uint64) + np.uint64(1)
    )
    lam = _bit_length_u64(q) - (scale_bits + 1)
    lam_ref = ray.put(lam)

    def score(b: pa.Table) -> pa.Table:
        lam_ = get_broadcast(lam_ref)
        nrows = b.num_rows
        out_score = np.zeros(nrows, dtype=np.int64)
        out_n = np.zeros(nrows, dtype=np.int64)
        if nrows:
            feats, parent = _feature_strings(b[text_col])
            if len(feats):
                bk = _buckets(feats, num_buckets, hash_family)
                np.add.at(out_score, parent, lam_[bk])
                np.add.at(out_n, parent, 1)
        return pa.table(
            {id_col: b[id_col],
             "in_target": pc.fill_null(
                 pc.equal(b[domain_col], target_value), False),
             "n_feats": pa.array(out_n, pa.int64()),
             "dsir_score": pa.array(out_score, pa.int64())}
        )

    return ds.map_batches(score, batch_format="pyarrow")
