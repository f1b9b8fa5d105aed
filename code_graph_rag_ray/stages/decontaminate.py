"""Benchmark decontamination — n-gram overlap against an eval set.

The canonical training-data hygiene step (GPT-3 appendix C / C4 / Dolma
style): a document is *contaminated* when any of its word n-gram shingles
also appears in a benchmark/eval corpus, and contaminated documents are
flagged (or dropped) before training. The reference has no analog (its
corpus is a code repository, not a training set); this is a first-class
member of the LLM-data-curation family alongside the dedup stages and
reuses their shingle hash machinery (`stages/dedup.py`).

Scale shape (100 TB corpus, fixed benchmark):

- The benchmark side is SMALL by contract — eval suites are 10^4..10^6
  examples, so their distinct shingle-hash set is a few MB to a few
  hundred MB. `benchmark_ngram_hashes` computes per-block DISTINCT hashes
  in parallel (`map_batches` + `np.unique`) and unions them on the
  driver: driver state is O(|benchmark shingle vocab|), which IS the
  broadcast payload — the same bounded-driver-state contract as BM25's
  query-term vocabulary (`stages/bm25.py`).
- The corpus side streams: the sorted benchmark hash array is `ray.put`
  once and fetched once per worker (`functions/broadcast.get_broadcast`,
  not per batch); membership is a vectorized `np.searchsorted` per flat
  shingle array — O(log B) per shingle, no shuffle, no join, the corpus
  is touched in one streaming pass.
- If the "benchmark" side ever approaches corpus scale (cross-corpus
  decontamination), this broadcast shape is wrong — flip to a bucketed
  semi-join on the shingle hash (the `minhash_verify` pattern in
  `stages/dedup.py`); the flag semantics are identical.

Short documents (< n tokens) degrade to ONE whole-text hash on both
sides — the same fallback as the MinHash signature family — so a short
benchmark string contaminates only its exact duplicates.

Hash families mirror `stages/dedup.py`: ``"fast"`` (vectorized siphash
n-gram combine, production default) and ``"md5"`` (per-shingle md5-low32,
DuckDB-replayable — the oracle/audit variant used by the
`doc_decontaminate` catalog query).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _flat_hashes(texts, n: int, hash_family: str) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 hashes, offsets) for a batch, either family."""
    from code_graph_rag_ray.stages.dedup import (
        _fast_shingle_hashes_flat,
        _token_hashes,
    )

    if hash_family == "fast":
        return _fast_shingle_hashes_flat(texts, n)
    if hash_family != "md5":
        raise ValueError(f"unknown hash_family {hash_family!r}")
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    parts = [_token_hashes(t or "", n) for t in texts]
    off = np.zeros(len(parts) + 1, dtype=np.int64)
    np.cumsum([len(p) for p in parts], out=off[1:])
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    return flat, off


def benchmark_ngram_hashes(
    bench: Dataset,
    *,
    text_col: str = "text",
    n: int = 4,
    hash_family: str = "fast",
) -> np.ndarray:
    """Sorted distinct shingle hashes of the (small) benchmark side.

    Distinct-per-block runs distributed; the driver unions block vocabs —
    bounded by the benchmark shingle vocabulary (see module docstring)."""

    def uniq(b: pa.Table) -> pa.Table:
        h, _ = _flat_hashes(b[text_col], n, hash_family)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    parts = bench.map_batches(uniq, batch_format="pyarrow").take_all()
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.asarray([r["h"] for r in parts], dtype=np.uint64))


def decontaminate(
    docs: Dataset,
    bench_hashes,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    hash_family: str = "fast",
) -> Dataset:
    """Per-document contamination flags vs a broadcast benchmark hash set.

    Output columns: ``(id_col, n_shingles, n_hits, contaminated)`` —
    ``n_hits`` counts shingle POSITIONS whose hash is in the benchmark
    set (repeated contaminated n-grams count every occurrence, the
    overlap-mass convention), ``contaminated = n_hits > 0``.

    ``bench_hashes`` may be a numpy array (driver-side, will be put once)
    or an existing ``ray.ObjectRef`` to a SORTED uint64 array.
    """
    import ray

    from code_graph_rag_ray.functions.broadcast import get_broadcast

    if not isinstance(bench_hashes, ray.ObjectRef):
        bench_hashes = ray.put(np.sort(np.asarray(bench_hashes, dtype=np.uint64)))
    ref = bench_hashes

    def score(b: pa.Table) -> pa.Table:
        bh = get_broadcast(ref)
        h, off = _flat_hashes(b[text_col], n, hash_family)
        if len(bh) and len(h):
            idx = np.searchsorted(bh, h)
            hit = (idx < len(bh)) & (bh[np.minimum(idx, len(bh) - 1)] == h)
        else:
            hit = np.zeros(len(h), dtype=bool)
        hc = np.zeros(len(h) + 1, dtype=np.int64)
        np.cumsum(hit, dtype=np.int64, out=hc[1:])
        n_hits = hc[off[1:]] - hc[off[:-1]]
        n_sh = off[1:] - off[:-1]
        return pa.table(
            {
                id_col: b[id_col],
                "n_shingles": pa.array(n_sh, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
