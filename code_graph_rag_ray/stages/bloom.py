"""Bloom-filter membership: build a bitmap over a key column, then
semi/anti-join a probe dataset against it WITHOUT a shuffle.

At 100 TB the membership question ("is this train doc's fingerprint in the
held-out set?", "does this fact row's key exist in the dimension?") must not
become an all-to-all join: the build side folds into an m-bit bitmap via a
mergeable aggregate (per-block partial bitmaps OR-combined pairwise by the
Ray Data aggregate tree — never concatenated on the driver), the bitmap is
``ray.put`` once, and the probe side filters inside ``map_batches``. False
positives are inherent; callers either tolerate them (pre-filter before an
exact join) or size ``m_bits`` for the target rate (m ≈ -n·ln(p)/ln(2)²).

Reference parity: the reference gates whole-file re-processing with an MD5
hash set held in one process (``graph_updater.py:129-141``); this is the
distributed, bounded-memory analog of that membership check.

Two hash families:

- ``hash_fn="fast"`` (default): double hashing off the vectorized
  splitmix64 content hash (``functions/hashing.stable_hash_array``) —
  zero Python-per-row work, for internal pre-filters.
- ``hash_fn="md5"``: h1/h2 = first/second 4 md5 digest bytes, the
  SQL-recomputable family (`('0x'||substr(md5(x),1,8))::UBIGINT`) — for
  POLICY decisions a user must audit: DuckDB can replay the exact bitmap,
  INCLUDING false positives, so the oracle match is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.functions.hashing import stable_hash_array

_FAST_SALT2 = np.uint64(0xD6E8FEB86659FD93)  # distinct odd mixer for h2


def _h1_h2(arr: pa.Array | pa.ChunkedArray, hash_fn: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (h1, h2) uint64 pair for double hashing."""
    if hash_fn == "fast":
        h = stable_hash_array(arr)
        return h, (h ^ (h >> np.uint64(29))) * _FAST_SALT2 | np.uint64(1)
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    import hashlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        arr = pc.cast(arr, pa.string())
    n = len(arr)
    h1 = np.empty(n, np.uint64)
    h2 = np.empty(n, np.uint64)
    for i, v in enumerate(arr.to_pylist()):
        d = hashlib.md5((v or "").encode()).digest()
        h1[i] = int.from_bytes(d[:4], "big")
        h2[i] = int.from_bytes(d[4:8], "big")
    return h1, h2


def _positions(arr, *, m_bits: int, k: int, hash_fn: str) -> np.ndarray:
    """(n, k) int64 bit positions: (h1 + i·h2) mod m, exact uint64 ops."""
    h1, h2 = _h1_h2(arr, hash_fn)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_build(
    ds: Dataset, key_col: str, *, m_bits: int = 1 << 20, k: int = 3,
    hash_fn: str = "fast",
) -> np.ndarray:
    """Fold ``ds[key_col]`` into an m-bit bitmap (uint8, m/8 bytes).

    Mergeable aggregate: each block contributes a partial bitmap; merges are
    bitwise OR, so the combine tree never moves more than m/8 bytes per
    edge regardless of input size."""
    from ray.data.aggregate import AggregateFn

    nbytes = (m_bits + 7) // 8

    def acc_block(state: np.ndarray, block) -> np.ndarray:
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        pos = _positions(tbl[key_col], m_bits=m_bits, k=k, hash_fn=hash_fn)
        out = state.copy()  # aggregate state must not be mutated in place
        np.bitwise_or.at(out, pos.ravel() >> 3,
                         np.uint8(1) << (pos.ravel() & 7).astype(np.uint8))
        return out

    agg = AggregateFn(
        init=lambda _: np.zeros(nbytes, np.uint8),
        accumulate_block=acc_block,
        merge=np.bitwise_or,
        name="bloom",
    )
    return ds.aggregate(agg)["bloom"]


def bloom_contains(
    bits: np.ndarray, arr, *, m_bits: int, k: int, hash_fn: str = "fast"
) -> np.ndarray:
    """Vectorized membership mask for an Arrow key array."""
    pos = _positions(arr, m_bits=m_bits, k=k, hash_fn=hash_fn)
    hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return hit.all(axis=1)


def bloom_semi_join(
    probe: Dataset, key_col: str, bits_ref, *, m_bits: int, k: int = 3,
    hash_fn: str = "fast", anti: bool = False,
) -> Dataset:
    """Filter ``probe`` to rows whose key (possibly falsely) hits the bloom.

    ``bits_ref`` is a ``ray.ObjectRef`` from ``ray.put(bits)`` (fetched once
    per worker via the broadcast cache) or the bitmap itself for tests.
    ``anti=True`` keeps the rows that CANNOT be in the build side — bloom
    anti-joins have no false drops, making them safe decontamination
    pre-filters."""
    from code_graph_rag_ray.functions.broadcast import get_broadcast

    def fn(b: pa.Table) -> pa.Table:
        bits = get_broadcast(bits_ref)
        mask = bloom_contains(bits, b[key_col], m_bits=m_bits, k=k,
                              hash_fn=hash_fn)
        return b.filter(pa.array(~mask if anti else mask))

    return probe.map_batches(fn, batch_format="pyarrow")
