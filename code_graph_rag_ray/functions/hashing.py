"""Stable hashing helpers for partitioning / dedup keys.

Partition assignment must be deterministic ACROSS RUNS (the resume manifest
identifies finished partitions by number), so every hash here is a pure
function of the bytes — never Python's randomized ``hash`` or a
version-dependent library hash.

``stable_hash_array`` is the partitioning workhorse: an order-aware
polynomial hash computed VECTORIZED over the Arrow array's flattened byte
buffer (offsets + data, zero Python-per-row work), finalized with a
splitmix64-style mixer for distribution. It runs on the edge-materialize /
bucketed-join path that every edge row traverses, so the per-row Python
``zlib.crc32`` loop it replaces was the hottest scalar loop in the engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _splitmix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants) — uint64 wraparound."""
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def stable_hash_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 content hash per element of an Arrow string/binary array.

    h(row) = mix(len + sum_i (byte_i + 1) * M^i mod 2^64) — order-aware,
    deterministic across runs/processes/platforms (fixed constants, exact
    mod-2^64 arithmetic), and fully vectorized: one pass over the flattened
    data buffer with ``np.add.reduceat`` per-row segment sums. Nulls hash
    like empty strings.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not (pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)):
        arr = pc.cast(pc.cast(arr, pa.string()), pa.binary())
    arr = pc.fill_null(arr, b"")
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    # binary layout: buffers = [validity, int32 offsets, data]
    offsets = np.frombuffer(
        arr.buffers()[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4
    ).astype(np.int64)
    lengths = np.diff(offsets)
    h = lengths.astype(np.uint64)  # seed with length
    total = int(offsets[-1] - offsets[0])
    if total > 0:
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
            offsets[0] : offsets[-1]
        ].astype(np.uint64)
        row_starts = offsets[:-1] - offsets[0]
        pos = np.arange(total, dtype=np.int64) - np.repeat(row_starts, lengths)
        maxlen = int(lengths.max())
        powers = np.empty(maxlen, dtype=np.uint64)
        powers[0] = 1
        if maxlen > 1:
            np.multiply.accumulate(
                np.full(maxlen - 1, _MULT, dtype=np.uint64), out=powers[1:]
            )
        contrib = (data + np.uint64(1)) * powers[pos]
        nonempty = lengths > 0
        # rows are contiguous in the flattened buffer, so reduceat over the
        # starts of the NON-EMPTY rows yields exact per-row segment sums
        # (reduceat mishandles zero-length segments, hence the mask)
        h[nonempty] += np.add.reduceat(contrib, row_starts[nonempty])
    return _splitmix(h)


def crc32_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint32 stable hash per element (legacy name; now the vectorized
    polynomial hash truncated to 32 bits — still cross-run stable)."""
    return (stable_hash_array(arr) & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def partition_ids(arr: pa.Array | pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    return (stable_hash_array(arr) % np.uint64(num_partitions)).astype(np.int32)


def md5_low32_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint32 = first 4 md5 digest bytes (big-endian) per element.

    The oracle-checkable sibling of ``stable_hash_array``: DuckDB rebuilds
    the exact values with ``('0x' || substr(md5(x),1,8))::UBIGINT``, which
    is what lets split/sample assignments be verified bit-exactly in SQL.
    Use it for POLICY decisions a user must be able to audit (train/val
    splits, samples); use ``stable_hash_array`` for internal partitioning
    where speed matters and no SQL parity is needed.
    """
    import hashlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5((v or "").encode()).digest()[:4], "big")
            for v in arr.to_pylist()
        ),
        dtype=np.uint32,
        count=len(arr),
    )


def md5_hex_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Content-hash column (cgr's MD5 change detection, graph_updater.py:129-141).

    MD5 itself (the reference-parity + oracle-checkable hash) has no
    vectorized kernel; the loop stays but runs distributed inside tasks.
    """
    import hashlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = [
        hashlib.md5(v.encode() if isinstance(v, str) else (v or b"")).hexdigest()
        for v in arr.to_pylist()
    ]
    return pa.array(out, pa.string())


def md5_low64_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 = first 8 md5 digest bytes (big-endian) per element — the
    wide sibling of ``md5_low32_array`` for modulo draws over large ranges.
    DuckDB rebuilds it with ``('0x' || substr(md5(x), 1, 16))::UBIGINT``."""
    import hashlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5((v or "").encode()).digest()[:8], "big")
            for v in arr.to_pylist()
        ),
        dtype=np.uint64,
        count=len(arr),
    )
