"""Stable hashing helpers for partitioning / dedup keys.

Partition assignment must be deterministic ACROSS RUNS (the resume manifest
identifies finished partitions by number), so we use crc32 — stable by
definition — rather than Python's randomized ``hash`` or version-dependent
library hashes. The loop is a thin C call per row; it only runs at the
materialize/dedup boundary, not in the per-token hot path.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def crc32_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint32 crc32 per element of a string/binary Arrow array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    crc = zlib.crc32
    return np.fromiter(
        (crc(v.encode() if isinstance(v, str) else (v or b"")) for v in arr.to_pylist()),
        dtype=np.uint32,
        count=len(arr),
    )


def partition_ids(arr: pa.Array | pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    return (crc32_array(arr) % np.uint32(num_partitions)).astype(np.int32)


def md5_hex_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Content-hash column (cgr's MD5 change detection, graph_updater.py:129-141)."""
    import hashlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = [
        hashlib.md5(v.encode() if isinstance(v, str) else (v or b"")).hexdigest()
        for v in arr.to_pylist()
    ]
    return pa.array(out, pa.string())
