"""Bloom membership: no false negatives ever, anti-join is exactly the
complement, the md5 family matches a single-process replay bit-for-bit,
and a small-m filter really does emit false positives (what the catalog
oracle query relies on to prove exact bitmap replay).

Reference parity: distributed analog of the reference's in-process MD5
membership gate (graph_updater.py:129-141).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from code_graph_rag_ray.stages.bloom import (
    bloom_build,
    bloom_contains,
    bloom_semi_join,
)


def _ds(keys, extra=None):
    rows = [{"key": k, **({"v": i} if extra is None else extra(i))}
            for i, k in enumerate(keys)]
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(6)


def test_no_false_negatives_and_anti_complement():
    build_keys = [f"doc-{i}" for i in range(0, 400, 2)]
    probe_keys = [f"doc-{i}" for i in range(400)]
    bits = bloom_build(_ds(build_keys), "key", m_bits=1 << 16, k=4)
    ref = ray.put(bits)
    semi = bloom_semi_join(_ds(probe_keys), "key", ref, m_bits=1 << 16, k=4)
    anti = bloom_semi_join(_ds(probe_keys), "key", ref, m_bits=1 << 16, k=4,
                           anti=True)
    kept = {r["key"] for r in semi.take_all()}
    dropped = {r["key"] for r in anti.take_all()}
    assert set(build_keys) <= kept  # bloom never drops a real member
    assert kept | dropped == set(probe_keys) and not (kept & dropped)


def test_md5_family_matches_scalar_replay():
    keys = [f"u{i}" for i in range(50)]
    bits = bloom_build(_ds(keys), "key", m_bits=4096, k=3, hash_fn="md5")
    # single-process replay of the documented construction
    exp = np.zeros(4096 // 8, np.uint8)
    for s in keys:
        d = hashlib.md5(s.encode()).digest()
        h1, h2 = int.from_bytes(d[:4], "big"), int.from_bytes(d[4:8], "big")
        for i in range(3):
            p = (h1 + i * h2) % 4096
            exp[p >> 3] |= 1 << (p & 7)
    assert bytes(bits) == bytes(exp)


def test_small_m_produces_false_positives_bounded_fp_rate():
    members = [f"m{i}" for i in range(300)]
    outsiders = [f"x{i}" for i in range(3000)]
    bits = bloom_build(_ds(members), "key", m_bits=2048, k=3)
    mask = bloom_contains(bits, pa.array(outsiders), m_bits=2048, k=3)
    fp = int(mask.sum())
    # fill ≈ 1-exp(-900/2048) ≈ 0.36 → fp ≈ 0.36³ ≈ 4.6%; demand presence
    # (the oracle query depends on fp rows being replayed) and sanity bound
    assert 0 < fp < len(outsiders) * 0.15
    # and a right-sized filter keeps the rate tiny
    bits_big = bloom_build(_ds(members), "key", m_bits=1 << 16, k=4)
    mask_big = bloom_contains(bits_big, pa.array(outsiders), m_bits=1 << 16, k=4)
    assert int(mask_big.sum()) < len(outsiders) * 0.005


def test_bitmap_layout_invariant():
    keys = [f"k{i}" for i in range(500)]
    a = bloom_build(_ds(keys).repartition(1), "key", m_bits=1 << 14, k=3)
    b = bloom_build(_ds(keys).repartition(11), "key", m_bits=1 << 14, k=3)
    assert bytes(a) == bytes(b)
