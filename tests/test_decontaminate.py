"""Benchmark-decontamination tests (stages/decontaminate.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from code_graph_rag_ray.stages.decontaminate import (
    benchmark_ngram_hashes,
    decontaminate,
)


def _docs(rows):
    return rd.from_arrow(
        pa.Table.from_pylist(
            [{"doc_id": i, "text": t} for i, t in rows],
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        )
    )


BENCH = _docs([(100, "alpha beta gamma delta epsilon zeta"), (101, "tiny")])

TRAIN = [
    # contains bench 4-gram "beta gamma delta epsilon" → contaminated
    (0, "intro words then beta gamma delta epsilon and a tail"),
    # repeats a contaminated 4-gram twice → n_hits counts both positions
    (1, "alpha beta gamma delta x alpha beta gamma delta"),
    # clean
    (2, "completely unrelated content with no overlap at all here"),
    # short doc, exact duplicate of the short bench doc → contaminated
    (3, "tiny"),
    # short doc, not a duplicate → clean
    (4, "small"),
]


def _run(hash_family):
    bh = benchmark_ngram_hashes(BENCH, n=4, hash_family=hash_family)
    out = (
        decontaminate(_docs(TRAIN), bh, n=4, hash_family=hash_family)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


def test_decontaminate_flags_and_hit_counts():
    out = _run("md5")
    assert list(out["contaminated"]) == [True, True, False, True, False]
    # doc 0: exactly one overlapping window
    assert out.loc[0, "n_hits"] == 1
    # doc 1: "alpha beta gamma delta" appears at two positions
    assert out.loc[1, "n_hits"] == 2
    # n_shingles = tokens - 3 for long docs, 1 for short-doc fallback
    assert out.loc[0, "n_shingles"] == len(TRAIN[0][1].split()) - 3
    assert out.loc[3, "n_shingles"] == 1 and out.loc[4, "n_shingles"] == 1


def test_decontaminate_families_agree_on_flags():
    md5 = _run("md5")
    fast = _run("fast")
    # hashes differ between families but shingle membership does not
    assert list(md5["contaminated"]) == list(fast["contaminated"])
    assert list(md5["n_hits"]) == list(fast["n_hits"])
    assert list(md5["n_shingles"]) == list(fast["n_shingles"])


def test_decontaminate_empty_benchmark_is_all_clean():
    out = decontaminate(
        _docs(TRAIN), np.empty(0, dtype=np.uint64), n=4
    ).to_pandas()
    assert not out["contaminated"].any()
    assert (out["n_hits"] == 0).all()


_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_texts = st.lists(_words, max_size=12).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=6), st.lists(_texts, max_size=4))
def test_fuzz_hits_match_brute_force_and_batch_layout(train, bench):
    """The vectorized flat-hash membership count equals a per-doc brute
    force (set intersection over shingle strings), and hashing is
    batch-composition independent — the per-row identity invariant."""
    from code_graph_rag_ray.stages.decontaminate import _flat_hashes

    n = 3

    def shingles(t):
        toks = t.split()
        if len(toks) < n:
            return [t]
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    # batch hashes == concatenation of single-doc hashes (layout-free)
    h_all, off = _flat_hashes(train, n, "fast")
    for i, t in enumerate(train):
        h_one, _ = _flat_hashes([t], n, "fast")
        assert list(h_all[off[i] : off[i + 1]]) == list(h_one)

    bench_sh = {s for t in bench for s in shingles(t)}
    bh, _ = _flat_hashes(bench, n, "fast")
    bh = np.sort(np.unique(bh))
    for i, t in enumerate(train):
        h = h_all[off[i] : off[i + 1]]
        if len(bh):
            idx = np.searchsorted(bh, h)
            got = int(((idx < len(bh)) & (bh[np.minimum(idx, len(bh) - 1)] == h)).sum())
        else:
            got = 0
        want = sum(1 for s in shingles(t) if s in bench_sh)
        assert got == want


def test_benchmark_hashes_sorted_distinct():
    bh = benchmark_ngram_hashes(BENCH, n=4, hash_family="fast")
    assert bh.dtype == np.uint64
    assert (np.diff(bh.astype(np.int64)) > 0).all() or len(bh) <= 1
