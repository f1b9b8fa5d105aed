"""BPE merge learning: equivalence to a reference greedy implementation
(incl. the overlapping-pair 'aaaa' case the encoding trick must get
right), layout invariance, and early stop."""

import re
from collections import Counter

import pyarrow as pa
import ray

from code_graph_rag_ray.stages.bpe import bpe_learn


def _ref_bpe(texts, k):
    wc = Counter()
    for t in texts:
        for w in re.split("[^a-z0-9]+", t.lower()):
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    merges = []
    for step in range(1, k + 1):
        pcnt = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pcnt[(a, b)] += wc[w]
        if not pcnt:
            break
        (l, r), cnt = min(pcnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append({"step": step, "lft": l, "rgt": r, "cnt": cnt})
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _mk(texts, parallelism=4):
    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(parallelism)


TEXTS = [
    "aaaa aaaa banana bandana",  # overlapping (a,a) pairs in one word
    "the cat sat on the mat, the cat ran",
    "Banana BANANA banana!",  # case folding collapses these
    "zz zz zz q",  # short + single-char words
    "",  # empty doc
]


def test_bpe_matches_reference():
    got = bpe_learn(_mk(TEXTS), num_merges=6).to_pylist()
    assert got == _ref_bpe(TEXTS, 6)


def test_bpe_overlap_counts_and_greedy_apply():
    # 'aaaa': (a,a) occurs at 3 adjacent positions; after the merge the
    # greedy left-to-right apply must yield aa|aa (two merges), so the
    # next round sees pair (aa,aa) — the failure mode of a naive
    # single-space replace encoding.
    got = bpe_learn(_mk(["aaaa"]), num_merges=2).to_pylist()
    assert got == [
        {"step": 1, "lft": "a", "rgt": "a", "cnt": 3},
        {"step": 2, "lft": "aa", "rgt": "aa", "cnt": 1},
    ]


def test_bpe_layout_invariant():
    a = bpe_learn(_mk(TEXTS, 1), num_merges=4).to_pylist()
    b = bpe_learn(_mk(list(reversed(TEXTS)) * 1, 7), num_merges=4).to_pylist()
    assert a == b


def test_bpe_early_stop():
    # single-char words only: no adjacent pairs, zero merges
    got = bpe_learn(_mk(["a b c", "d e"]), num_merges=3)
    assert got.num_rows == 0
    assert got.schema.names == ["step", "lft", "rgt", "cnt"]


def _ref_tokenize(texts, merges):
    rules = [(m["lft"], m["rgt"]) for m in merges]
    out = []
    for t in texts:
        nw = nt = 0
        for w in re.split("[^a-z0-9]+", t.lower()):
            if not w:
                continue
            syms = list(w)
            for l, r in rules:
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            nw += 1
            nt += len(syms)
        out.append((nw, nt))
    return out


def _mk_docs(texts, parallelism=4):
    return ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )).repartition(parallelism)


def test_bpe_tokenize_matches_reference():
    from code_graph_rag_ray.stages.bpe import bpe_tokenize

    merges = bpe_learn(_mk(TEXTS), num_merges=4)
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_tokenize(_mk_docs(TEXTS), merges).take_all()}
    exp = dict(enumerate(_ref_tokenize(TEXTS, merges.to_pylist())))
    assert got == exp
    # the empty doc still emits a (0, 0) row
    assert got[4] == (0, 0)


def test_bpe_tokenize_no_merges_counts_chars():
    from code_graph_rag_ray.stages.bpe import bpe_tokenize

    empty = bpe_learn(_mk(["a b"]), num_merges=0)
    got = bpe_tokenize(_mk_docs(["cat dog", ""]), empty).take_all()
    by_id = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in got}
    assert by_id == {0: (2, 6), 1: (0, 0)}


def test_bpe_tokenize_after_merge_exhaustion():
    from code_graph_rag_ray.stages.bpe import bpe_tokenize

    # only ONE merge is learnable; the extra requested steps must be
    # no-ops on both the impl and (per the LEFT JOIN ON TRUE oracle
    # chain) the SQL replay
    merges = bpe_learn(_mk(["ab a b"]), num_merges=3)
    assert merges.num_rows == 1
    got = bpe_tokenize(_mk_docs(["ab a b"]), merges).take_all()
    assert (got[0]["n_words"], got[0]["n_bpe_tokens"]) == (3, 3)
