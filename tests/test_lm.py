"""Bigram LM scoring vs a brute-force single-process reference (exact)."""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.lm import extract_bigram_tf_batch, lm_score

SCALE = 10**6


def _tok(s: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]


def ref_lm(docs: dict[int, str]) -> dict[int, tuple[int, int]]:
    cb: dict = {}
    ch: dict = {}
    vocab = set()
    bigrams = {}
    for d, t in docs.items():
        ws = _tok(t)
        vocab.update(ws)
        bs = list(zip(ws, ws[1:]))
        bigrams[d] = bs
        for b in bs:
            cb[b] = cb.get(b, 0) + 1
            ch[b[0]] = ch.get(b[0], 0) + 1
    v = len(vocab)
    out = {}
    for d, bs in bigrams.items():
        if not bs:
            continue
        s = sum(((cb[b] + 1) * SCALE) // (ch[b[0]] + v) for b in bs)
        out[d] = (len(bs), s)
    return out


def test_bigram_extraction_bridges_punctuation():
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["Alpha, beta! alpha beta", "solo", ""]})
    t = extract_bigram_tf_batch(b)
    got = {(r["w1"], r["w2"]): r["k"] for r in t.to_pylist()}
    # punctuation between tokens must NOT break the bigram
    assert got == {("alpha", "beta"): 2, ("beta", "alpha"): 1}
    assert set(t["doc_id"].to_pylist()) == {1}


def test_lm_score_matches_bruteforce():
    docs = {
        0: "the cat sat on the mat",
        1: "the cat ran",
        2: "a dog sat on a mat, on the mat!",
        3: "cat",          # no bigram → absent from output
        4: "",             # empty → absent
        5: "the the the the",  # repetition → high likelihood
    }
    ds = rd.from_items(
        [{"doc_id": k, "text": v} for k, v in docs.items()],
        override_num_blocks=4,
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_micro"])
           for r in lm_score(ds).take_all()}
    assert got == ref_lm(docs)
    # predictable text scores higher per bigram than one-off text
    per = {d: s / n for d, (n, s) in got.items()}
    assert per[5] > per[1]
