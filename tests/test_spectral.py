"""Spectral word embeddings (the in-engine learned T5 path): determinism
at any block layout, topic structure, and the actor-pool doc embedder."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.spectral import (
    spectral_doc_embeddings,
    spectral_word_vectors,
)

# two disjoint topics: words inside a topic always co-occur, never across
_TOPIC_A = ["alpha", "beta", "gamma", "delta"]
_TOPIC_B = ["red", "green", "blue", "cyan"]


def _corpus():
    rows = []
    rng = np.random.default_rng(11)
    for i in range(40):
        topic = _TOPIC_A if i % 2 == 0 else _TOPIC_B
        words = list(rng.choice(topic, size=3, replace=False))
        rows.append({"doc_id": i, "text": " ".join(words + ["the"])})
    return rows


def _ds(rows, blocks):
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(blocks)


def test_word_vectors_deterministic_across_layouts():
    rows = _corpus()
    w1, v1 = spectral_word_vectors(_ds(rows, 1), vocab_size=16, dim=4)
    w2, v2 = spectral_word_vectors(_ds(rows, 7), vocab_size=16, dim=4)
    assert w1 == w2
    # distributed accumulation is exact-int; driver QR sees identical
    # inputs, so the full model is bit-identical
    assert np.array_equal(v1, v2)


def test_word_vectors_capture_topics():
    words, vecs = spectral_word_vectors(_ds(_corpus(), 4),
                                        vocab_size=16, dim=2)
    ix = {w: i for i, w in enumerate(words)}
    for t in _TOPIC_A + _TOPIC_B:
        assert t in ix, (t, words)

    def cos(a, b):
        return float(vecs[ix[a]] @ vecs[ix[b]])

    within = [cos(a, b) for t in (_TOPIC_A, _TOPIC_B)
              for a in t for b in t if a < b]
    across = [cos(a, b) for a in _TOPIC_A for b in _TOPIC_B]
    # a LEARNED structure test: same-topic words embed closer than
    # cross-topic ones (the feature-hash embedder cannot do this)
    assert min(within) > max(across), (min(within), max(across))


def test_doc_embeddings_deterministic_and_topic_separated():
    rows = _corpus()
    e1 = {r["doc_id"]: np.asarray(r["embedding"]) for r in
          spectral_doc_embeddings(_ds(rows, 2), vocab_size=16, dim=2,
                                  concurrency=2).take_all()}
    e2 = {r["doc_id"]: np.asarray(r["embedding"]) for r in
          spectral_doc_embeddings(_ds(rows, 5), vocab_size=16, dim=2,
                                  concurrency=2).take_all()}
    assert set(e1) == set(range(40))
    for k in e1:
        assert np.array_equal(e1[k], e2[k]), k
    # same-topic documents are mutually closer than cross-topic ones
    a_docs = [e1[i] for i in range(0, 12, 2)]
    b_docs = [e1[i] for i in range(1, 12, 2)]
    within = min(float(x @ y) for x in a_docs for y in a_docs)
    across = max(float(x @ y) for x in a_docs for y in b_docs)
    assert within > across, (within, across)


def test_empty_corpus_degenerates_cleanly():
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    words, vecs = spectral_word_vectors(empty, vocab_size=8, dim=4)
    assert words == [] and vecs.shape == (0, 4)
