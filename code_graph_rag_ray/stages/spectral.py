"""Spectral word embeddings learned IN-ENGINE — the executing T5 path.

The reference's embedding pass loads a pretrained model per process and
batch-encodes snippets (``graph_updater.py:2051-2181``); this container has
no ML library, so the import-gated ``SentenceModelEmbedder`` can never run
here. This module trains a REAL model with numpy only: truncated spectral
factorization of the corpus PPMI word-co-occurrence matrix — the classic
result that skip-gram/SGNS implicitly factorizes shifted PMI (Levy &
Goldberg 2014, NeurIPS, public), computed as distributed subspace/power
iteration.

Training plan (all distributed state bounded by vocab × dim, NEVER corpus):

1. **vocab** — top-``vocab_size`` terms by document frequency (two-phase
   grouped count + top-k); the word→index map broadcasts.
2. **PPMI edges** — within-document distinct-pair co-occurrence with the
   integer lift of ``stages/cooccur`` (lift_fp = c_ab·N·10^6 / (c_a·c_b));
   the edge weight is the INTEGER base-2 PPMI ``max(0,
   bit_length(lift_fp) − bit_length(10^6))`` — exact in numpy and SQL
   (`bit_count` smearing, NOTES fact 17), no libm log.
3. **subspace iteration** — Q (vocab × dim) starts from a pure
   content-hash init (md5 of "word|dim", no RNG); each round computes
   M·Q with EXACT int64 arithmetic (edge blocks accumulate
   ``w · Q_fp[j]`` into dense per-block partials, a two-phase grouped sum
   folds them — addition order can't matter in exact ints), then the
   driver orthonormalizes the (vocab × dim) result and RE-QUANTIZES to
   the 2^14 fixed-point lattice. QR sign is fixed per column
   (largest-|x| entry positive), so the only platform dependence is
   LAPACK's QR on identical inputs — the documented-float step; the
   distributed 99% of the compute is bit-exact at any parallelism.
4. **doc embeddings** — an actor-pool stage sums each document's in-vocab
   word vectors in int64 (exact, layout-invariant) and L2-normalizes.

Scale shape: vocab_size × dim ints broadcast once per round (ray.put);
the per-round exchange is O(blocks × vocab) dense partial rows; the edge
table streams. At 100 TB the co-occurrence pass dominates — the same cost
every word2vec run pays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.stages.tfidf import _TOKEN_SPLIT

_Q_BITS = 14  # fixed-point lattice for the broadcast factor matrix


def _doc_terms(b: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(id, term) distinct pairs per document — the tfidf tokenizer
    convention (lowered, [^a-z0-9]+ split, empties dropped)."""
    empty = pa.table({id_col: pa.array([], b.schema.field(id_col).type),
                      "term": pa.array([], pa.string())})
    if b.num_rows == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(b[text_col]),
                                  pattern=_TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    pairs = pa.table({id_col: pc.take(b[id_col], parent), "term": flat})
    pairs = pairs.filter(pc.not_equal(pairs["term"], ""))
    if pairs.num_rows == 0:
        return empty
    g = pa.TableGroupBy(pairs, [id_col, "term"], use_threads=False).aggregate([])
    return g.rename_columns([id_col, "term"])


def _hash_init(words: list[str], dim: int) -> np.ndarray:
    """Deterministic content-hash init: Q0[i, d] from md5("word|d") —
    a pure function of the vocabulary, no RNG, no arrival order."""
    from code_graph_rag_ray.functions.hashing import md5_low32_array

    cols = []
    for d in range(dim):
        h = md5_low32_array(
            pa.array([f"{w}|{d}" for w in words], pa.string())
        ).astype(np.int64)
        cols.append((h % 8191) - 4095)  # centered, small
    return np.stack(cols, axis=1).astype(np.int64)


def spectral_word_vectors(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 256,
    dim: int = 16,
    iters: int = 3,
) -> tuple[list[str], np.ndarray]:
    """Train (words, vectors): vectors is a float64 (vocab × dim) matrix
    of L2-normalized spectral word embeddings. Deterministic given the
    corpus (content-hash init, exact-int distributed accumulation,
    sign-fixed QR) — two runs at any block layout agree to the float64
    image of identical integers."""
    import ray

    from code_graph_rag_ray.functions.broadcast import get_broadcast
    from code_graph_rag_ray.stages.cooccur import entity_cooccurrence
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    dt = docs.map_batches(
        lambda b: _doc_terms(b, id_col, text_col), batch_format="pyarrow"
    ).materialize()  # feeds vocab AND co-occurrence; build once

    # 1. vocabulary: top-V by document frequency, ties by term ASC —
    # the tiebreak makes the vocabulary (and so the whole model) a pure
    # function of the corpus, independent of block layout
    df = partial_groupby_sum(dt.select_columns(["term"]), ["term"], {},
                             count_alias="df")

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        dfv = b["df"].to_numpy(zero_copy_only=False)
        terms = np.asarray(b["term"].to_pylist(), dtype=object)
        order = np.lexsort((terms, -dfv))[:vocab_size]
        return b.take(pa.array(order, pa.int64()))

    vocab_rows = (
        df.map_batches(local_top, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_top, batch_format="pyarrow", batch_size=None)
    ).take_all()
    vocab_rows.sort(key=lambda r: (-r["df"], r["term"]))
    words = [r["term"] for r in vocab_rows[:vocab_size]]
    w_index = {w: i for i, w in enumerate(words)}
    V = len(words)
    if V == 0:
        return [], np.zeros((0, dim), np.float64)
    dim = min(dim, V)  # QR factor can't be wider than the vocabulary

    # 2. integer-PPMI co-occurrence edges over the vocab terms only
    vocab_arr = pa.array(words, pa.string())

    def in_vocab(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["term"], value_set=vocab_arr))

    mentions = dt.map_batches(in_vocab, batch_format="pyarrow")
    lift = entity_cooccurrence(mentions, doc_col=id_col, ent_col="term")

    idx_ref = ray.put(w_index)
    million_bits = int(10**6).bit_length()  # 20

    def to_edges(b: pa.Table) -> pa.Table:
        m = get_broadcast(idx_ref)
        if b.num_rows == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        ia = np.array([m[x] for x in b["a"].to_pylist()], np.int64)
        ja = np.array([m[x] for x in b["b"].to_pylist()], np.int64)
        lf = b["lift_fp"].to_numpy(zero_copy_only=False).astype(np.int64)
        # integer base-2 PPMI: bit_length(lift_fp) − bit_length(10^6), ≥ 0
        w = np.array([v.bit_length() for v in lf.tolist()], np.int64)
        w = np.maximum(w - million_bits, 0)
        keep = w > 0
        ia, ja, w = ia[keep], ja[keep], w[keep]
        # symmetric: emit both directions
        return pa.table({"i": pa.array(np.concatenate([ia, ja])),
                         "j": pa.array(np.concatenate([ja, ia])),
                         "w": pa.array(np.concatenate([w, w]))})

    edges = lift.map_batches(to_edges, batch_format="pyarrow").materialize()

    # 3. distributed subspace iteration
    q_fp = _hash_init(words, dim)
    sum_cols = {f"c{d}": f"c{d}" for d in range(dim)}

    for _ in range(iters):
        q_ref = ray.put(q_fp)

        def partial_mq(b: pa.Table, _qr=q_ref) -> pa.Table:
            q = get_broadcast(_qr)
            acc = np.zeros((V, q.shape[1]), np.int64)
            if b.num_rows:
                i = b["i"].to_numpy(zero_copy_only=False)
                j = b["j"].to_numpy(zero_copy_only=False)
                w = b["w"].to_numpy(zero_copy_only=False)
                np.add.at(acc, i, w[:, None] * q[j])
            used = np.flatnonzero(acc.any(axis=1))
            cols = {"i": pa.array(used, pa.int64())}
            for d in range(q.shape[1]):
                cols[f"c{d}"] = pa.array(acc[used, d])
            return pa.table(cols)

        rows = partial_groupby_sum(
            edges.map_batches(partial_mq, batch_format="pyarrow"),
            ["i"], sum_cols,
        ).take_all()  # ≤ V rows — model-scale, not corpus-scale
        mq = np.zeros((V, dim), np.float64)
        for r in rows:
            mq[r["i"]] = [r[f"c{d}"] for d in range(dim)]
        if not mq.any():
            break
        q_f, _ = np.linalg.qr(mq)
        # column sign fix: largest-|x| entry positive (deterministic QR)
        for d in range(q_f.shape[1]):
            col = q_f[:, d]
            if col[np.argmax(np.abs(col))] < 0:
                q_f[:, d] = -col
        q_fp = np.round(q_f * (1 << _Q_BITS)).astype(np.int64)

    vecs = q_fp.astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return words, vecs / norms


class SpectralDocEmbedder:
    """Actor-pool stage: (id, text) → (id, embedding) using LEARNED word
    vectors — the in-engine analog of the reference's model actor (T5).
    The (word→row, int-matrix) state rehydrates from the object store once
    per actor in ``__init__``; ``__call__`` sums each document's in-vocab
    word vectors in exact int64 (layout-invariant) and L2-normalizes."""

    def __init__(self, model_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        from code_graph_rag_ray.functions.broadcast import get_broadcast

        words, q_fp = get_broadcast(model_ref)
        self.vocab_arr = pa.array(list(words), pa.string())
        self.q_fp = q_fp
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        n = b.num_rows
        dim = self.q_fp.shape[1] if self.q_fp.size else 0
        acc = np.zeros((n, dim), np.int64)
        if n and dim:
            toks = pc.split_pattern_regex(pc.utf8_lower(b[self.text_col]),
                                          pattern=_TOKEN_SPLIT)
            flat = pc.list_flatten(toks)
            parent = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False)
            # vectorized vocab lookup: index_in gives vocab row or null
            wi = pc.index_in(flat, value_set=self.vocab_arr)
            hit = pc.is_valid(wi).to_numpy(zero_copy_only=False)
            if hit.any():
                wi_np = wi.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
                np.add.at(acc, parent[hit], self.q_fp[wi_np])
        mat = acc.astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat /= norms
        return pa.table(
            {self.id_col: b[self.id_col],
             "embedding": pa.array(list(mat.astype(np.float32)),
                                   pa.list_(pa.float32()))})


def spectral_doc_embeddings(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 256,
    dim: int = 16,
    iters: int = 3,
    concurrency: int = 2,
    batch_size: int | None = 256,
) -> Dataset:
    """Train spectral word vectors on ``docs``, then embed every document
    with the learned model via the actor pool — train + inference, both
    in-engine, no external weights. Output: (id, embedding float32[dim]),
    the contract every downstream kNN / near-dup operator consumes."""
    import ray

    words, vecs = spectral_word_vectors(
        docs, id_col=id_col, text_col=text_col,
        vocab_size=vocab_size, dim=dim, iters=iters)
    q_fp = np.round(vecs * (1 << _Q_BITS)).astype(np.int64)
    model_ref = ray.put((words, q_fp))
    return docs.map_batches(
        SpectralDocEmbedder,
        fn_constructor_args=(model_ref, id_col, text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
