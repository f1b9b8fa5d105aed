"""Corpus bigram language-model scoring — the perplexity-filter analog.

Large-scale training-data pipelines score documents with an n-gram LM
trained on the corpus itself (CCNet/Gopher-style perplexity filtering). The
reference's closest analog is the findings/quality tier (``analyzers/``,
M12): a corpus-level statistical signal attached per document.

Fixed-point design (the repo's exactness rule): instead of float log-probs
(whose sums are order-dependent and whose ``log`` differs across libm
implementations), the score is the add-one-smoothed bigram likelihood in
micro-units::

    contrib(w1, w2) = ((cb(w1,w2) + 1) * SCALE) // (ch(w1) + V)
    lm_micro(doc)   = Σ contrib over the doc's bigram occurrences

with ``cb`` the corpus bigram count, ``ch`` the corpus history count
(#bigrams starting with w1) and ``V`` the corpus vocabulary size. All
integers → order-free, bit-exact vs the DuckDB oracle at any parallelism.
Higher score = more predictable text (lower pseudo-perplexity).

Scale shape: bigram/history tables are corpus-sized, so training is two
two-phase grouped sums and scoring is two bucketed cogroup joins — nothing
is broadcast or driver-materialized. Tokenization is shared with the tf-idf
stage (one vocabulary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.stages.relational import bucketed_join, partial_groupby_sum
from code_graph_rag_ray.stages.tfidf import _TOKEN_SPLIT, extract_tf_batch

# unit separator: cannot appear in tokens (tokenizer strips non-alnum)
_US = "\x1f"


def extract_bigram_tf_batch(
    b: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(id, w1, w2, k) rows: per-doc bigram counts over the lowercase
    alnum token stream (empties dropped BEFORE adjacency, so punctuation
    does not break a bigram). Fully vectorized."""
    empty = pa.table(
        {id_col: pa.array([], pa.int64()),
         "w1": pa.array([], pa.string()),
         "w2": pa.array([], pa.string()),
         "k": pa.array([], pa.int64())}
    )
    if b.num_rows == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(b[text_col]), pattern=_TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    if len(flat) < 2:
        return empty
    f = np.asarray(flat.to_pandas(), dtype=object)
    p = parent.to_numpy(zero_copy_only=False)
    adj = p[1:] == p[:-1]
    if not adj.any():
        return empty
    pairs = pa.table(
        {
            id_col: pc.take(b[id_col], pa.array(p[:-1][adj], pa.int64())),
            "w1": pa.array(f[:-1][adj], pa.string()),
            "w2": pa.array(f[1:][adj], pa.string()),
        }
    )
    g = pa.TableGroupBy(pairs, [id_col, "w1", "w2"], use_threads=False).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {id_col: g[id_col], "w1": g["w1"], "w2": g["w2"],
         "k": pc.cast(g["count_all"], pa.int64())}
    )


def lm_score(
    docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    scale: int = 10**6,
) -> Dataset:
    """documents → (doc_id, n_bigrams, lm_micro) for every doc with ≥1
    bigram. Train + score in one pipeline: two grouped sums build the
    bigram/history tables, two bucketed joins attach them, one grouped sum
    reduces per doc."""
    big = docs.map_batches(
        lambda b: extract_bigram_tf_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    ).map_batches(
        lambda b: b.append_column(
            "bkey", pc.binary_join_element_wise(b["w1"], b["w2"], _US)
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed 4× (cb, ch, V-independent joins); never re-extract

    cb = partial_groupby_sum(big.select_columns(["bkey", "k"]), ["bkey"], {"k": "cb"})
    ch = partial_groupby_sum(big.select_columns(["w1", "k"]), ["w1"], {"k": "ch"})

    # vocabulary size: distinct unigram tokens (same tokenizer)
    tf = docs.map_batches(
        lambda b: extract_tf_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    vocab = partial_groupby_sum(tf.select_columns(["term", "tf"]), ["term"], {"tf": "n"})
    v = vocab.count()

    # schema hints: cb/ch are lazy groupby outputs and j is a lazy join
    # output — without hints each probe would execute that upstream once
    j = bucketed_join(
        big, cb, on="bkey",
        right_schema=pa.schema([("bkey", pa.string()), ("cb", pa.int64())]),
    )
    j = bucketed_join(
        j, ch, on="w1",
        left_schema=pa.schema(
            [(id_col, pa.int64()), ("w1", pa.string()), ("w2", pa.string()),
             ("k", pa.int64()), ("bkey", pa.string()), ("cb", pa.int64())]
        ),
        right_schema=pa.schema([("w1", pa.string()), ("ch", pa.int64())]),
    )

    def contrib(b: pa.Table, v=v, scale=scale) -> pa.Table:
        df = b.to_pandas() if isinstance(b, pa.Table) else b
        k = df["k"].to_numpy(np.int64)
        cbv = df["cb"].to_numpy(np.int64)
        chv = df["ch"].to_numpy(np.int64)
        c = k * (((cbv + 1) * scale) // (chv + v))
        return pa.table(
            {id_col: pa.array(df[id_col].to_numpy(np.int64)),
             "nb": pa.array(k),
             "c": pa.array(c)}
        )

    per = j.map_batches(contrib, batch_format="pyarrow")
    return partial_groupby_sum(
        per, [id_col], {"nb": "n_bigrams", "c": "lm_micro"}
    )
