"""Distributed BPE merge learning — tokenizer training over the corpus.

Byte-pair-encoding training (Sennrich et al. 2016, public) reduced to its
data-parallel core: learn the top ``num_merges`` merge rules from corpus
word frequencies. The classic observation makes this cheap at any corpus
size: BPE trains on the DISTINCT-WORD frequency table, not the token
stream, so after one corpus pass the working set is vocabulary-scale.

Plan shape (100 TB-safe):

1. WORD COUNTS — one streaming pass over the corpus: the shared
   ``[^a-z0-9]+`` lowercase split (identical to DuckDB's
   ``regexp_split_to_array``), batch-local ``TableGroupBy`` combine, one
   grouped sum over the partials (``partial_groupby_sum``). Result is the
   vocabulary dataset (word, wc), materialized ONCE — every later pass
   runs over it, never over the corpus again.
2. PER MERGE (× ``num_merges``, each a vocabulary-scale streaming pass):
   vectorized adjacent-pair extraction (Arrow list offsets drive the
   adjacency mask — no Python loop over words or symbols), batch-local
   (lft, rgt) pair-count combine, grouped sum over partials, then a
   per-block argmax fold so only O(blocks) candidate rows ever reach the
   driver. The winning pair — max count, then lexicographically smallest
   (lft, rgt); both sides compare binary codepoints — is applied with one
   vectorized non-regex ``replace_substring`` and the vocabulary is
   re-materialized (vocab-scale, K times).

Symbol-string encoding (what makes the apply step both vectorizable and
SQL-replayable): a word's symbol sequence is rendered as
``' ' + '  '.join(symbols) + ' '`` — ONE space at the ends, TWO between
symbols. Merging (L, R) is then the plain string replace
``' L  R ' → ' LR '``: each match consumes one space from each flanking
double separator, so two merges sharing a boundary symbol stay
independently matchable, and left-to-right non-overlapping replace (both
pyarrow ``replace_substring`` and SQL ``replace``) reproduces BPE's
greedy left-to-right merge application exactly — ``'aaaa'`` with merge
(a, a) becomes ``'aa aa'``, not one merge. Symbols are alnum-only so a
pattern can never match across a symbol boundary. Pair counting counts
adjacent POSITIONS (``'aaa'`` contributes (a, a) twice), the standard
convention, identical on both sides via the unnest/generate_series
adjacency in the oracle.

Driver state is the merge list only (``num_merges`` rows); no stage ever
materializes corpus-scale data. cgr analog: the reference counts name
tokens to build its registry tries (`graph_updater.py` qualified-name
minting); this is the subword-vocabulary counterpart a training-data
pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_TOKEN_SPLIT = "[^a-z0-9]+"


def _sym_encode(words: pa.Array | pa.ChunkedArray) -> pa.Array:
    """word → ``' c  h  a  r '`` symbol string (chars are ASCII alnum by
    construction of the tokenizer split). RE2 rewrite, same expression as
    the oracle's ``regexp_replace(word, '(.)', ' \\1 ', 'g')``."""
    out = pc.replace_substring_regex(words, pattern="(.)", replacement=r" \1 ")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _adjacent_pairs(
    syms: pa.Array | pa.ChunkedArray, wc: np.ndarray
) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """(lft, rgt, weight) for every adjacent symbol position, fully
    vectorized: split the symbol strings, then list offsets + a shifted
    parent-equality mask give the in-word adjacency."""
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    toks = pc.split_pattern(pc.utf8_trim_whitespace(syms), pattern="  ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n = len(flat)
    if n < 2:
        e = pa.array([], pa.string())
        return e, e, np.empty(0, dtype=np.int64)
    adj = parent[:-1] == parent[1:]
    if not adj.any():
        e = pa.array([], pa.string())
        return e, e, np.empty(0, dtype=np.int64)
    mask = pa.array(adj)
    lft = flat.slice(0, n - 1).filter(mask)
    rgt = flat.slice(1, n - 1).filter(mask)
    w = wc[parent[:-1][adj]]
    return lft, rgt, w


def word_counts(
    ds: Dataset, *, text_col: str = "text", token_split: str = _TOKEN_SPLIT
) -> Dataset:
    """Corpus-wide (word, wc) frequency table — one streaming pass,
    batch-local combine, grouped sum over partials."""
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.array([], pa.string()),
                          "wc": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b[text_col].combine_chunks()
                          if isinstance(b[text_col], pa.ChunkedArray)
                          else b[text_col]),
            pattern=token_split,
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return empty
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "wc": pc.cast(vc.field("counts"), pa.int64())})

    return partial_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["word"], {"wc": "wc"}
    )


def bpe_learn(
    ds: Dataset,
    *,
    text_col: str = "text",
    num_merges: int = 6,
    token_split: str = _TOKEN_SPLIT,
) -> pa.Table:
    """Learn ``num_merges`` BPE merge rules from the corpus; returns the
    tiny (step, lft, rgt, cnt) merge table (cnt = the pair's weighted
    adjacent-position count at selection time). Stops early if the
    vocabulary runs out of adjacent pairs."""
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    def add_sym(b: pa.Table) -> pa.Table:
        return pa.table({"word": b["word"], "wc": b["wc"],
                         "sym": _sym_encode(b["word"])})

    vocab = word_counts(ds, text_col=text_col, token_split=token_split)
    vocab = vocab.map_batches(add_sym, batch_format="pyarrow").materialize()

    def pair_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"lft": pa.array([], pa.string()),
                          "rgt": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        wc = b["wc"].to_numpy(zero_copy_only=False).astype(np.int64)
        lft, rgt, w = _adjacent_pairs(b["sym"], wc)
        if len(w) == 0:
            return empty
        t = pa.table({"lft": lft, "rgt": rgt, "cnt": pa.array(w, pa.int64())})
        return pa.TableGroupBy(t, ["lft", "rgt"], use_threads=False).aggregate(
            [("cnt", "sum")]
        ).rename_columns(["lft", "rgt", "cnt"])

    def block_best(b: pa.Table) -> pa.Table:
        # one candidate row per block: max cnt, then smallest (lft, rgt)
        empty = pa.table({"lft": pa.array([], pa.string()),
                          "rgt": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        cnt = b["cnt"].to_numpy(zero_copy_only=False)
        at = np.flatnonzero(cnt == cnt.max())
        if len(at) > 1:
            ls = b["lft"].take(pa.array(at)).to_pylist()
            rs = b["rgt"].take(pa.array(at)).to_pylist()
            at = [at[min(range(len(at)), key=lambda i: (ls[i], rs[i]))]]
        return b.take(pa.array(at[:1]))

    steps: list[dict] = []
    for step in range(1, num_merges + 1):
        pairs = partial_groupby_sum(
            vocab.map_batches(pair_partial, batch_format="pyarrow"),
            ["lft", "rgt"], {"cnt": "cnt"},
        )
        cand = pairs.map_batches(block_best, batch_format="pyarrow").take_all()
        if not cand:
            break
        best = min(cand, key=lambda r: (-r["cnt"], r["lft"], r["rgt"]))
        steps.append({"step": step, "lft": best["lft"], "rgt": best["rgt"],
                      "cnt": int(best["cnt"])})
        pat = f" {best['lft']}  {best['rgt']} "
        rep = f" {best['lft']}{best['rgt']} "

        def apply(b: pa.Table, pat=pat, rep=rep) -> pa.Table:
            return pa.table(
                {"word": b["word"], "wc": b["wc"],
                 "sym": pc.replace_substring(b["sym"], pattern=pat,
                                             replacement=rep)}
            )

        old = vocab
        vocab = vocab.map_batches(apply, batch_format="pyarrow").materialize()
        del old

    return pa.table(
        {"step": pa.array([s["step"] for s in steps], pa.int64()),
         "lft": pa.array([s["lft"] for s in steps], pa.string()),
         "rgt": pa.array([s["rgt"] for s in steps], pa.string()),
         "cnt": pa.array([s["cnt"] for s in steps], pa.int64())}
    )


def bpe_tokenize(
    ds: Dataset,
    merges: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_split: str = _TOKEN_SPLIT,
) -> Dataset:
    """Apply learned merge rules to the corpus — the train→apply other
    half of :func:`bpe_learn`. Returns (id, n_words, n_bpe_tokens) per
    document: the corpus token-count table a packing/budgeting stage
    consumes.

    Scale shape: STATELESS one-pass map — the merge list (``num_merges``
    rows) rides the task closure, each batch sym-encodes its words and
    applies the K vectorized non-regex replaces in learned order (the
    same greedy left-to-right semantics as training, see module
    docstring), then counts symbols per word via one ``count_substring``
    and folds per document with list-offset arithmetic. No join, no
    vocabulary broadcast, no shuffle — tokenizing 10^12 documents
    streams. Documents with zero words emit (id, 0, 0).
    """
    rules = list(zip(merges["lft"].to_pylist(), merges["rgt"].to_pylist()))

    def tok(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], b[id_col].type),
                 "n_words": pa.array([], pa.int64()),
                 "n_bpe_tokens": pa.array([], pa.int64())}
            )
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b[text_col].combine_chunks()
                          if isinstance(b[text_col], pa.ChunkedArray)
                          else b[text_col]),
            pattern=token_split,
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        nw = np.zeros(b.num_rows, np.int64)
        nt = np.zeros(b.num_rows, np.int64)
        if len(flat):
            sym = _sym_encode(flat)
            for lft, rgt in rules:
                sym = pc.replace_substring(
                    sym, pattern=f" {lft}  {rgt} ", replacement=f" {lft}{rgt} ")
            ns = pc.add(pc.count_substring(sym, "  "), 1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            np.add.at(nw, parent, 1)
            np.add.at(nt, parent, ns)
        return pa.table(
            {id_col: b[id_col], "n_words": pa.array(nw),
             "n_bpe_tokens": pa.array(nt)}
        )

    return ds.map_batches(tok, batch_format="pyarrow")
