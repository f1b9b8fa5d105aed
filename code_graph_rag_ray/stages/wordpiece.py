"""MaxMatch (WordPiece-style) subword tokenizer — vocab mining + greedy
longest-match tokenization.

Completes the tokenizer family next to BPE (`stages/bpe.py`): BPE learns
MERGE RULES and applies them in order; this stage mines a PIECE VOCABULARY
(frequency-thresholded substrings, the statistics WordPiece/unigram-LM
trainers start from) and tokenizes by greedy longest-match-first — the
exact inference rule of WordPiece (Wu et al. 2016 §4.1 "greedy
longest-match-first"), with single characters as the universal fallback.
Reference analog: none (the reference tokenizes code via tree-sitter); this
is a training-data-pipeline operator like the BPE pair
(SURVEY.md §2 "beyond the reference").

Determinism/oracle story: the vocab rule is pure counting — a piece is
every substring of length 2..lmax of every distinct word, weighted by word
frequency and counted per OCCURRENCE POSITION ("aaa" contributes "aa"
twice); keep pieces with total freq ≥ min_freq, then the top_k by
(freq DESC, piece ASC). Greedy tokenization is a deterministic walk. Both
are replayed bit-exactly by DuckDB: the vocab via a substring unnest, the
walk via a recursive CTE whose step advances by the longest matching piece
(see `pipelines/catalog.py` CORPUS_WORDPIECE_*_SQL).

Scale shape (10^12 docs):

- Vocab mining: one streaming corpus pass builds the distinct-word
  frequency table (`bpe.word_counts` — batch-local combine + grouped sum);
  substring explosion runs VECTORIZED over distinct words (flat byte
  buffer + strided window gather + fixed-width bytes view — zero Python
  per word), partials grouped-sum into the piece table, and the top-k is
  the local-topk → single-block finish (`relational.top_k` shape, no
  full sort, no sort().limit()).
- Tokenization: STATELESS one-pass map. The final vocab is ≤ top_k rows
  (a few KB) and rides the task closure like BPE's merge rules — no
  broadcast object, no join, no shuffle. Per batch, the greedy walk runs
  once per batch-DISTINCT word (dictionary-encode first; O(batch vocab ×
  word length), the same unique-tokens discipline as the dedup hash
  family) and an int gather fans results back to tokens, then per-doc
  sums fold via one scatter-add.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.stages.tfidf import _TOKEN_SPLIT


def _substring_partials(words: pa.Array, wc: np.ndarray, lmax: int,
                        lmin: int = 2) -> pa.Table:
    """(piece, freq) partials for one block of (distinct word, count) rows:
    every length-lmin..lmax substring occurrence, weighted by word count.
    Vectorized: flat ascii buffer + window index matrix + bytes view.
    ``lmin=1`` adds single characters (the unigram-LM coverage set)."""
    ws = words.to_numpy(zero_copy_only=False)
    lens = np.asarray([len(w) for w in ws], dtype=np.int64)
    buf = np.frombuffer("".join(ws).encode("utf-8"), np.uint8)
    if len(buf) != int(lens.sum()):
        # non-ASCII word (custom token_split): byte offsets ≠ char offsets,
        # so the strided-window view is invalid — per-word fallback over
        # the (vocab-scale) distinct-word block, same output contract
        piece_l: list[str] = []
        freq_l: list[int] = []
        for w, c in zip(ws, wc):
            for l in range(lmin, lmax + 1):
                for i in range(len(w) - l + 1):
                    piece_l.append(w[i : i + l])
                    freq_l.append(int(c))
        return pa.table({"piece": pa.array(piece_l, pa.string()),
                         "freq": pa.array(freq_l, pa.int64())})
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pieces: list[pa.Array] = []
    freqs: list[np.ndarray] = []
    for l in range(lmin, lmax + 1):
        nwin = lens - l + 1
        nwin = np.where(nwin > 0, nwin, 0)
        total = int(nwin.sum())
        if total == 0:
            continue
        word_of = np.repeat(np.arange(len(ws)), nwin)
        pos = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(nwin)))[:-1], nwin
        )
        idx = (starts[word_of] + pos)[:, None] + np.arange(l)[None, :]
        win = np.ascontiguousarray(buf[idx]).view(f"S{l}").ravel()
        pieces.append(pa.array(win.astype(f"U{l}"), pa.string()))
        freqs.append(wc[word_of])
    if not pieces:
        return pa.table({"piece": pa.array([], pa.string()),
                         "freq": pa.array([], pa.int64())})
    return pa.table({
        "piece": pa.concat_arrays(pieces),
        "freq": pa.array(np.concatenate(freqs), pa.int64()),
    })


def wordpiece_vocab(
    ds: Dataset,
    *,
    text_col: str = "text",
    lmax: int = 5,
    min_freq: int = 5,
    top_k: int = 256,
    token_split: str = _TOKEN_SPLIT,
) -> Dataset:
    """Mine the piece vocabulary: (piece, freq), the top_k pieces with
    freq ≥ min_freq ordered by (freq DESC, piece ASC)."""
    from code_graph_rag_ray.stages.bpe import word_counts
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    wc = word_counts(ds, text_col=text_col, token_split=token_split)

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"piece": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64())})
        return _substring_partials(
            b["word"].combine_chunks()
            if isinstance(b["word"], pa.ChunkedArray) else b["word"],
            b["wc"].to_numpy(zero_copy_only=False).astype(np.int64),
            lmax,
        )

    piece_freq = partial_groupby_sum(
        wc.map_batches(explode, batch_format="pyarrow"),
        ["piece"], {"freq": "freq"},
    )

    def local_topk(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["freq"], min_freq))
        idx = pc.sort_indices(
            b, sort_keys=[("freq", "descending"), ("piece", "ascending")]
        )[:top_k]
        return b.take(idx)

    # local-topk → one block → exact topk: the relational.top_k shape
    # with a composite (freq DESC, piece ASC) deterministic tie-break.
    return (
        piece_freq.map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_topk, batch_format="pyarrow", batch_size=None)
    )


def _greedy_counts(word: str, by_len: dict[int, set], lmax: int) -> tuple[int, int]:
    """(n_tokens, n_fallback) of the greedy longest-match-first walk."""
    n = len(word)
    pos = 0
    ntok = 0
    nfb = 0
    while pos < n:
        adv = 1
        for l in range(min(lmax, n - pos), 1, -1):
            s = by_len.get(l)
            if s is not None and word[pos : pos + l] in s:
                adv = l
                break
        if adv == 1:
            nfb += 1
        ntok += 1
        pos += adv
    return ntok, nfb


def wordpiece_tokenize(
    ds: Dataset,
    vocab: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lmax: int = 5,
    token_split: str = _TOKEN_SPLIT,
) -> Dataset:
    """Greedy longest-match tokenization against a mined vocabulary.

    Returns (id, n_words, n_wp_tokens, n_fallback) per document —
    n_fallback counts single-character fallback emissions (the OOV-mass
    signal). The walk runs once per batch-DISTINCT word; see module
    docstring for the scale shape."""
    pieces = vocab["piece"].to_pylist()
    by_len: dict[int, set] = {}
    for p in pieces:
        by_len.setdefault(len(p), set()).add(p)

    def tok(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], b[id_col].type),
             "n_words": pa.array([], pa.int64()),
             "n_wp_tokens": pa.array([], pa.int64()),
             "n_fallback": pa.array([], pa.int64())}
        )
        if b.num_rows == 0:
            return empty
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
        nf = np.zeros(b.num_rows, np.int64)
        if len(flat):
            d = pc.dictionary_encode(flat)
            uniq = d.dictionary.to_pylist()
            per = np.asarray([_greedy_counts(w, by_len, lmax) for w in uniq],
                             dtype=np.int64)
            gi = d.indices.to_numpy(zero_copy_only=False)
            np.add.at(nw, parent, 1)
            np.add.at(nt, parent, per[gi, 0])
            np.add.at(nf, parent, per[gi, 1])
        return pa.table(
            {id_col: b[id_col], "n_words": pa.array(nw),
             "n_wp_tokens": pa.array(nt), "n_fallback": pa.array(nf)}
        )

    return ds.map_batches(tok, batch_format="pyarrow")
