"""Text-analysis operators over document text (training-data pipeline ops).

All stateless, vectorized ``map_batches`` transforms:

- token counting (whitespace + a BPE-ish word/punct regex),
- language-ID (character/stopword n-gram heuristic),
- quality scoring (length / stopword ratio / entity-token ratio),
- document fingerprinting (md5 content hash + 64-bit rolling-window
  min-hash fingerprint).

The scalar-function inventory mirrors SURVEY.md §2.7 (cgr's qn/string/path
helpers + MD5 hashing, ``graph_updater.py:129-141``) re-targeted at web
text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from code_graph_rag_ray.functions.hashing import md5_hex_array
from code_graph_rag_ray.functions.vocab import STOPWORDS_SORTED

_STOP_ARR = pa.array(STOPWORDS_SORTED, pa.string())

# BPE-ish token pattern: word pieces or single punctuation marks
_BPE_PATTERN = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def token_stats_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, n_tokens, n_bpe_tokens, n_chars_text) — fully vectorized."""
    text = batch[text_col]
    ws_tokens = pc.split_pattern(text, pattern=" ")
    n_tokens = pc.list_value_length(ws_tokens)
    n_bpe = pc.count_substring_regex(text, pattern=_BPE_PATTERN)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            "n_chars_text": pc.cast(pc.utf8_length(text), pa.int64()),
        }
    )


def quality_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, n_tokens, stop_ratio, mean_token_len, quality) quality heuristics.

    ``quality`` is a deterministic [0,1] score: penalizes very short docs and
    extreme stopword ratios — the web-text analog of cgr's CodeSmell
    findings tier (M12), kept closed-form so the SQL oracle can mirror it.
    """
    text = batch[text_col]
    toks = pc.split_pattern(text, pattern=" ")
    n = pc.cast(pc.list_value_length(toks), pa.float64())
    flat = pc.list_flatten(toks)
    offsets_counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    is_stop = pc.cast(pc.is_in(flat, value_set=_STOP_ARR), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    row_idx = np.repeat(np.arange(len(offsets_counts)), offsets_counts)
    stops = np.bincount(row_idx, weights=is_stop, minlength=len(offsets_counts))
    n_np = np.maximum(n.to_numpy(zero_copy_only=False), 1.0)
    stop_ratio = stops / n_np
    text_len = pc.cast(pc.utf8_length(text), pa.float64()).to_numpy(zero_copy_only=False)
    # mean token length = (chars - separators) / tokens
    mean_tok = (text_len - (n_np - 1.0)) / n_np
    quality = np.minimum(1.0, n_np / 50.0) * (1.0 - np.abs(stop_ratio - 0.2))
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "mean_token_len": pa.array(mean_tok, pa.float64()),
            "quality": pa.array(quality, pa.float64()),
        }
    )


# --- language ID --------------------------------------------------------

# tiny per-language marker sets (public-knowledge function-word lists)
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset({"the", "and", "of", "to", "a", "in", "is", "that"}),
    "fr": frozenset({"le", "la", "les", "et", "de", "un", "une", "est"}),
    "de": frozenset({"der", "die", "das", "und", "ist", "ein", "eine", "nicht"}),
    "es": frozenset({"el", "la", "los", "y", "de", "un", "una", "es"}),
}


class LangId:
    """Actor-pool language-ID stage (n-gram/function-word heuristic).

    Marker tables are built once per actor in ``__init__`` (stateful-stage
    pattern, SURVEY.md §2.3 T5). CJK detection is char-range based; European
    languages score by function-word hits; ties → 'und' (undetermined).
    """

    def __init__(self):
        self.markers = {k: v for k, v in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        texts = batch["text"].to_pylist()
        out = []
        cjk = re.compile(r"[一-鿿]")
        for t in texts:
            t = t or ""
            if cjk.search(t):
                out.append("zh")
                continue
            words = set(t.casefold().split())
            best, best_hits = "und", 0
            for lang in sorted(self.markers):
                hits = len(words & self.markers[lang])
                if hits > best_hits:
                    best, best_hits = lang, hits
            out.append(best)
        return batch.append_column("lang_pred", pa.array(out, pa.string()))


def repetition_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_frac_max: float = 0.08,
    dup_frac_max: float = 0.85,
) -> pa.Table:
    """Gopher-style repetition quality signals, fully vectorized.

    Per document: whitespace word count, distinct-word count, the top
    unigram's count, and the two repetition fractions Gopher-class corpus
    filters threshold on (duplicate-word fraction and top-1-gram
    fraction). ``repetitive`` flags documents breaching either threshold.

    Each fraction is ONE IEEE-754 int/int division, so values — and the
    boolean flag — are bit-identical to the SQL oracle. A document is one
    input row, so all its words are in-batch: no shuffle anywhere (the
    M12 findings-tier pattern, reference analyzers/ registry, applied to
    corpus curation).
    """
    toks = pc.split_pattern(batch[text_col], pattern=" ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    pairs = pa.table(
        {"row": pc.cast(parent, pa.int64()), "term": flat}
    ).filter(keep)
    n_rows = batch.num_rows
    g = pa.TableGroupBy(pairs, ["row", "term"], use_threads=False).aggregate(
        [([], "count_all")]
    )
    rows = g["row"].to_numpy(zero_copy_only=False)
    cnts = g["count_all"].to_numpy(zero_copy_only=False)
    n_words = np.bincount(rows, weights=cnts, minlength=n_rows).astype(np.int64)
    n_distinct = np.bincount(rows, minlength=n_rows).astype(np.int64)
    top = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(top, rows, cnts)
    denom = np.maximum(n_words, 1).astype(np.float64)
    dup_frac = (n_words - n_distinct) / denom
    top_frac = top / denom
    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "top_term_n": pa.array(top, pa.int64()),
            "dup_word_frac": pa.array(dup_frac, pa.float64()),
            "top_term_frac": pa.array(top_frac, pa.float64()),
            "repetitive": pa.array(
                (top_frac > top_frac_max) | (dup_frac > dup_frac_max), pa.bool_()
            ),
        }
    )


def fingerprint_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, md5, rolling_min_fp): md5 content hash + min rolling-window hash.

    The rolling fingerprint is the minimum of crc32 over all 8-token
    windows — a 1-permutation minhash, stable across runs.
    """
    import zlib

    texts = batch[text_col].to_pylist()
    roll = []
    for t in texts:
        toks = (t or "").split(" ")
        if len(toks) < 8:
            roll.append(zlib.crc32((t or "").encode()))
            continue
        m = min(
            zlib.crc32(" ".join(toks[i : i + 8]).encode()) for i in range(len(toks) - 7)
        )
        roll.append(m)
    return pa.table(
        {
            id_col: batch[id_col],
            "md5": md5_hex_array(batch[text_col]),
            "rolling_min_fp": pa.array(roll, pa.int64()),
        }
    )


def compression_ratio_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text",
    level: int = 6,
) -> pa.Table:
    """Per-document zlib compression size — the classic redundancy /
    quality signal (Gopher-style: highly compressible text is repetitive
    boilerplate; incompressible text is often junk bytes). Integer
    (n_bytes, z_bytes) output; the consumer picks its own ratio cutoffs.
    Deterministic for a fixed zlib level, but NOT SQL-expressible —
    rows-only query, semantics pinned by pytest.
    """
    import zlib

    texts = batch[text_col].to_pylist()
    nb, zb = [], []
    for t in texts:
        raw = (t or "").encode()
        nb.append(len(raw))
        zb.append(len(zlib.compress(raw, level)))
    return pa.table(
        {id_col: batch[id_col],
         "n_bytes": pa.array(nb, pa.int64()),
         "z_bytes": pa.array(zb, pa.int64())}
    )
