"""Paragraph-granularity curation: cross-corpus window dedup + boilerplate.

The web-curation classics (CCNet-style paragraph dedup, boilerplate
detection) operate BELOW document granularity: the unit is a fixed-token
window of the corpus tokenizer (the fixture text has no paragraph breaks,
so "paragraph" = non-overlapping ``window``-token chunk — the same
:func:`~code_graph_rag_ray.stages.packing.chunk_documents` builder the RAG
chunker uses, at ``stride == window``).

Shape: one row-expanding ``map_batches`` (no state) → ONE shuffle of the
window rows keyed by a content-hash bucket (64-ish groups, never a
per-window group — NOTES fact 25) → vectorized pandas inside each bucket.
The window TEXT rides the shuffle so equality decisions are exact and the
DuckDB oracle replays them bit-for-bit; at 10^12-window scale swap the
payload for the 128-bit md5 of the window (hash-only shuffle, text stays
in place) and accept the 2^-64-ish collision odds.

cgr analog: the reference dedups repeated code snippets per module before
embedding (``graph_updater.py:2051-2181`` skip-if-seen); re-targeted as
corpus-wide repeated-window removal / boilerplate scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.functions.hashing import stable_hash_array
from code_graph_rag_ray.stages.packing import chunk_documents


def _windows_bucketed(
    ds: Dataset, *, window: int, id_col: str, text_col: str, num_buckets: int
) -> Dataset:
    w = chunk_documents(
        ds, window=window, stride=window, id_col=id_col, text_col=text_col
    ).select_columns([id_col, "chunk_idx", "chunk_text"])

    def bucketize(b: pa.Table) -> pa.Table:
        bk = (stable_hash_array(b["chunk_text"]) % np.uint64(num_buckets)).astype(
            np.int64
        )
        return b.append_column("__bk", pa.array(bk, pa.int64()))

    return w.map_batches(bucketize, batch_format="pyarrow", batch_size=None)


def _winner_sort(g: pd.DataFrame, id_col: str) -> tuple[pd.DataFrame, np.ndarray]:
    """Shared winner rule: rows ordered (content, id, idx) — id order is
    numeric for int ids, lexicographic for string ids (both deterministic
    and SQL-replayable) — and a first-occurrence mask. The id column's
    dtype is preserved end to end, so string ids (urls) work."""
    g = g.sort_values(["chunk_text", id_col, "chunk_idx"], kind="mergesort")
    return g, (~g["chunk_text"].duplicated()).to_numpy()


def paragraph_dedup(
    ds: Dataset,
    *,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> Dataset:
    """Corpus-wide exact window dedup: every ``window``-token chunk keeps
    ``keep=1`` iff it is the globally FIRST occurrence of its content
    under ``ORDER BY (doc_id, para_idx)`` — the content-determined winner
    rule shared with ``exact_dedup`` (arrival order never decides).

    Returns (id_col, para_idx, keep∈{0,1}); a consumer rebuilds the
    deduplicated corpus by dropping keep=0 windows.
    """

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g, first = _winner_sort(g, id_col)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "para_idx": g["chunk_idx"].to_numpy(np.int64),
                "keep": first.astype(np.int64),
            }
        )

    wb = _windows_bucketed(
        ds, window=window, id_col=id_col, text_col=text_col,
        num_buckets=num_buckets,
    )
    return wb.groupby("__bk").map_groups(flag, batch_format="pandas")


def boilerplate_stats(
    ds: Dataset,
    *,
    window: int = 16,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> Dataset:
    """Per-document boilerplate counts: of a doc's ``window``-token
    chunks, how many have content shared by ≥ ``min_docs`` DISTINCT
    documents corpus-wide (navigation/footer-style repetition).

    Returns (id_col, n_paras, n_boiler) — integer counts so the consumer
    picks its own fraction cutoff and the oracle stays bit-exact. Each
    window row lands in exactly one content bucket, so per-bucket partial
    counts sum to the global answer (two-phase; the final groupby sees
    O(docs × buckets-touched) rows).
    """

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("chunk_text")[id_col].transform("nunique")
        boiler = (nd.to_numpy() >= min_docs).astype(np.int64)
        out = (
            g.assign(__b=boiler)
            .groupby(id_col, as_index=False)
            .agg(np_p=("chunk_text", "size"), nb_p=("__b", "sum"))
        )
        return pd.DataFrame(
            {
                id_col: out[id_col].to_numpy(),
                "np_p": out["np_p"].to_numpy(np.int64),
                "nb_p": out["nb_p"].to_numpy(np.int64),
            }
        )

    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    wb = _windows_bucketed(
        ds, window=window, id_col=id_col, text_col=text_col,
        num_buckets=num_buckets,
    )
    parts = wb.groupby("__bk").map_groups(partial, batch_format="pandas")
    return partial_groupby_sum(
        parts, [id_col], {"np_p": "n_paras", "nb_p": "n_boiler"}
    )


def paragraph_dedup_apply(
    ds: Dataset,
    *,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> Dataset:
    """The APPLY step of paragraph dedup: rebuild each document from only
    its globally-first-occurrence windows (drop repeated content, keep
    original window order) — the corpus a curation pipeline actually
    writes out.

    Two bucketed exchanges, both vectorized: (1) the same content-hash
    bucket shuffle as :func:`paragraph_dedup`, now carrying the window
    text forward with its keep flag; (2) a doc-hash bucket shuffle that
    reassembles surviving windows per document (one pandas sort +
    group-join per bucket — never one task per document, NOTES fact 25).
    Documents whose every window was a duplicate vanish from the output,
    exactly like the SQL ``WHERE keep GROUP BY doc`` replay.
    """
    from code_graph_rag_ray.functions.hashing import partition_ids

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g, first = _winner_sort(g, id_col)
        out = g[first]
        return pd.DataFrame(
            {
                id_col: out[id_col].to_numpy(),
                "para_idx": out["chunk_idx"].to_numpy(np.int64),
                "para": out["chunk_text"].to_numpy(object),
            }
        )

    wb = _windows_bucketed(
        ds, window=window, id_col=id_col, text_col=text_col,
        num_buckets=num_buckets,
    )
    kept = wb.groupby("__bk").map_groups(flag, batch_format="pandas")

    def doc_bucket(b: pa.Table) -> pa.Table:
        bk = partition_ids(pc.cast(b[id_col], pa.string()), num_buckets)
        return b.append_column("__db", pa.array(bk, pa.int32()))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "para_idx"], kind="mergesort")
        agg = g.groupby(id_col, as_index=False).agg(
            clean_text=("para", " ".join), n_kept=("para", "size")
        )
        return pd.DataFrame(
            {
                id_col: agg[id_col].to_numpy(),
                "clean_text": agg["clean_text"].to_numpy(object),
                "n_kept": agg["n_kept"].to_numpy(np.int64),
            }
        )

    return (
        kept.map_batches(doc_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("__db")
        .map_groups(rebuild, batch_format="pandas")
    )
