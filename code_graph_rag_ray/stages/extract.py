"""Per-record extraction stages (the reference's Pass 2 analog).

Embarrassingly parallel ``map_batches`` transforms — one output row set per
input document, no cross-document state (mirrors cgr's per-file loop,
``graph_updater.py:1742-1764`` / ``_process_single_file:1841-1882``). All
hot-path work is Arrow / numpy kernels; no Python-per-row loops.

Stages:
- :func:`extract_text_batch` — pages(html) → pages(text) with error
  side-channel; drops the wide ``html`` column immediately (project early —
  SURVEY.md §7 "wide binary rows").
- :func:`doc_mentions_batch` / :func:`doc_triples_batch` — closed-vocabulary
  mention & trigram-triple extraction over ``documents``-shaped text, the
  SQL-oracle-checkable analog of cgr's function/class/import ingest
  (``parsers/function_ingest.py:259-464``, ``import_processor.py:765-847``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from code_graph_rag_ray.functions.html import decode_html_binary, extract_text_array
from code_graph_rag_ray.functions.vocab import (
    ENTITY_VOCAB_SORTED,
    RELATION_VOCAB_SORTED,
)

_ENT_ARR = pa.array(ENTITY_VOCAB_SORTED, pa.string())
_REL_ARR = pa.array(RELATION_VOCAB_SORTED, pa.string())


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, …) → (url, warc_ts, text, lang, error).

    Deterministic per row (byte-identical text per url across runs and
    parallelism levels); one bad row records an ``error`` and flows on
    instead of failing the task (cgr's per-file skip-and-log,
    ``definition_processor.py:447-449``).
    """
    decoded, errors = decode_html_binary(batch["html"])
    text = extract_text_array(decoded)
    cols = {
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "text": text,
        "lang": batch["lang"],
        "error": errors,
    }
    return pa.table(cols)


def _tokenize(text: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Split on single spaces → (flat tokens, token→row index, row offsets).

    Returns the flattened token array plus, per token, the index of the row
    it came from — the boundary-aware layout the trigram scan needs.
    """
    toks = pc.split_pattern(text, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    offsets = np.asarray(toks.offsets)
    counts = np.diff(offsets)
    row_idx = np.repeat(np.arange(len(counts)), counts)
    return flat, row_idx, offsets


def doc_mentions_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """documents(doc_id, text) → (doc_id, surface, n_mentions).

    Closed-vocabulary mention detection, aggregated per (doc, surface)
    inside the batch — a partial aggregate, so the downstream groupby (if
    any) shuffles far fewer rows than one-per-token.
    """
    flat, row_idx, _ = _tokenize(batch["text"])
    is_ent = pc.is_in(flat, value_set=_ENT_ARR).to_numpy(zero_copy_only=False)
    sel = np.flatnonzero(is_ent)
    surfaces = pc.take(flat, pa.array(sel, pa.int64()))
    ids = pc.take(batch[id_col], pa.array(row_idx[sel], pa.int64()))
    t = pa.table({id_col: ids, "surface": surfaces})
    # within-batch partial aggregate (vectorized Arrow group-by)
    return pa.TableGroupBy(t, [id_col, "surface"]).aggregate([([], "count_all")]).rename_columns(
        [id_col, "surface", "n_mentions"]
    )


def doc_triples_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """documents(doc_id, text) → (doc_id, subj, pred, obj, pos).

    A triple is a token trigram (entity, relation, entity) wholly inside one
    document — the ReVerb-style pattern rule, deterministic and vectorized:
    membership via ``pc.is_in``, the trigram scan via shifted numpy masks.
    ``pos`` is the 0-based token index of the subject (provenance; also the
    dedup tiebreaker, mirroring cgr's ``@line`` variant rule).
    """
    flat, row_idx, offsets = _tokenize(batch["text"])
    n = len(flat)
    if n < 3:
        return pa.table(
            {id_col: pa.array([], batch[id_col].type), "subj": pa.array([], pa.string()),
             "pred": pa.array([], pa.string()), "obj": pa.array([], pa.string()),
             "pos": pa.array([], pa.int64())}
        )
    is_ent = pc.is_in(flat, value_set=_ENT_ARR).to_numpy(zero_copy_only=False)
    is_rel = pc.is_in(flat, value_set=_REL_ARR).to_numpy(zero_copy_only=False)
    same_doc = row_idx[:-2] == row_idx[2:]
    hit = is_ent[:-2] & is_rel[1:-1] & is_ent[2:] & same_doc
    i = np.flatnonzero(hit)
    subj = pc.take(flat, pa.array(i, pa.int64()))
    pred = pc.take(flat, pa.array(i + 1, pa.int64()))
    obj = pc.take(flat, pa.array(i + 2, pa.int64()))
    rows = row_idx[i]
    ids = pc.take(batch[id_col], pa.array(rows, pa.int64()))
    pos = i - offsets[rows]
    return pa.table(
        {id_col: ids, "subj": subj, "pred": pred, "obj": obj,
         "pos": pa.array(pos, pa.int64())}
    )
