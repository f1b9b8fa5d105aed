"""BM25 full-text retrieval over the corpus — the query-time scoring
the reference's RAG layer performs against its graph/code index
(codebase_rag/services/llm.py retrieval prompts + graph_updater.py
simple_name_lookup candidate ranking), re-expressed as a Ray Data
batch pipeline over a documents table.

Okapi BM25 (Robertson & Walker 1994, public), k1 = 6/5 and b = 3/4 as
exact rationals, with BOTH transcendental-free conventions this repo
already uses for bit-exact oracles:

- idf is quantized to integer log2 steps (the DSIR convention,
  stages/dsir.py): q = ((2N − 2df + 1) << S) // (2df + 1) replays
  (N − df + ½)/(df + ½) scaled by 2^S, and lam = bit_length(q) − (S+1)
  is its integer log2. bit_length is bit-smearing + popcount — never
  floor(log2(x)), whose libm rounding can disagree near 2^53.
- the tf saturation term is a pure integer rational (the lm_score
  convention, stages/lm.py): with avgdl_c = (100·TL) // N (centitoken
  average doc length),

      tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        = 44·tf·avgdl_c / (20·tf·avgdl_c + 6·avgdl_c + 1800·dl)

  scaled by ``scale`` and floor-divided — BIGINT on both sides.
  Magnitude guard: 44·tf·avgdl_c·scale must stay < 2^63; at the default
  scale = 10^6 that holds whenever tf·avgdl_c < 2·10^11 (tf ≤ 10^6
  occurrences against avgdl ≤ 2·10^3 tokens) — far beyond any real
  document.

score(query, doc) = Σ over matched distinct query terms of
lam[term] · tfn_scaled(tf, dl). Query terms are deduplicated (short
queries carry no useful query-side tf); unmatched terms contribute 0 by
construction (they produce no candidate row).

Scale shape (the part that must survive 100 TB):

1. One corpus-stats pass — per-block (n_docs, total_tokens) partials,
   two-phase sum to a single row. O(blocks) exchange.
2. One tokenize pass emits ONLY candidate rows: (doc_id, term, tf, dl)
   for terms in the broadcast query-term set (`pc.is_in` against a
   ray.put'd value set — the query side never shuffles). Per-doc dl is
   computed inside the same batch before the filter, so no extra join.
   The candidate set is materialized ONCE (it is |matching docs| ×
   |matched terms| — the posting-list working set, not the corpus).
3. df for the ≤ |query terms| distinct terms: a two-phase grouped count
   over candidates folded to a dictionary-scale table on the driver
   (bounded by the query vocabulary, like lm_score's V).
4. Gather-only score pass over candidates (lam/avgdl_c ride the task
   closure), then a two-phase (query_id, doc_id) grouped sum.
5. Exact top-k per query via grouped_top_k: each block truncates to k
   rows per query, the final per-query group sees O(blocks × k) rows.
   Ties at the k boundary break (score DESC, doc_id ASC) —
   deterministic, oracle-exact.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from code_graph_rag_ray.stages.dsir import _bit_length_u64

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize_query(q: str) -> list[str]:
    """Distinct query terms under the shared corpus tokenizer, in first-
    occurrence order (order is irrelevant to scoring — terms are a set)."""
    seen: dict[str, None] = {}
    for t in re.split(_TOKEN_SPLIT, q.lower()):
        if t:
            seen.setdefault(t, None)
    return list(seen)


def _candidate_rows(
    b: pa.Table, term_set: pa.Array, id_col: str, text_col: str
) -> pa.Table:
    """(doc_id, term, tf, dl) for query terms only; dl counts ALL tokens
    of the doc (computed before the query-term filter)."""
    # b carries its schema even at 0 rows — the id type is always real
    empty = pa.table(
        {id_col: pa.array([], b[id_col].type),
         "term": pa.array([], pa.string()),
         "tf": pa.array([], pa.int64()),
         "dl": pa.array([], pa.int64())}
    )
    if b.num_rows == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(b[text_col]),
                                  pattern=_TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    # per-input-row true token count = dl
    dl_np = np.zeros(b.num_rows, np.int64)
    np.add.at(dl_np, parent.to_numpy(zero_copy_only=False), 1)
    hit = pc.is_in(flat, value_set=term_set)
    flat = flat.filter(hit)
    parent = parent.filter(hit)
    if len(flat) == 0:
        return empty
    pidx = parent.to_numpy(zero_copy_only=False)
    pairs = pa.table(
        {id_col: pc.take(b[id_col], parent), "term": flat,
         "__p": pa.array(pidx, pa.int64())}
    )
    g = pa.TableGroupBy(pairs, [id_col, "term", "__p"],
                        use_threads=False).aggregate([([], "count_all")])
    return pa.table(
        {id_col: g[id_col], "term": g["term"],
         "tf": pc.cast(g["count_all"], pa.int64()),
         "dl": pa.array(dl_np[g["__p"].to_numpy(zero_copy_only=False)])}
    )


def bm25_topk(
    docs: Dataset,
    queries: list[tuple[int, str]],
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 10**6,
    scale_bits: int = 16,
) -> Dataset:
    """Top-``k`` documents per query by integer-exact BM25 — returns
    (query_id, doc_id, score, n_terms) with score the ``scale``-scaled
    integer BM25 sum and n_terms the count of matched distinct query
    terms. See module docstring for the exact arithmetic and the
    100 TB scale shape."""
    from code_graph_rag_ray.stages.relational import (
        grouped_top_k,
        partial_groupby_sum,
    )

    qterms = {qid: tokenize_query(qs) for qid, qs in queries}
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    if not all_terms:
        raise ValueError("queries produced no terms under the tokenizer")
    term_set = pa.array(all_terms, pa.string())
    # term → query ids containing it (query fan-out is dictionary-scale)
    term_qids: dict[str, list[int]] = {t: [] for t in all_terms}
    for qid, ts in qterms.items():
        for t in ts:
            term_qids[t].append(qid)

    # 1. corpus stats: one (n, tl) row per block, two-phase sum
    def stats_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(b[text_col]),
                                      pattern=_TOKEN_SPLIT)
        flat = pc.list_flatten(toks)
        tl = int(pc.sum(pc.cast(pc.not_equal(flat, ""),
                                pa.int64())).as_py() or 0)
        return pa.table({"__k": pa.array([0], pa.int32()),
                         "n": pa.array([b.num_rows], pa.int64()),
                         "tl": pa.array([tl], pa.int64())})

    st = partial_groupby_sum(
        docs.map_batches(stats_partial, batch_format="pyarrow"),
        ["__k"], {"n": "n", "tl": "tl"},
    ).take_all()  # exactly one row
    n_docs, tl = int(st[0]["n"]), int(st[0]["tl"])
    avgdl_c = (100 * tl) // max(n_docs, 1)

    # 2. candidate rows (query-term postings), materialized once —
    # consumed by the df fold and the score pass
    term_ref = ray.put(term_set)

    def cand(b: pa.Table) -> pa.Table:
        return _candidate_rows(b, ray.get(term_ref), id_col, text_col)

    cands = docs.map_batches(cand, batch_format="pyarrow").materialize()

    # 3. df per query term — dictionary-scale fold (≤ |all_terms| rows)
    df_rows = partial_groupby_sum(
        cands.select_columns(["term"]), ["term"], {}, count_alias="df"
    ).take_all()
    dfs = {r["term"]: int(r["df"]) for r in df_rows}

    # 4. integer-log2 idf per term (DSIR convention; q=0 ⇒ lam = -(S+1))
    dfv = np.array([dfs.get(t, 0) for t in all_terms], np.int64)
    qv = ((2 * n_docs - 2 * dfv + 1).astype(np.uint64)
          << np.uint64(scale_bits)) // (2 * dfv + 1).astype(np.uint64)
    lam = _bit_length_u64(qv) - (scale_bits + 1)
    lam_of = {t: int(w) for t, w in zip(all_terms, lam)}

    fan_term: list[str] = []
    fan_qid: list[int] = []
    for t, qids in term_qids.items():
        for qid in qids:
            fan_term.append(t)
            fan_qid.append(qid)
    fan_ref = ray.put((fan_term, fan_qid, lam_of))

    def contrib(b: pa.Table) -> pa.Table:
        ft, fq, lo = ray.get(fan_ref)
        if b.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 id_col: pa.array([], b[id_col].type),
                 "c": pa.array([], pa.int64()),
                 "one": pa.array([], pa.int64())}
            )
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = b["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        # enforce the documented int64 headroom (exact Python-int check,
        # O(1) per batch): long-doc corpora with high tf would otherwise
        # wrap the numerator silently and score wrong with no error
        max_tf = int(tf.max()) if len(tf) else 0
        if 44 * max_tf * avgdl_c * scale >= 2**63:
            raise OverflowError(
                f"bm25 tf-saturation numerator exceeds int64: max tf="
                f"{max_tf}, avgdl_c={avgdl_c}, scale={scale}; lower "
                f"`scale` or pre-truncate pathological documents"
            )
        tfn = (44 * tf * avgdl_c * scale) // (
            20 * tf * avgdl_c + 6 * avgdl_c + 1800 * dl
        )
        # ONE vectorized mask per DISTINCT term (a term shared by N
        # queries must not rescan the batch N times), then fan out the
        # cached selection per query containing it
        sel_of: dict[str, np.ndarray] = {}
        for t in set(ft):
            sel_of[t] = np.flatnonzero(
                pc.equal(b["term"], t).to_numpy(zero_copy_only=False)
            )
        ri_parts: list[np.ndarray] = []
        qid_parts: list[np.ndarray] = []
        c_parts: list[np.ndarray] = []
        for t, q in zip(ft, fq):
            sel = sel_of[t]
            if len(sel) == 0:
                continue
            ri_parts.append(sel)
            qid_parts.append(np.full(len(sel), q, np.int64))
            c_parts.append(lo[t] * tfn[sel])
        if not ri_parts:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 id_col: pa.array([], b[id_col].type),
                 "c": pa.array([], pa.int64()),
                 "one": pa.array([], pa.int64())}
            )
        ri = np.concatenate(ri_parts)
        return pa.table(
            {"query_id": pa.array(np.concatenate(qid_parts)),
             id_col: pc.take(b[id_col], pa.array(ri)),
             "c": pa.array(np.concatenate(c_parts)),
             "one": pa.array(np.ones(len(ri), np.int64))}
        )

    scored = partial_groupby_sum(
        cands.map_batches(contrib, batch_format="pyarrow"),
        ["query_id", id_col], {"c": "score", "one": "n_terms"},
    )
    return grouped_top_k(scored, "query_id", "score", k,
                         descending=True, tiebreak=id_col)
