"""BM25 retrieval: naive-reference equivalence (same integer
conventions), layout invariance, df=0 / negative-idf paths, string-id
support, query-term dedup."""

import numpy as np
import pyarrow as pa
import ray

from code_graph_rag_ray.stages.bm25 import bm25_topk, tokenize_query


def _mk(rows, parallelism=4):
    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(parallelism)


ROWS = (
    [{"doc_id": i, "text": "spark join hash " + "filler " * i}
     for i in range(6)]
    + [{"doc_id": 10 + i, "text": "window sort " * (i + 1)} for i in range(4)]
    + [{"doc_id": 20, "text": "spark spark spark spark join"},
       {"doc_id": 21, "text": ""},
       {"doc_id": 22, "text": "unrelated words entirely here"}]
)

QUERIES = [(0, "spark join"), (1, "window sort missingterm"),
           (2, "Spark, SPARK; spark")]  # dup terms collapse to one


def _naive_bm25(rows, queries, k, scale=10**6, scale_bits=16):
    """Python-int replay of the documented integer arithmetic."""
    import re

    docs = {}
    for r in rows:
        toks = [t for t in re.split("[^a-z0-9]+", r["text"].lower()) if t]
        docs[r["doc_id"]] = toks
    n = len(docs)
    tl = sum(len(t) for t in docs.values())
    ac = (100 * tl) // n
    out = {}
    for qid, qs in queries:
        terms = tokenize_query(qs)
        scored = []
        for did, toks in docs.items():
            dl = len(toks)
            score, nt = 0, 0
            for t in terms:
                tf = toks.count(t)
                if tf == 0:
                    continue
                df = sum(1 for ts in docs.values() if t in ts)
                q = ((2 * n - 2 * df + 1) << scale_bits) // (2 * df + 1)
                lam = q.bit_length() - (scale_bits + 1)
                tfn = (44 * tf * ac * scale) // (
                    20 * tf * ac + 6 * ac + 1800 * dl)
                score += lam * tfn
                nt += 1
            if nt:
                scored.append((score, did, nt))
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[qid] = [(did, s, nt) for s, did, nt in scored[:k]]
    return out


def _run(rows, queries, k=5, **kw):
    got = {}
    for r in bm25_topk(_mk(rows, **kw), queries, k=k).take_all():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["n_terms"]))
    for v in got.values():
        v.sort(key=lambda x: (-x[1], x[0]))
    return got


def test_matches_naive_reference():
    exp = _naive_bm25(ROWS, QUERIES, k=5)
    got = _run(ROWS, QUERIES, k=5)
    assert got == {q: v for q, v in exp.items() if v}


def test_layout_invariance():
    a = _run(ROWS, QUERIES, k=4, parallelism=1)
    b = _run(ROWS, QUERIES, k=4, parallelism=7)
    assert a == b


def test_df_zero_term_contributes_nothing():
    # q1 includes 'missingterm' (df=0): identical to the query without it
    with_m = _run(ROWS, [(0, "window sort missingterm")], k=10)
    without = _run(ROWS, [(0, "window sort")], k=10)
    assert with_m == without


def test_negative_idf_still_deterministic():
    # a term in EVERY doc gets a negative quantized idf; ranking must
    # still be total and layout-stable
    rows = [{"doc_id": i, "text": "common " * (i + 1)} for i in range(5)]
    exp = _naive_bm25(rows, [(0, "common")], k=5)
    assert _run(rows, [(0, "common")], k=5) == exp
    s = _run(rows, [(0, "common")], k=5)[0]
    assert all(x[1] < 0 for x in s)


def test_string_doc_ids():
    rows = [{"doc_id": f"d{i}", "text": "spark join"} for i in range(3)]
    got = _run(rows, [(0, "spark")], k=2)
    assert [x[0] for x in got[0]] == ["d0", "d1"]


def test_query_term_dedup():
    assert tokenize_query("Spark, SPARK; spark join") == ["spark", "join"]
    # duplicate terms must not double-count
    one = _run(ROWS, [(0, "spark")], k=3)
    dup = _run(ROWS, [(0, "spark spark SPARK")], k=3)
    assert one == dup
