"""TF-IDF keyword extraction: planted ranking + batch-size invariance."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.tfidf import extract_tf_batch, tfidf_topk


def test_extract_tf_counts_and_tokenization():
    b = pa.table(
        {"doc_id": [1, 2], "text": ["Apple apple, banana!", "  banana?? CHERRY"]}
    )
    out = extract_tf_batch(b).to_pandas()
    got = {(r.doc_id, r.term): r.tf for r in out.itertuples()}
    assert got == {
        (1, "apple"): 2, (1, "banana"): 1,
        (2, "banana"): 1, (2, "cherry"): 1,
    }


def test_tfidf_topk_planted_ranking(ray_session):
    # "rare" appears in one doc only (df=1); "common" in all docs (df=3).
    # With equal tf, rare outranks common everywhere it occurs.
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "rare common filler0",
                "common filler1 filler1",
                "common filler2 zebra",
            ],
        }
    )
    out = tfidf_topk(rd.from_pandas(docs), k=2).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("rank")
    # rare and filler0 both have tf=1, df=1 → tie broken by term asc
    assert list(d1.term) == ["filler0", "rare"]
    assert list(d1["rank"]) == [1, 2]
    d2 = out[out.doc_id == 2].sort_values("rank")
    # filler1 tf=2 df=1 (score 2.0) beats common tf=1 df=3
    assert list(d2.term) == ["filler1", "common"]
    assert int(d2.iloc[0]["df"]) == 1 and int(d2.iloc[0]["tf"]) == 2
    assert int(d2.iloc[1]["df"]) == 3
    d3 = out[out.doc_id == 3].sort_values("rank")
    # common (1/3) is pushed out of top-2 by the two df=1 terms
    assert list(d3.term) == ["filler2", "zebra"]


def test_tfidf_topk_batch_size_invariant(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [f"alpha beta w{i} w{i} gamma" for i in range(30)],
        }
    )
    def run(nblocks):
        ds = rd.from_pandas(docs).repartition(nblocks)
        out = tfidf_topk(ds, k=3).to_pandas()
        return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    # per-doc unique term w{i}: df=1, tf=2 → rank 1 everywhere
    top = a[a["rank"] == 1]
    assert (top.term.to_numpy() == [f"w{i}" for i in range(30)]).all()


def test_inverted_index_cap_and_exact_df():
    import pyarrow as pa
    import ray.data as rd

    from code_graph_rag_ray.stages.tfidf import inverted_index

    rows = [{"doc_id": i, "text": "common alpha" if i < 40 else "rare beta"}
            for i in range(50)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(6)
    out = {r["term"]: r for r in inverted_index(ds, max_postings=8).take_all()}
    # hot term: df exact, postings truncated to the 8 SMALLEST ids
    assert out["common"]["df"] == 40
    assert out["common"]["postings"] == ",".join(str(i) for i in range(8))
    # cold-but-above-cap term: df exact, postings still capped at 8
    assert out["rare"]["df"] == 10
    assert out["rare"]["postings"] == ",".join(str(i) for i in range(40, 48))
    # below-cap terms carry their FULL list: make one with df=3
    rows2 = rows + [{"doc_id": 100 + j, "text": "tiny gamma"} for j in range(3)]
    ds2 = rd.from_arrow(pa.Table.from_pylist(rows2)).repartition(4)
    out2 = {r["term"]: r for r in inverted_index(ds2, max_postings=8).take_all()}
    assert out2["gamma"]["df"] == 3 and out2["gamma"]["postings"] == "100,101,102"


def test_bigram_counts_boundaries_and_empties():
    import pandas as pd
    import ray.data as rd

    from code_graph_rag_ray.stages.tfidf import bigram_counts

    df = pd.DataFrame(
        {"text": ["a b  c", "c a", "x", ""]}  # double space → empty token
    )
    got = {(r["w1"], r["w2"]): r["n"]
           for r in bigram_counts(rd.from_pandas(df).repartition(3)).take_all()}
    # "a b  c" → (a,b), (b,c); pairs never cross documents
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1}


def test_vocab_growth_matches_bruteforce():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from code_graph_rag_ray.stages.tfidf import vocab_growth

    rng = np.random.default_rng(31)
    texts = []
    for i in range(200):
        # mix of old vocabulary and genuinely new terms per doc
        old = [f"w{rng.integers(0, 1 + i)}" for _ in range(10)]
        new = [f"n{i}x{j}" for j in range(int(rng.integers(0, 4)))]
        texts.append(" ".join(old + new))
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts})
    got = {r["first_doc"]: r["n_new_terms"] for r in vocab_growth(
        rd.from_pandas(df).repartition(9)).take_all()}
    seen: set[str] = set()
    exp: dict[int, int] = {}
    for i, t in enumerate(texts):
        new_terms = {w for w in t.lower().split() if w} - seen
        if new_terms:
            exp[i] = len(new_terms)
        seen |= new_terms
    assert got == exp
