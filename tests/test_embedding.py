"""Embedding-stage tests: determinism, batch-composition independence, and
the end-to-end pages → embed → near-dup chain (S8/T5 analog)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.embedding import FeatureHashEmbedder, embed_documents


def _tbl(texts):
    return pa.table(
        {"doc_id": pa.array(list(range(len(texts))), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def test_embedder_deterministic_and_batch_independent():
    texts = [f"alpha beta gamma {i} delta" for i in range(10)]
    emb = FeatureHashEmbedder(dim=32)
    whole = emb(_tbl(texts))["embedding"].to_pylist()
    # same rows split across two batches → identical vectors per row
    a = emb(_tbl(texts[:3]))["embedding"].to_pylist()
    b = emb(_tbl(texts[3:]))["embedding"].to_pylist()
    assert whole == a + b
    # unit-norm
    for v in whole:
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # empty text → zero vector (norm guard)
    z = emb(_tbl([""]))["embedding"].to_pylist()[0]
    assert np.linalg.norm(z) == 0.0


def test_embedding_similarity_orders_sanely():
    emb = FeatureHashEmbedder(dim=64)
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = base + " today"
    far = "completely unrelated words about quantum chromodynamics lattice"
    vecs = np.array(emb(_tbl([base, near, far]))["embedding"].to_pylist())
    assert vecs[0] @ vecs[1] > 0.9
    assert vecs[0] @ vecs[1] > vecs[0] @ vecs[2]


def test_pages_to_embeddings_to_near_dup_end_to_end():
    """The chain the reference runs as its embedding pass: corpus → embed
    (actor pool) → vector near-dup — planted near-duplicates must surface."""
    from code_graph_rag_ray.stages.dedup import embedding_near_dup_pairs

    base = ("markets rallied today as analysts observed steady growth across "
            "regions during the quarter amid new announcements")
    texts = [f"doc {i} filler content number {i} with distinct tokens {i*7}"
             for i in range(40)]
    texts[7] = base
    texts[23] = base + " extra"
    ds = rd.from_arrow(_tbl(texts))
    embs = embed_documents(ds, dim=64, concurrency=2, batch_size=16,
                           id_col="doc_id")
    pairs = embedding_near_dup_pairs(
        embs, id_col="doc_id", vec_col="embedding", threshold=0.9
    ).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
    assert (7, 23) in got


def test_md5_audit_embeddings_match_sql_on_edge_cases(tmp_path):
    """AUDIT-mode (md5) embeddings must equal the DuckDB replay bit-for-bit
    on the awkward rows: empty text (zero vector), single token (no
    bigrams), repeated tokens (count cancellation/stacking)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from code_graph_rag_ray.pipelines.catalog import (
        DOC_EMBEDDING_VECTORS_SQL,
        doc_embedding_vectors,
    )

    rows = [
        (1, ""),                       # zero vector
        (2, "solo"),                   # one token, no bigrams
        (3, "a a a a"),                # repeated unigram + bigram stacking
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "the  quick"),             # double space → empty token dropped
    ]
    tbl = pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in rows],
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = doc_embedding_vectors(str(tmp_path)).to_pandas()
    got = got.sort_values(["doc_id", "i"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.execute(DOC_EMBEDDING_VECTORS_SQL).df()
    exp = exp.sort_values(["doc_id", "i"]).reset_index(drop=True)

    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["i"].tolist() == exp["i"].tolist()
    gv = got["v"].to_numpy(dtype=np.float32)
    ev = exp["v"].to_numpy(dtype=np.float32)
    assert (gv == ev).all()            # bit-exact float32
    assert (gv[got["doc_id"] == 1] == 0).all()  # empty text → zero vector
