"""Extraction-stage tests: determinism, error isolation, vocab extraction.

Pin the per-row invariant from BASELINE.json input_hint: byte-identical
extracted text per url, across runs, batch sizes and parallelism.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from code_graph_rag_ray.functions.html import extract_text
from code_graph_rag_ray.stages.extract import (
    doc_mentions_batch,
    doc_triples_batch,
    extract_text_batch,
)


def test_extract_text_scalar_basics():
    assert extract_text("<html><body><p>hello world</p></body></html>") == "hello world"
    assert (
        extract_text("<p>a</p><p>b &amp; c</p><script>var x=1;</script>") == "a\nb & c"
    )
    assert extract_text("") == ""
    # malformed: unclosed tag degrades deterministically, never raises
    out1 = extract_text('<p class="broken <div>rest of text</p>')
    out2 = extract_text('<p class="broken <div>rest of text</p>')
    assert out1 == out2


def test_extract_text_byte_identical_across_batch_sizes(pages_fixture):
    fx, fx_dir = pages_fixture
    expected = {r["url"]: r["text"] for r in fx.expected_text.to_pylist()}

    for bs in (7, 64, 1024):
        ds = rd.read_parquet(f"{fx_dir}/pages.parquet").map_batches(
            extract_text_batch, batch_format="pyarrow", batch_size=bs
        )
        got = {r["url"]: r["text"] for r in ds.to_pandas().to_dict("records")}
        assert got == expected, f"extract_text drifted at batch_size={bs}"


def test_extract_text_error_isolation(pages_fixture):
    fx, fx_dir = pages_fixture
    ds = rd.read_parquet(f"{fx_dir}/pages.parquet").map_batches(
        extract_text_batch, batch_format="pyarrow"
    )
    df = ds.to_pandas()
    # the generator plants invalid-utf8 rows; they are flagged, not dropped
    assert (df["error"] == "utf8-decode-error").any()
    assert len(df) == fx.pages.num_rows  # no row lost
    # rows without errors have no error marker
    assert df["error"].isna().sum() + (df["error"] == "utf8-decode-error").sum() == len(df)


def test_mention_offsets_match_text(pages_fixture):
    fx, _ = pages_fixture
    text_by_url = {r["url"]: r["text"] for r in fx.expected_text.to_pylist()}
    for m in fx.expected_mentions.to_pylist():
        t = text_by_url[m["url"]]
        assert t[m["start"] : m["end"]] == m["surface"]


def test_doc_triples_batch_semantics():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "spark join table the batch merge stream",
                    "fast row sort key dup",  # 'key dup' then end — no trailing entity
                ]
            ),
        }
    )
    out = doc_triples_batch(batch).to_pylist()
    assert {(r["doc_id"], r["subj"], r["pred"], r["obj"], r["pos"]) for r in out} == {
        (1, "spark", "join", "table", 0),
        (1, "batch", "merge", "stream", 4),
        (2, "row", "sort", "key", 1),
    }


def test_doc_triples_no_cross_document_trigram():
    # last tokens of doc 1 + first of doc 2 would form a triple if the scan
    # ignored row boundaries
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["spark join", "table row"]),
        }
    )
    assert doc_triples_batch(batch).num_rows == 0


def test_doc_mentions_batch_counts():
    batch = pa.table(
        {"doc_id": pa.array([7], pa.int64()), "text": pa.array(["spark the spark join row"])}
    )
    out = {(r["doc_id"], r["surface"]): r["n_mentions"] for r in doc_mentions_batch(batch).to_pylist()}
    assert out == {(7, "spark"): 2, (7, "row"): 1}


def test_extract_is_stable_under_shuffle(pages_fixture):
    """Same rows, different block layout → identical (url, text) pairs."""
    fx, fx_dir = pages_fixture
    base = rd.read_parquet(f"{fx_dir}/pages.parquet")
    a = base.map_batches(extract_text_batch, batch_format="pyarrow")
    b = (
        base.random_shuffle(seed=7)
        .map_batches(extract_text_batch, batch_format="pyarrow", batch_size=13)
    )
    ta = a.to_pandas().sort_values("url").reset_index(drop=True)
    tb = b.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(ta["url"]) == list(tb["url"])
    assert list(ta["text"]) == list(tb["text"])


def test_docs_to_pages_empty_block_is_typed():
    """Empty blocks reach batch fns (Ray splits/filters produce them); the
    pages derivation must return a TYPED empty table — pa.array(["x"]*0)
    literals infer NULL type and crash string kernels (NOTES fact 26)."""
    import pyarrow as pa

    from code_graph_rag_ray.sources.pages import _docs_to_pages_batch

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "text": pa.array([], pa.string()),
         "lang": pa.array([], pa.string()),
         "source": pa.array([], pa.string())}
    )
    out = _docs_to_pages_batch(empty)
    assert out.num_rows == 0
    assert out.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert out.schema.field("html").type == pa.binary()
