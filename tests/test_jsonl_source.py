"""JSONL page source tests: parquet-path equivalence + base64 codec."""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from code_graph_rag_ray.sources.jsonl import (
    _b64_decode_array,
    encode_pages_for_json,
    read_pages_jsonl,
    write_pages_jsonl,
    PAGES_SCHEMA,
)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.binary(max_size=40), min_size=0, max_size=8))
def test_b64_decode_vectorized_matches_stdlib(payloads):
    enc = pa.array([base64.b64encode(p).decode() for p in payloads], pa.string())
    out = _b64_decode_array(enc)
    assert out.to_pylist() == payloads


def test_b64_decode_rejects_unpadded_and_invalid():
    import pytest

    with pytest.raises(ValueError, match="multiple of 4"):
        _b64_decode_array(pa.array(["abc"], pa.string()))
    with pytest.raises(ValueError, match="invalid base64"):
        _b64_decode_array(pa.array(["ab!="], pa.string()))


def test_jsonl_roundtrips_pages_table_exactly(tmp_path):
    from code_graph_rag_ray.sources.pages import write_fixture

    fx = write_fixture(str(tmp_path / "fx"), n_pages=60, seed=11)
    pages = fx.pages
    # includes invalid-utf8 html payloads (M1 error-channel plants)
    path = str(tmp_path / "pages.jsonl")
    write_pages_jsonl(pages, path)
    got = (
        read_pages_jsonl(path)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got.columns) == list(want.columns) == PAGES_SCHEMA.names
    assert got["html"].tolist() == want["html"].tolist()
    assert got["url"].tolist() == want["url"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert (got["warc_ts"].astype("int64") == want["warc_ts"].astype("int64")).all()


def test_write_pages_jsonl_micros_are_timezone_free(tmp_path):
    """Naive warc_ts datetimes must serialize as wall-clock micros, not
    local-time instants — .timestamp() on a naive datetime shifts by the
    host's UTC offset (4h error observed under America/New_York)."""
    import json
    from datetime import datetime, timedelta

    ts = datetime(2024, 3, 15, 12, 30, 45, 123456)
    want = (ts - datetime(1970, 1, 1)) // timedelta(microseconds=1)
    pages = pa.table(
        {"url": ["http://example.org/a"],
         "warc_ts": pa.array([ts], pa.timestamp("us")),
         "html": [b"<p>x</p>"], "text": ["x"], "lang": ["en"]}
    )
    path = str(tmp_path / "tz.jsonl")
    write_pages_jsonl(pages, path)
    rec = json.loads(open(path).read().strip())
    assert rec["warc_ts"] == want
    # and it must equal the distributed encoder's pc.cast path
    enc = encode_pages_for_json(__import__("ray").data.from_arrow(pages))
    assert enc.take_all()[0]["warc_ts"] == want


def test_distributed_export_then_read_back(tmp_path):
    import ray.data as rd

    from code_graph_rag_ray.sources.pages import write_fixture

    fx = write_fixture(str(tmp_path / "fx"), n_pages=40, seed=13)
    ds = rd.from_arrow(fx.pages)
    out_dir = str(tmp_path / "jsonl")
    encode_pages_for_json(ds).write_json(out_dir)
    got = (
        read_pages_jsonl(out_dir)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = fx.pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert got["html"].tolist() == want["html"].tolist()
    assert len(got) == len(want)


def test_kg_identical_from_jsonl_and_parquet(tmp_path):
    import ray.data as rd

    from code_graph_rag_ray.pipelines.kg import build_kg
    from code_graph_rag_ray.sources.pages import write_fixture

    fx = write_fixture(str(tmp_path / "fx"), n_pages=50, seed=17)
    path = str(tmp_path / "pages.jsonl")
    write_pages_jsonl(fx.pages, path)

    def edges(pages_ds):
        kg = build_kg(pages_ds, fx.alias_dict)
        df = kg["edges"].to_pandas()
        cols = ["subj", "pred", "obj", "provenance_url"]
        return df[cols].sort_values(cols).reset_index(drop=True)

    a = edges(rd.read_parquet(str(tmp_path / "fx" / "pages.parquet")))
    b = edges(read_pages_jsonl(path))
    assert a.equals(b)
