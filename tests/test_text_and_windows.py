"""Text-analysis, window, multimodal and lineage unit tests."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.multimodal import decode_media, make_fake_media_table
from code_graph_rag_ray.stages.text_analysis import (
    LangId,
    fingerprint_batch,
    quality_batch,
    token_stats_batch,
)
from code_graph_rag_ray.stages.windows import session_windows, tumbling_window_agg


def test_token_stats():
    b = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["ab cd, ef"])})
    r = token_stats_batch(b).to_pylist()[0]
    assert r["n_tokens"] == 3  # whitespace tokens: 'ab' 'cd,' 'ef'
    assert r["n_bpe_tokens"] == 4  # ab, cd, ',', ef
    assert r["n_chars_text"] == 9


def test_quality_monotone_in_length():
    short = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["spark join"])})
    long = pa.table(
        {"doc_id": pa.array([2], pa.int64()), "text": pa.array([" ".join(["spark"] * 60)])}
    )
    qs = quality_batch(short).to_pylist()[0]["quality"]
    ql = quality_batch(long).to_pylist()[0]["quality"]
    assert ql > qs


def test_lang_id_heuristic():
    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "the cat and the dog sat in a house that is warm",
                    "le chat et le chien est dans la maison",
                    "der Hund und die Katze ist nicht hier",
                    "这是一个中文句子",
                ]
            ),
        }
    )
    out = LangId()(b).to_pylist()
    assert [r["lang_pred"] for r in out] == ["en", "fr", "de", "zh"]


def test_fingerprint_deterministic():
    b = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([" ".join(f"w{i}" for i in range(20))])})
    a1 = fingerprint_batch(b).to_pylist()
    a2 = fingerprint_batch(b).to_pylist()
    assert a1 == a2
    assert len(a1[0]["md5"]) == 32


def test_tumbling_window_epoch_alignment():
    rows = [
        {"ts": pd.Timestamp("2024-01-01 00:10:00"), "event_type": "a", "value": 1.0},
        {"ts": pd.Timestamp("2024-01-01 00:50:00"), "event_type": "a", "value": 2.0},
        {"ts": pd.Timestamp("2024-01-01 01:10:00"), "event_type": "a", "value": 4.0},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = tumbling_window_agg(ds, window_s=3600).to_pandas().sort_values("window_start")
    assert out.n_events.tolist() == [2, 1]
    assert out.sum_value.tolist() == [3.0, 4.0]
    assert out.window_start.tolist() == [1704067200, 1704070800]


def test_session_windows_gap_split():
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        {"user_id": 1, "ts": t0},
        {"user_id": 1, "ts": t0 + pd.Timedelta(minutes=10)},
        {"user_id": 1, "ts": t0 + pd.Timedelta(minutes=70)},  # > 30min gap → new
        {"user_id": 2, "ts": t0},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = session_windows(ds, gap_s=1800).to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_start")
    assert u1.n_events.tolist() == [2, 1]
    assert len(out[out.user_id == 2]) == 1


def test_multimodal_decode_plumbing():
    tbl = make_fake_media_table(32)
    ds = rd.from_arrow(tbl)
    out = decode_media(ds, decoder="fake").to_pandas()
    assert len(out) == 32
    assert set(out.columns) == {"media_id", "kind", "feature", "payload_bytes"}
    assert all(len(f) == 8 for f in out.feature)
    # deterministic per payload
    out2 = decode_media(rd.from_arrow(tbl), decoder="fake").to_pandas()
    a = out.sort_values("media_id").feature.tolist()
    b = out2.sort_values("media_id").feature.tolist()
    assert all(list(x) == list(y) for x, y in zip(a, b))


def test_multimodal_real_decoder_gated():
    import pytest

    with pytest.raises((NotImplementedError, ValueError)):
        from code_graph_rag_ray.stages.multimodal import MediaDecoder

        MediaDecoder(decoder="pil")
