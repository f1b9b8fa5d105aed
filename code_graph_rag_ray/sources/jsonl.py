"""JSONL page source — the second corpus format next to Parquet.

Reference analog: the reference ingests a file TREE in many languages
(S1, `graph_updater.py` scanner); the web engine's analog of "another
source format" is Common-Crawl-style pages arriving as newline-delimited
JSON (the WAT/WET sidecar shape) instead of Parquet. `read_pages_jsonl`
yields a Dataset with EXACTLY the canonical pages schema

    (url: string, warc_ts: timestamp[us], html: binary,
     text: string, lang: string)

so every downstream pipeline (build_kg, catalog queries) runs unchanged.

Wire contract: ``html`` rides as standard base64 (binary payloads may be
invalid UTF-8 — the decode error channel is part of M1), ``warc_ts`` as
int64 epoch MICROseconds (exact, timezone-free). `write_pages_jsonl`
produces this encoding (driver-side test/export helper; the distributed
writer is `encode_pages_for_json` + `Dataset.write_json`).

Scale shape: `ray.data.read_json` streams one task per file; the
normalize step is one `map_batches` whose base64 decode is fully
VECTORIZED — a 256-entry LUT over the string column's flat value buffer,
one (n/4 × 4) → (n/4 × 3) bit-repack, and a repeat/cumsum gather that
excises per-element padding bytes; no Python per row. Elements are
padded base64 (length % 4 == 0), so 4-char groups never straddle element
boundaries — that is what makes the whole-buffer repack valid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

PAGES_SCHEMA = pa.schema(
    [("url", pa.string()), ("warc_ts", pa.timestamp("us")),
     ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())]
)

_B64_ALPHABET = b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_B64_LUT = np.full(256, 255, np.uint8)
for _i, _c in enumerate(_B64_ALPHABET):
    _B64_LUT[_c] = _i
_B64_LUT[ord("=")] = 0


def _b64_decode_array(col) -> pa.Array:
    """Vectorized base64 → binary for a string column (see module doc)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    n = len(col)
    voff = np.frombuffer(col.buffers()[1], np.int32)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    vals = np.frombuffer(col.buffers()[2], np.uint8)
    text = vals[voff[0] : voff[-1]]
    off = voff - voff[0]
    elen = off[1:] - off[:-1]
    if (elen % 4).any():
        bad = int(np.flatnonzero(elen % 4)[0])
        raise ValueError(
            f"html base64 element {bad} has length {int(elen[bad])} "
            "(not a multiple of 4) — not padded standard base64"
        )
    s = _B64_LUT[text]
    if (s == 255).any():
        raise ValueError("invalid base64 character in html column")
    q = s.reshape(-1, 4).astype(np.uint16)
    raw = np.empty((len(q), 3), np.uint8)
    raw[:, 0] = ((q[:, 0] << 2) | (q[:, 1] >> 4)).astype(np.uint8)
    raw[:, 1] = (((q[:, 1] & 0xF) << 4) | (q[:, 2] >> 2)).astype(np.uint8)
    raw[:, 2] = (((q[:, 2] & 0x3) << 6) | q[:, 3]).astype(np.uint8)
    raw = raw.ravel()
    # per-element '=' padding count (0..2), only at element tails
    pads = np.zeros(n, np.int64)
    nz = elen > 0
    last = off[1:] - 1
    pads[nz] += text[last[nz]] == ord("=")
    nz2 = elen >= 2
    pads[nz2] += text[(off[1:] - 2)[nz2]] == ord("=")
    raw_len = (elen // 4) * 3
    out_len = raw_len - pads
    raw_off = np.concatenate(([0], np.cumsum(raw_len)))
    out_off = np.concatenate(([0], np.cumsum(out_len)))
    total = int(out_off[-1])
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_off[:-1], out_len)
        + np.repeat(raw_off[:-1], out_len)
    )
    out = raw[idx] if total else np.empty(0, np.uint8)
    if total > np.iinfo(np.int32).max:
        # read_json is one task per file → one very large JSONL file is one
        # batch; int32 offsets would silently wrap past 2 GiB of decoded html
        raise ValueError(
            f"decoded html batch is {total} bytes (> int32 offset range); "
            "split the JSONL file so one file's html stays under 2 GiB"
        )
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(out_off.astype(np.int32)), pa.py_buffer(out)],
    )


def _normalize_pages_batch(b: pa.Table) -> pa.Table:
    if b.num_rows == 0:
        return PAGES_SCHEMA.empty_table()
    ts = b["warc_ts"]
    if not pa.types.is_timestamp(ts.type):
        ts = pc.cast(pc.cast(ts, pa.int64()), pa.timestamp("us"))
    else:
        ts = pc.cast(ts, pa.timestamp("us"))
    return pa.table(
        {"url": pc.cast(b["url"], pa.string()),
         "warc_ts": ts,
         "html": _b64_decode_array(b["html"]),
         "text": pc.cast(b["text"], pa.string()),
         "lang": pc.cast(b["lang"], pa.string())}
    )


def read_pages_jsonl(paths, **read_json_kwargs) -> Dataset:
    """JSONL page files → Dataset in the canonical pages schema."""
    import ray.data as rd

    ds = rd.read_json(paths, **read_json_kwargs)
    return ds.map_batches(_normalize_pages_batch, batch_format="pyarrow")


def encode_pages_for_json(ds: Dataset) -> Dataset:
    """Pages Dataset → JSON-safe columns (html base64, warc_ts int64 µs);
    chain with ``.write_json(dir)`` for a distributed JSONL export."""

    def enc(b: pa.Table) -> pa.Table:
        import base64

        if b.num_rows == 0:
            return pa.table(
                {"url": pa.array([], pa.string()),
                 "warc_ts": pa.array([], pa.int64()),
                 "html": pa.array([], pa.string()),
                 "text": pa.array([], pa.string()),
                 "lang": pa.array([], pa.string())}
            )
        # export-side helper: the decode direction is the ingest hot path
        html64 = pa.array(
            [base64.b64encode(v or b"").decode() for v in b["html"].to_pylist()],
            pa.string(),
        )
        return pa.table(
            {"url": b["url"],
             "warc_ts": pc.cast(b["warc_ts"], pa.int64()),
             "html": html64,
             "text": b["text"],
             "lang": b["lang"]}
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def write_pages_jsonl(pages: pa.Table, path: str) -> None:
    """Driver-side JSONL writer for tests/fixtures (one small table)."""
    import base64
    import json
    from datetime import datetime, timedelta

    with open(path, "w") as f:
        for r in pages.to_pylist():
            ts = r["warc_ts"]
            # timezone-FREE micros: naive datetimes are wall-clock values,
            # not local-time instants — .timestamp() would shift them by
            # the host's UTC offset (observed 4h under America/New_York)
            if isinstance(ts, datetime):
                micros = (ts - datetime(1970, 1, 1)) // timedelta(microseconds=1)
            else:
                micros = int(ts)
            f.write(json.dumps(
                {"url": r["url"], "warc_ts": micros,
                 "html": base64.b64encode(r["html"] or b"").decode(),
                 "text": r["text"], "lang": r["lang"]}
            ) + "\n")
