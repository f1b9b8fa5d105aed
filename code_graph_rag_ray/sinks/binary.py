"""Offline binary graph sink (S5 analog).

cgr's offline flagship (``cgr index -o DIR``) writes ``nodes.bin`` /
``relationships.bin`` — length-prefixed protobuf records, optionally split
per label with an ``index.bin`` (``services/protobuf_service.py:45-210``,
id-from-key rule ``:55-60``). protobuf isn't available in this container,
so the record codec here is a stable length-prefixed JSON framing
(``uint32 LE length ‖ utf8 json`` per record, keys sorted); the SINK
semantics mirror the reference: records written inside tasks (one ``.bin``
per block, or per (block, label) when ``label_col`` is given) and an
``index.json`` recording per-file label + row counts so a consumer can
read one label without scanning everything.
"""

from __future__ import annotations

import json
import os
import struct
import uuid

import pyarrow as pa
from ray.data import Dataset

_LEN = struct.Struct("<I")


def _write_records(rows: list[dict], path: str) -> None:
    with open(path, "wb") as f:
        for row in rows:
            blob = json.dumps(row, sort_keys=True, default=str).encode()
            f.write(_LEN.pack(len(blob)))
            f.write(blob)


def write_binary_graph(
    ds: Dataset, out_dir: str, *, label_col: str | None = None
) -> dict:
    """Write ``ds`` as length-prefixed binary record files + index.json.

    The record writes happen INSIDE tasks (each block writes its own
    file(s)); only the per-file metadata rows reach the driver for the
    index — the same data movement shape as ``write_parquet``.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        metas = []
        if label_col is None:
            groups = [(None, b)]
        else:
            labels = b[label_col].unique().to_pylist()
            groups = [
                (lab, b.filter(pa.compute.equal(b[label_col], lab)))
                for lab in sorted(labels, key=str)
            ]
        for lab, sub in groups:
            if sub.num_rows == 0:
                continue
            stem = f"{lab or 'all'}-{uuid.uuid4().hex[:12]}.bin"
            _write_records(sub.to_pylist(), os.path.join(out_dir, stem))
            metas.append({"file": stem, "label": lab or "", "rows": sub.num_rows})
        return pa.Table.from_pylist(
            metas,
            schema=pa.schema(
                [("file", pa.string()), ("label", pa.string()), ("rows", pa.int64())]
            ),
        )

    metas = ds.map_batches(write_block, batch_format="pyarrow", batch_size=None).take_all()
    index = {
        "files": sorted(metas, key=lambda m: m["file"]),
        "rows": int(sum(m["rows"] for m in metas)),
        "labels": sorted({m["label"] for m in metas}),
    }
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump(index, f, indent=1)
    return index


def read_binary_graph(out_dir: str, *, label: str | None = None) -> list[dict]:
    """Read records back (the per-label index prunes files, mirroring the
    reference's split-index read path)."""
    with open(os.path.join(out_dir, "index.json")) as f:
        index = json.load(f)
    rows: list[dict] = []
    for meta in index["files"]:
        if label is not None and meta["label"] != label:
            continue
        with open(os.path.join(out_dir, meta["file"]), "rb") as f:
            data = f.read()
        off = 0
        while off < len(data):
            (ln,) = _LEN.unpack_from(data, off)
            off += _LEN.size
            rows.append(json.loads(data[off : off + ln]))
            off += ln
    return rows
