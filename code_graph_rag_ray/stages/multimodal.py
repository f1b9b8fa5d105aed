"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata struct columns;
decode / feature-extract stages are actor pools sized for heavy payloads
(small ``batch_size``, one CPU per actor). The decode kernels themselves are
STUBBED — the image/audio libs are not in this container — behind
``decoder="fake"`` (deterministic fake features for tests) or
``decoder="pil"``/... which raise ``NotImplementedError`` until the real lib
is importable. The Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class MediaDecoder:
    """Actor-pool decode/feature stage over binary media columns.

    ``decoder="fake"`` derives a deterministic 8-dim feature vector from the
    payload bytes (crc-seeded) — exercising the full Ray path. Real decoders
    are import-gated.
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 8):
        self.feature_dim = feature_dim
        if decoder == "fake":
            self.decode = self._fake_decode
        elif decoder == "pil":  # pragma: no cover - lib not in container
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "PIL not available in this environment; use decoder='fake'"
                ) from e
            raise NotImplementedError("real image decode not wired yet")
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        import zlib

        seed = zlib.crc32(payload or b"")
        rng = np.random.default_rng(seed)  # deterministic per payload
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decode(p) for p in batch["payload"].to_pylist()]
        out = pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                "payload_bytes": pa.array(
                    [len(p or b"") for p in batch["payload"].to_pylist()], pa.int64()
                ),
            }
        )
        return out


def decode_media(ds: Dataset, *, decoder: str = "fake", concurrency: int = 2,
                 batch_size: int = 64) -> Dataset:
    """Wide-binary-row discipline: small batches so batch × concurrency fits
    worker heap; payload column dropped in the output (project early)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_args=(decoder,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def make_fake_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus for tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        k = kinds[int(rng.integers(3))]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "kind": k,
                "payload": payload,
                "width": int(rng.integers(16, 1920)) if k == "image" else 0,
                "height": int(rng.integers(16, 1080)) if k == "image" else 0,
                "duration_ms": int(rng.integers(100, 60000)) if k != "image" else 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
