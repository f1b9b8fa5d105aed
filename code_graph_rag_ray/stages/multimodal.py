"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata struct columns;
decode / feature-extract stages are actor pools sized for heavy payloads
(small ``batch_size``, one CPU per actor). Each kernel has two variants:
``decoder="fake"`` (deterministic payload-seeded features — the test/bench
default, since the media libs are not in this container) and the REAL
import-gated path (``decoder="pil"`` / ``"pyav"``) that decodes with the
library when it is importable; ``NotImplementedError`` is reachable only
from the ImportError handler. The Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is identical for both and fully tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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
            # genuinely import-only gate: when PIL exists the REAL decode
            # runs; NotImplementedError is reachable only on ImportError
            try:
                from PIL import Image
            except ImportError as e:
                raise NotImplementedError(
                    "PIL not available in this environment; use decoder='fake'"
                ) from e
            self._Image = Image
            self.decode = self._pil_decode
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        import zlib

        seed = zlib.crc32(payload or b"")
        rng = np.random.default_rng(seed)  # deterministic per payload
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def _pil_decode(self, payload: bytes) -> np.ndarray:  # pragma: no cover
        """Real image feature: decode, grayscale, resize to (dim, 1) with
        the deterministic BILINEAR filter, normalize pixels to [0, 1]."""
        import io

        img = self._Image.open(io.BytesIO(payload)).convert("L")
        small = img.resize((self.feature_dim, 1), self._Image.BILINEAR)
        px = np.asarray(small, dtype=np.float32).reshape(-1)
        return (px / 255.0).astype(np.float32)

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


class FrameSampler:
    """Actor-pool frame-sampling stage for video rows — one row per sampled
    frame: (media_id, frame_idx, ts_ms, frame_feature).

    Sampling policy is REAL and deterministic: frames at a fixed
    ``every_ms`` stride across ``duration_ms``, capped at ``max_frames``
    evenly-spaced picks (the standard pretraining-corpus discipline — a
    3-hour video must not emit 10^5 rows). Frame decode is the stubbed
    kernel (``decoder="fake"`` derives a per-(payload, ts) feature;
    ``decoder="pyav"`` raises until the lib exists). Non-video rows pass
    through with zero output rows, so the stage composes with mixed-kind
    media tables without a pre-filter.
    """

    def __init__(self, decoder: str = "fake", every_ms: int = 1000,
                 max_frames: int = 16, feature_dim: int = 8):
        self.every_ms = every_ms
        self.max_frames = max_frames
        self.feature_dim = feature_dim
        if decoder == "fake":
            self.decode = self._fake_frame
        elif decoder == "pyav":  # pragma: no cover - lib not in container
            # import-only gate: real seek+decode when PyAV exists
            try:
                import av
            except ImportError as e:
                raise NotImplementedError(
                    "PyAV not available in this environment; use decoder='fake'"
                ) from e
            self._av = av
            self.decode = self._pyav_frame
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _fake_frame(self, payload: bytes, ts_ms: int) -> np.ndarray:
        import zlib

        seed = zlib.crc32((payload or b"") + ts_ms.to_bytes(8, "big"))
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def _pyav_frame(self, payload: bytes, ts_ms: int) -> np.ndarray:  # pragma: no cover
        """Real frame pick: seek to ts_ms, decode the next frame, grayscale
        row-mean feature (same (dim,) contract as the fake kernel)."""
        import io

        with self._av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            # av seeks in stream time_base units
            offset = int(ts_ms / 1000 / stream.time_base)
            container.seek(offset, stream=stream)
            for frame in container.decode(stream):
                arr = frame.to_ndarray(format="gray").astype(np.float32)
                # (H, W) → fixed-dim: mean over feature_dim row bands
                bands = np.array_split(arr, self.feature_dim, axis=0)
                return np.array(
                    [b.mean() / 255.0 for b in bands], dtype=np.float32
                )
        return np.zeros(self.feature_dim, dtype=np.float32)

    def sample_times(self, duration_ms: int) -> list[int]:
        if duration_ms <= 0:
            return []
        ts = list(range(0, duration_ms, self.every_ms))
        if len(ts) <= self.max_frames:
            return ts
        if self.max_frames == 1:
            return [ts[0]]
        # evenly-spaced subset, endpoints kept — INTEGER arithmetic
        # (i·(L−1)//(m−1)), strictly increasing whenever L > m, so the
        # pick list is duplicate-free and SQL-replayable bit-for-bit
        L = len(ts)
        m = self.max_frames
        return [ts[(i * (L - 1)) // (m - 1)] for i in range(m)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, f_idx, f_ts, feats = [], [], [], []
        for mid, kind, payload, dur in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["payload"].to_pylist(), batch["duration_ms"].to_pylist(),
        ):
            if kind != "video":
                continue
            for j, t in enumerate(self.sample_times(int(dur or 0))):
                ids.append(mid)
                f_idx.append(j)
                f_ts.append(t)
                feats.append(self.decode(payload, t).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(f_idx, pa.int32()),
                "ts_ms": pa.array(f_ts, pa.int32()),
                "frame_feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def sample_frames(ds: Dataset, *, decoder: str = "fake", every_ms: int = 1000,
                  max_frames: int = 16, concurrency: int = 2,
                  batch_size: int = 16) -> Dataset:
    """Video rows → frame rows. Smaller batches than image decode (each
    input row fans out up to ``max_frames`` rows and a real decoder holds
    codec state); payload dropped at the stage boundary."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(decoder, every_ms, max_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageResizer:
    """Actor-pool image-resize stage: one row per image with
    (media_id, in_w, in_h, out_w, out_h, thumb) — the dimension POLICY is
    real (aspect-preserving fit inside ``max_side`` × ``max_side``, never
    upscaled, floor'd like every mainstream thumbnailer); the pixel kernel
    is the stubbed fake (payload-seeded deterministic bytes of exactly
    out_w × out_h). ``decoder="pil"`` stays import-gated. Non-image rows
    emit zero rows.
    """

    def __init__(self, decoder: str = "fake", max_side: int = 64):
        self.max_side = max_side
        if decoder == "fake":
            self.resize = self._fake_resize
        elif decoder == "pil":  # pragma: no cover - lib not in container
            # import-only gate: real resize when PIL exists
            try:
                from PIL import Image
            except ImportError as e:
                raise NotImplementedError(
                    "PIL not available in this environment; use decoder='fake'"
                ) from e
            self._Image = Image
            self.resize = self._pil_resize
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _pil_resize(self, payload: bytes, ow: int, oh: int) -> bytes:  # pragma: no cover
        """Real thumbnail: decode, grayscale, BILINEAR resize to the
        policy-computed (ow, oh), raw L-mode bytes (ow×oh) like the fake."""
        import io

        img = self._Image.open(io.BytesIO(payload)).convert("L")
        return img.resize((ow, oh), self._Image.BILINEAR).tobytes()

    def target_size(self, w: int, h: int) -> tuple[int, int]:
        if w <= 0 or h <= 0:
            return (0, 0)
        if max(w, h) <= self.max_side:
            return (w, h)  # never upscale
        if w >= h:
            return (self.max_side, max(1, (h * self.max_side) // w))
        return (max(1, (w * self.max_side) // h), self.max_side)

    def _fake_resize(self, payload: bytes, ow: int, oh: int) -> bytes:
        import zlib

        seed = zlib.crc32((payload or b"") + ow.to_bytes(4, "big") + oh.to_bytes(4, "big"))
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=ow * oh, dtype=np.uint8).tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, iw, ih, ow_l, oh_l, thumbs = [], [], [], [], [], []
        for mid, kind, payload, w, h in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["payload"].to_pylist(), batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            if kind != "image":
                continue
            ow, oh = self.target_size(int(w or 0), int(h or 0))
            ids.append(mid)
            iw.append(int(w or 0))
            ih.append(int(h or 0))
            ow_l.append(ow)
            oh_l.append(oh)
            thumbs.append(self.resize(payload, ow, oh) if ow and oh else b"")
        return pa.table(
            {"media_id": pa.array(ids, pa.string()),
             "in_w": pa.array(iw, pa.int32()), "in_h": pa.array(ih, pa.int32()),
             "out_w": pa.array(ow_l, pa.int32()), "out_h": pa.array(oh_l, pa.int32()),
             "thumb": pa.array(thumbs, pa.binary())}
        )


def resize_images(ds: Dataset, *, decoder: str = "fake", max_side: int = 64,
                  concurrency: int = 2, batch_size: int = 32) -> Dataset:
    """Image rows → thumbnail rows (wide-binary-row discipline: small
    batches, payload dropped at the stage boundary)."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_args=(decoder, max_side),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_from_documents(ds: Dataset) -> Dataset:
    """Closed-form media corpus derived from the documents table:
    ``media_id = 'm' || doc_id``, kind/dims/duration are pure integer
    functions of doc_id, payload = the utf-8 text bytes. Every derivation
    is replayable in SQL, which is what upgrades the media POLICY queries
    (frame sampling, thumbnail dims) from rows-only to bit-exact oracle
    checks — the decode KERNELS stay stubbed regardless.
    """

    def derive(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kinds = np.array(["image", "audio", "video"], dtype=object)[did % 3]
        is_img = did % 3 == 0
        width = np.where(is_img, 16 + (did * 37) % 1904, 0).astype(np.int64)
        height = np.where(is_img, 16 + (did * 53) % 1064, 0).astype(np.int64)
        dur = np.where(~is_img, 100 + (did * 997) % 59900, 0).astype(np.int64)
        mid = pc.binary_join_element_wise(
            pa.array(["m"] * len(did), pa.string()),
            pc.cast(b["doc_id"], pa.string()), "",
        )
        return pa.table(
            {
                "media_id": mid,
                "kind": pa.array(kinds, pa.string()),
                "payload": pc.cast(b["text"], pa.binary()),
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
                "duration_ms": pa.array(dur, pa.int64()),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow")
