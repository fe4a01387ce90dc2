"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with metadata
columns alongside (``media_type``, ``n_bytes``). Decode / feature
extraction are actor-pool ``map_batches`` stages — the stage plumbing
(schema, batch size, actor signature, output layout) is real and tested;
the actual codec is STUBBED because no image/audio library ships in this
container:

- ``FakeMediaDecoder`` (default) derives deterministic pseudo-features
  from the bytes (so tests are stable), clearly marked fake.
- ``decode_real`` raises ``NotImplementedError`` — swap in a PIL/ffmpeg
  body on a cluster that has the libs.

Batch-size note: binary payloads dominate block size; cap ``batch_size``
small (e.g. 64-256) and keep ``batch_format="pyarrow"`` (binary columns
don't round-trip pandas cleanly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def decode_real(payload: bytes) -> dict:
    """REAL decode path. PNG is decoded natively (functions/png.py —
    full filter support, no external libs); other containers still need
    PIL/ffmpeg and raise."""
    from glue_etl_pipeline_ray.functions.png import (
        PNG_SIGNATURE,
        pixel_stats,
        png_decode,
    )

    if payload[:8] == PNG_SIGNATURE:
        arr = png_decode(payload)
        return {"pixels": arr, **pixel_stats(arr)}
    raise NotImplementedError(
        "real decoding beyond PNG requires PIL/ffmpeg (not in this "
        "container); use FakeMediaDecoder for plumbing tests"
    )


class PngDecoder:
    """Actor-pool REAL decode stage: PNG payload column -> actual pixel
    statistics (width/height/channels, BT.601 mean luma, pixel sum —
    integer-scaled for exact oracle comparison). Same stage shape as
    FakeMediaDecoder; decode errors dead-letter into an ``error`` column
    instead of killing the task (ref bug B4 discipline)."""

    def __init__(self, payload_col: str = "payload"):
        from glue_etl_pipeline_ray.functions import png  # once per actor

        self.payload_col = payload_col
        self._decode = png.png_decode
        self._stats = png.pixel_stats

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {
            "width": [], "height": [], "channels": [],
            "mean_luma_e6": [], "pixel_sum": [], "error": [],
        }
        for payload in batch[self.payload_col].to_pylist():
            try:
                st = self._stats(self._decode(payload or b""))
                err = None
            except Exception as e:  # noqa: BLE001 — corrupt payload
                st = dict.fromkeys(
                    ("width", "height", "channels", "mean_luma_e6", "pixel_sum")
                )
                err = f"decode: {e}"
            for k in ("width", "height", "channels", "mean_luma_e6", "pixel_sum"):
                cols[k].append(st[k])
            cols["error"].append(err)
        out = batch.drop_columns([self.payload_col])
        for k in ("width", "height", "channels", "mean_luma_e6", "pixel_sum"):
            out = out.append_column(k, pa.array(cols[k], pa.int64()))
        return out.append_column("error", pa.array(cols["error"], pa.string()))


class FakeMediaDecoder:
    """Actor-pool decode stage. __init__ = per-actor setup (the place a
    real decoder loads its codec/model); __call__ = per-batch decode.

    Output adds: width:int64, height:int64, mean_luma:double,
    content_digest:string — deterministic functions of the payload bytes.
    """

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col  # real impl: open codec handles here

    def _decode_one(self, payload: bytes) -> tuple[int, int, float, str]:
        digest = hashlib.sha1(payload).digest()
        w = 64 + digest[0] % 192
        h = 64 + digest[1] % 192
        luma = round(int.from_bytes(digest[2:4], "big") / 65535.0, 6)
        return w, h, luma, digest.hex()[:16]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, lu, dg = [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            w, h, l_, d = self._decode_one(payload or b"")
            ws.append(w)
            hs.append(h)
            lu.append(l_)
            dg.append(d)
        return (
            batch.append_column("width", pa.array(ws, pa.int64()))
            .append_column("height", pa.array(hs, pa.int64()))
            .append_column("mean_luma", pa.array(lu, pa.float64()))
            .append_column("content_digest", pa.array(dg, pa.string()))
        )


class PngFrameSampler:
    """REAL frame sampling over a multi-frame payload: a 'video' carried
    as back-to-back PNG frames (the APNG/MJPEG-style concatenation) is
    split on PNG signature boundaries and every ``stride``-th frame is
    emitted as one row — the explode-and-sample shape a real keyframe
    extractor has, with an actual container parse instead of byte
    windows. Chain :class:`PngDecoder` downstream for per-frame stats."""

    def __init__(
        self,
        payload_col: str = "payload",
        id_col: str = "doc_id",
        stride: int = 2,
    ):
        from glue_etl_pipeline_ray.functions.png import PNG_SIGNATURE

        self.payload_col, self.id_col = payload_col, id_col
        self.stride = max(1, stride)
        self.sig = PNG_SIGNATURE

    def split_frames(self, payload: bytes) -> list[bytes]:
        bounds = []
        pos = payload.find(self.sig)
        while pos != -1:
            bounds.append(pos)
            pos = payload.find(self.sig, pos + 8)
        return [
            payload[s:e]
            for s, e in zip(bounds, bounds[1:] + [len(payload)])
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for doc_id, payload in zip(
            batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            all_frames = self.split_frames(payload or b"")
            for i in range(0, len(all_frames), self.stride):
                ids.append(doc_id)
                fidx.append(i)
                frames.append(all_frames[i])
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "payload": pa.array(frames, pa.binary()),
            }
        )


class PngHistogramEmbedder:
    """REAL feature-extraction stage: decode the PNG payload and emit its
    L1-normalized RGB histogram embedding (``list<float>``, 3 x bins) —
    the decode -> feature chain a GPU model stage replaces at scale;
    corrupt payloads get a null feature + error."""

    def __init__(self, payload_col: str = "payload", bins: int = 8):
        from glue_etl_pipeline_ray.functions import png  # once per actor

        self.payload_col, self.bins = payload_col, bins
        self._decode = png.png_decode
        self._embed = png.histogram_embed

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, errs = [], []
        for payload in batch[self.payload_col].to_pylist():
            try:
                feats.append(
                    self._embed(self._decode(payload or b""), self.bins).tolist()
                )
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — corrupt payload
                feats.append(None)
                errs.append(f"decode: {e}")
        return (
            batch.drop_columns([self.payload_col])
            .append_column("feature", pa.array(feats, pa.list_(pa.float32())))
            .append_column("error", pa.array(errs, pa.string()))
        )


class FrameSampler:
    """'Video' frame sampling stub: slice the payload into ``n_frames``
    equal byte windows and emit one row per sampled frame (flat_map-style
    explode inside map_batches). Real impl: ffmpeg keyframe extraction."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id", n_frames: int = 4):
        self.payload_col, self.id_col, self.n_frames = payload_col, id_col, n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for doc_id, payload in zip(
            batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            payload = payload or b""
            step = max(1, len(payload) // self.n_frames)
            for i in range(self.n_frames):
                ids.append(doc_id)
                fidx.append(i)
                frames.append(payload[i * step : (i + 1) * step])
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )


def embed_bytes(payload_col: str = "frame_bytes", dim: int = 16):
    """Deterministic fake feature extractor: bytes -> float vector (stub
    for batched model inference; at scale this is the GPU actor stage)."""

    def embed(batch: pa.Table) -> pa.Table:
        vecs = []
        for payload in batch[payload_col].to_pylist():
            digest = hashlib.sha256(payload or b"").digest()
            v = np.frombuffer(digest[: dim * 2], dtype=np.uint16).astype(np.float32)
            vecs.append((v / 65535.0).tolist())
        return batch.append_column(
            "feature", pa.array(vecs, pa.list_(pa.float32()))
        )

    return embed


class FakeResizer:
    """Actor-pool resize/feature stage chained after the decoder: fits
    (width, height) into a target box preserving aspect ratio and emits a
    deterministic digest of the "resized" payload. Real thumbnailing goes
    in ``_resize_one`` on a cluster with PIL; the plumbing (actor setup in
    __init__, vectorized metadata math, schema) is the tested part."""

    def __init__(self, box: int = 64):
        self.box = box  # per-actor setup (a real stage would allocate here)

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.box / np.maximum(w, h))
        rw = np.maximum(1, np.round(w * scale)).astype(np.int64)
        rh = np.maximum(1, np.round(h * scale)).astype(np.int64)
        digests = [
            hashlib.sha1(d.encode() + b":" + str(a).encode() + b"x" + str(b).encode())
            .hexdigest()[:16]
            for d, a, b in zip(batch["content_digest"].to_pylist(), rw, rh)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "resized_w": pa.array(rw, pa.int64()),
                "resized_h": pa.array(rh, pa.int64()),
                "resized_digest": pa.array(digests, pa.string()),
            }
        )


class PngPerceptualHasher:
    """Actor-pool REAL perceptual-hash stage: PNG payload column ->
    64-bit pHash (grayscale -> box-mean 32x32 -> 2-D DCT -> median
    threshold; functions/png.py). The DCT basis is built ONCE per actor
    in __init__ (the stateful-stage discipline: setup per actor, matmul
    per image). Decode failures carry an ``error`` column with a null
    hash instead of killing the task (ref bug B4 discipline)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        from glue_etl_pipeline_ray.functions import png  # once per actor

        self.payload_col = payload_col
        self.id_col = id_col
        self._decode = png.png_decode
        self._phash = png.phash64
        self._basis = png.dct2_basis(32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes: list[int | None] = []
        errors: list[str | None] = []
        for payload in batch[self.payload_col].to_pylist():
            try:
                hashes.append(
                    self._phash(self._decode(payload or b""), self._basis)
                )
                errors.append(None)
            except Exception as e:  # noqa: BLE001 — corrupt payload
                hashes.append(None)
                errors.append(f"decode: {e}")
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "phash": pa.array(hashes, pa.uint64()),
                "error": pa.array(errors, pa.string()),
            }
        )
