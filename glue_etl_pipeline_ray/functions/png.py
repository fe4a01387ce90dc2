"""Real PNG codec, dependency-free (stdlib zlib/struct + numpy).

The container ships no image library, so the multimodal decode stage's
REAL path implements PNG itself: full chunk parsing, zlib inflate, and
all five scanline filters (None/Sub/Up/Average/Paeth) for 8-bit
grayscale / gray+alpha / RGB / RGBA, non-interlaced — the format every
major encoder emits by default. The encoder writes filter-0 scanlines
(valid PNG, accepted by any reader) and exists so fixtures and
round-trip tests need no external tooling.

Sub and Up filters are vectorized (Sub is a per-channel prefix sum mod
256; Up is a previous-row add); Average and Paeth are sequential by
definition (each pixel depends on the reconstructed left neighbor) and
fall back to a per-pixel loop — encoders that emit them are optimizing
for ratio, not the common fast path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to a ``(height, width, channels)`` uint8 array."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, []
    w = h = channels = None
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + length]
        pos += length + 4  # skip CRC
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            channels = _CHANNELS[ctype]
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    bpp = channels
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1)
        if f == 0:  # None
            rec = line.copy()
        elif f == 1:  # Sub: prefix sum per channel, mod 256
            rec = (
                np.cumsum(line.reshape(w, bpp), axis=0, dtype=np.int64) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            rec = line + prev  # uint8 wraparound IS the mod-256 add
        elif f == 3:  # Average (sequential: needs reconstructed left)
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth (sequential)
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, channels)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode a ``(h, w)`` or ``(h, w, channels)`` uint8 array as PNG
    (filter-0 scanlines)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise ValueError("expected uint8 array of shape (h, w[, channels])")
    h, w, channels = arr.shape
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[channels], 0, 0, 0)
    flat = np.ascontiguousarray(arr).reshape(h, w * channels)
    scanlines = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, level))
        + _chunk(b"IEND", b"")
    )


# BT.601 luma weights; grayscale/alpha handled by channel count
_LUMA = np.array([0.299, 0.587, 0.114])


def histogram_embed(arr: np.ndarray, bins_per_channel: int = 8) -> np.ndarray:
    """REAL image feature vector: per-channel intensity histograms over
    the RGB planes, L1-normalized and concatenated (3 x bins floats) —
    the classic color-signature embedding. Deterministic, so similarity
    search over it is testable against a pre-encode oracle."""
    h, w, c = arr.shape
    rgb = arr[:, :, :3] if c >= 3 else np.repeat(arr[:, :, :1], 3, axis=2)
    n = float(h * w)
    # bin index = value * bins // 256 (exact integer binning)
    feats = [
        np.bincount(
            (rgb[:, :, ch].ravel().astype(np.int64) * bins_per_channel) // 256,
            minlength=bins_per_channel,
        )
        for ch in range(3)
    ]
    return (np.concatenate(feats) / n).astype(np.float32)


def pixel_stats(arr: np.ndarray) -> dict:
    """Deterministic pixel statistics (the decode stage's feature set):
    integer-scaled so engine and oracle compare exactly."""
    h, w, c = arr.shape
    rgb = arr[:, :, :3] if c >= 3 else np.repeat(arr[:, :, :1], 3, axis=2)
    luma = rgb.astype(np.float64) @ _LUMA
    return {
        "width": w,
        "height": h,
        "channels": c,
        "mean_luma_e6": int(round(luma.mean() * 1_000_000)),
        "pixel_sum": int(arr.sum(dtype=np.int64)),
    }


# --------------------------------------------------- perceptual hash


def dct2_basis(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n): ``D @ img @ D.T`` is the
    2-D DCT. Pure function of ``n`` — build once per actor, reuse per
    image (a 32x32 matmul pair per hash, no per-pixel Python)."""
    k = np.arange(n, dtype=np.float64)[:, None]
    x = np.arange(n, dtype=np.float64)[None, :]
    basis = np.cos((2.0 * x + 1.0) * k * np.pi / (2.0 * n)) * np.sqrt(2.0 / n)
    basis[0] /= np.sqrt(2.0)
    return basis


def phash64(
    arr: np.ndarray, basis: np.ndarray | None = None, size: int = 32
) -> int:
    """64-bit perceptual hash (classic pHash): grayscale -> box-mean
    resize to ``size``x``size`` (integral image, exact and vectorized;
    sub-``size`` inputs clamp to at-least-one-source-row, i.e. nearest)
    -> 2-D DCT-II -> top-left 8x8 low-frequency block -> median
    threshold (median over the 63 AC terms; the DC term compares
    against the same median) -> 64 bits, MSB-first.

    Deterministic: no RNG, float64 throughout, so engine runs and the
    pytest oracle agree bit-for-bit."""
    if basis is None:
        basis = dct2_basis(size)
    h, w, c = arr.shape
    rgb = arr[:, :, :3] if c >= 3 else np.repeat(arr[:, :, :1], 3, axis=2)
    luma = rgb.astype(np.float64) @ _LUMA
    # integral image -> exact box means per target cell
    integ = np.zeros((h + 1, w + 1), np.float64)
    integ[1:, 1:] = luma.cumsum(0).cumsum(1)
    yb = (np.arange(size + 1, dtype=np.int64) * h) // size
    xb = (np.arange(size + 1, dtype=np.int64) * w) // size
    y0, y1 = yb[:-1], np.maximum(yb[1:], yb[:-1] + 1)
    x0, x1 = xb[:-1], np.maximum(xb[1:], xb[:-1] + 1)
    y0 = np.minimum(y0, h - 1)
    y1 = np.minimum(y1, h)
    x0 = np.minimum(x0, w - 1)
    x1 = np.minimum(x1, w)
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float64)
    small = (
        integ[y1[:, None], x1[None, :]]
        - integ[y0[:, None], x1[None, :]]
        - integ[y1[:, None], x0[None, :]]
        + integ[y0[:, None], x0[None, :]]
    ) / area
    dct = basis @ small @ basis.T
    block = dct[:8, :8].ravel()
    med = np.median(block[1:])
    bits = block > med
    return int(np.packbits(bits).view(">u8")[0])
