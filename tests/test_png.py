"""Real PNG codec: encode/decode round-trips, all five scanline
filters, and the pixel-stat oracle for the media_decode_real query."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from glue_etl_pipeline_ray.functions.png import (
    PNG_SIGNATURE,
    _chunk,
    pixel_stats,
    png_decode,
    png_encode,
)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_channel_counts(channels):
    rng = np.random.default_rng(channels)
    arr = rng.integers(0, 256, (13, 7, channels), dtype=np.uint8)
    out = png_decode(png_encode(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_grayscale_2d_input():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = png_decode(png_encode(arr))
    assert np.array_equal(out[:, :, 0], arr)


def _encode_with_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Forward-filter each scanline with ``ftype`` (the test-side inverse
    of the decoder's defilter) and wrap in valid PNG chunks."""
    h, w, c = arr.shape
    flat = arr.reshape(h, w * c).astype(np.int64)
    stride, bpp = w * c, c
    lines = []
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = flat[y]
        left = np.r_[np.zeros(bpp, np.int64), cur[:-bpp]]
        upleft = np.r_[np.zeros(bpp, np.int64), prev[:-bpp]]
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - ((left + prev) >> 1)
        elif ftype == 4:
            p = left + prev - upleft
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, upleft)
            )
            filt = cur - pred
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c], 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_every_filter_type(ftype):
    rng = np.random.default_rng(ftype + 10)
    arr = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(_encode_with_filter(arr, ftype)), arr)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF not a png at all")
    good = png_encode(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        png_decode(good[: len(good) // 2])


def test_pixel_stats_known_values():
    arr = np.full((2, 3, 3), 100, np.uint8)
    st = pixel_stats(arr)
    assert st == {
        "width": 3, "height": 2, "channels": 3,
        "mean_luma_e6": 100_000_000, "pixel_sum": 100 * 2 * 3 * 3,
    }


def test_media_decode_real_matches_pixel_oracle(ray_session):
    """The query's decoded stats must equal stats computed directly from
    the pre-encode arrays (a true pixel-level oracle, not a re-run of the
    decoder), and corrupt payloads must dead-letter via ``error``."""
    from glue_etl_pipeline_ray.pipelines.queries import q_media_decode_real

    res = q_media_decode_real("/root/testdata/sf0.001").to_pandas()
    assert len(res) > 0
    expected_err = res["doc_id"] % 97 == 0
    assert (res["error"].notna() == expected_err).all()
    for _, row in res.iterrows():
        did = int(row["doc_id"])
        if did % 97 == 0:
            assert row["error"].startswith("decode:")
            continue
        rng = np.random.default_rng(did)
        h, w = 8 + did % 9, 8 + (did // 3) % 9
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        st = pixel_stats(arr)
        assert int(row["width"]) == st["width"]
        assert int(row["height"]) == st["height"]
        assert int(row["mean_luma_e6"]) == st["mean_luma_e6"]
        assert int(row["pixel_sum"]) == st["pixel_sum"]


def test_histogram_embed_exact():
    from glue_etl_pipeline_ray.functions.png import histogram_embed

    # a 2x2 image with known bin landings (bins of width 32 for bins=8)
    arr = np.array(
        [[[0, 255, 128], [31, 224, 128]],
         [[32, 255, 100], [255, 0, 100]]], dtype=np.uint8
    )
    f = histogram_embed(arr, bins_per_channel=8)
    assert f.shape == (24,)
    assert abs(f.sum() - 3.0) < 1e-6  # each channel L1-normalized
    r = f[:8]
    assert r[0] == 0.5 and r[1] == 0.25 and r[7] == 0.25  # 0,31 | 32 | 255


def test_media_embed_real_matches_pixel_oracle(ray_session):
    from glue_etl_pipeline_ray.functions.png import histogram_embed
    from glue_etl_pipeline_ray.pipelines.queries import q_media_embed_real

    res = q_media_embed_real("/root/testdata/sf0.001").to_pandas()
    assert len(res) > 0
    for _, row in res.head(25).iterrows():
        did = int(row["doc_id"])
        if did % 97 == 0:
            assert row["error"] is not None and row["feature"] is None
            continue
        rng = np.random.default_rng(did)
        h, w = 8 + did % 9, 8 + (did // 3) % 9
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        expect = histogram_embed(arr)
        assert np.allclose(np.asarray(row["feature"]), expect, atol=1e-6)


def test_decode_real_dispatch():
    from glue_etl_pipeline_ray.functions.multimodal import decode_real

    arr = np.random.default_rng(1).integers(0, 256, (5, 6, 4), dtype=np.uint8)
    out = decode_real(png_encode(arr))
    assert out["width"] == 6 and out["height"] == 5 and out["channels"] == 4
    assert np.array_equal(out["pixels"], arr)
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0 jpeg-ish")
