"""GIF (functions/gif_codec.py) and BMP (functions/multimodal.py)
codecs: encoder/decoder round-trips across shapes, palettes, interlace
and raster orientations, LZW width-growth guard, rejection posture,
and the Spark stats kernels. The registry queries
multimodal_gif_pixels / multimodal_bmp_pixels replay planted pixel
statistics arithmetically in DuckDB."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_mlops_spark.functions.gif_codec import (
    decode_gif_pixels,
    encode_gif,
)
from data_pipeline_mlops_spark.functions.multimodal import (
    bmp_pixel_stats,
    decode_bmp_pixels,
    encode_bmp,
    gif_pixel_stats,
)

PAL64 = np.stack(
    [np.arange(64) * 4, np.arange(64) * 2, np.arange(64)], axis=1
).astype(np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (8, 8), (13, 7), (33, 5)])
def test_gif_round_trip_exact(shape):
    idx = np.random.RandomState(sum(shape)).randint(0, 64, shape).astype(
        np.uint8
    )
    px, n_frames = decode_gif_pixels(encode_gif([idx], PAL64))
    assert n_frames == 1
    assert px.shape == shape + (3,)
    assert (px == PAL64[idx]).all()


def test_gif_interlaced_depass_pixel_exact():
    idx = np.random.RandomState(1).randint(0, 64, (16, 9)).astype(np.uint8)
    px, _ = decode_gif_pixels(encode_gif([idx], PAL64, interlace_first=True))
    assert (px == PAL64[idx]).all()


def test_gif_multi_frame_counts_and_first_frame_pixels():
    a = np.random.RandomState(2).randint(0, 64, (10, 6)).astype(np.uint8)
    b = ((a.astype(int) + 1) % 64).astype(np.uint8)
    px, n_frames = decode_gif_pixels(encode_gif([a, b, b], PAL64))
    assert n_frames == 3
    assert (px == PAL64[a]).all()


def test_gif_small_palette_width_growth_guard():
    # min_code_size=2 -> clear=4: the clear cadence must prevent the
    # decoder's table from forcing a code width the encoder never used
    pal4 = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    idx = np.random.RandomState(3).randint(0, 4, (25, 11)).astype(np.uint8)
    px, _ = decode_gif_pixels(encode_gif([idx], pal4))
    assert (px == pal4[idx]).all()


def test_gif_rejection_posture():
    idx = np.zeros((4, 4), np.uint8)
    good = encode_gif([idx], PAL64)
    assert decode_gif_pixels(good[:-10]) is None  # truncated
    assert decode_gif_pixels(b"GIF89a") is None
    assert decode_gif_pixels(b"not a gif") is None
    assert decode_gif_pixels(b"") is None
    assert decode_gif_pixels(None) is None


def _splice_gce(blob: bytes, *, flags: int) -> bytes:
    """Insert a Graphic Control Extension immediately before the first
    image separator of a planted encode_gif blob (which begins right
    after the 13-byte header + global color table — searching for the
    0x2C byte would false-match palette bytes)."""
    gct_n = 2 << (blob[10] & 0x07)
    at = 13 + 3 * gct_n
    assert blob[at] == 0x2C
    gce = b"\x21\xf9\x04" + bytes([flags, 0, 0, 0]) + b"\x00"
    return blob[:at] + gce + blob[at:]


def test_gif_gce_transparent_first_frame_rejected():
    """ADVICE r8: a GCE with the transparency flag set on the first
    frame must return None (background compositing is not modeled),
    not the palette color at the transparent index; a GCE WITHOUT the
    flag must not change the decode."""
    idx = (np.arange(16, dtype=np.uint8) % 64).reshape(4, 4)
    plain = encode_gif([idx], PAL64)
    want, _ = decode_gif_pixels(plain)

    opaque_gce = _splice_gce(plain, flags=0x04)  # disposal bits only
    got = decode_gif_pixels(opaque_gce)
    assert got is not None
    assert np.array_equal(got[0], want)

    transparent = _splice_gce(plain, flags=0x05)  # disposal + bit 0
    assert decode_gif_pixels(transparent) is None


def test_gif_lzw_min_code_size_guard_returns_none():
    """ADVICE r8: _lzw_decode must honor its None-on-malformed
    contract for min_code_size beyond the GIF-spec max (9-11 used to
    raise ValueError building the root table), and for the out-of-spec
    small values."""
    from data_pipeline_mlops_spark.functions.gif_codec import _lzw_decode

    for mcs in (0, 1, 9, 10, 11, 12, 255):
        assert _lzw_decode(b"\x00\x01\x02", mcs, 4) is None


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_round_trips_exact(top_down):
    rng = np.random.RandomState(5 + top_down)
    rgb = rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
    out = decode_bmp_pixels(encode_bmp(rgb, top_down=top_down))
    assert (out == rgb).all()
    idx = rng.randint(0, 64, (6, 10)).astype(np.uint8)
    out = decode_bmp_pixels(encode_bmp(idx, palette=PAL64, top_down=top_down))
    assert (out == PAL64[idx]).all()


def test_bmp_orientation_is_pixel_exact_not_just_multiset():
    # an asymmetric image distinguishes correct row order from a flip
    rgb = np.zeros((2, 1, 3), np.uint8)
    rgb[0] = (10, 10, 10)
    rgb[1] = (200, 200, 200)
    for top_down in (False, True):
        out = decode_bmp_pixels(encode_bmp(rgb, top_down=top_down))
        assert (out == rgb).all(), top_down


def test_bmp_rejection_posture():
    rgb = np.zeros((3, 3, 3), np.uint8)
    good = encode_bmp(rgb)
    assert decode_bmp_pixels(good[:-5]) is None
    assert decode_bmp_pixels(b"BMxx") is None
    assert decode_bmp_pixels(b"") is None
    assert decode_bmp_pixels(None) is None


def test_stats_kernels(spark):
    idx = np.array([[0, 63], [7, 7]], np.uint8)  # lumas 0,147,16,16
    gif_blob = encode_gif([idx, idx], PAL64)
    bmp_blob = encode_bmp(PAL64[idx])
    gif_df = spark.createDataFrame(
        [(1, gif_blob), (2, b"junk")], "media_id long, content binary"
    )
    out = {r["media_id"]: r for r in gif_pixel_stats(gif_df).collect()}
    assert out[1]["n_pixels"] == 4 and out[1]["n_frames"] == 2
    assert out[1]["sum_luma"] == 0 + 147 + 16 + 16
    assert out[1]["min_luma"] == 0 and out[1]["max_luma"] == 147
    assert out[2]["n_pixels"] is None and out[2]["n_frames"] is None
    bmp_df = spark.createDataFrame(
        [(1, bmp_blob), (2, b"")], "media_id long, content binary"
    )
    out = {r["media_id"]: r for r in bmp_pixel_stats(bmp_df).collect()}
    assert out[1]["sum_luma"] == 179 and out[1]["max_luma"] == 147
    assert out[2]["sum_luma"] is None
