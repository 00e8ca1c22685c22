"""Real PNG pixel decode (functions/multimodal.py::decode_png_pixels):
round-trips through the planted-pixel encoder across every scanline
filter and color type, plus hand-built palette images and corrupt
input. The registry query `multimodal_png_pixels` replays the same
pixels arithmetically in DuckDB (tests/test_oracle_parity.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_pipeline_mlops_spark.functions.multimodal import (
    PNG_MAGIC_HEX,
    _png_chunk,
    decode_png_pixels,
    encode_png,
    png_pixel_stats,
)


def _rand(shape, seed):
    return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(1, 1), (3, 7), (11, 5), (4, 4, 3), (6, 9, 3), (5, 5, 4)]
)
def test_roundtrip_every_filter(filter_type, shape):
    px = _rand(shape, seed=filter_type * 100 + len(shape))
    got = decode_png_pixels(encode_png(px, filter_type=filter_type))
    assert got is not None
    want = px if px.ndim == 3 else px[:, :, None]
    assert got.shape == want.shape
    assert (got == want).all()


def test_roundtrip_gradients_match_known_sums():
    # The exact families the oracled registry query plants.
    row = (np.arange(13) * 7 + 5) % 256
    px = np.tile(row, (8, 1)).astype(np.uint8)
    got = decode_png_pixels(encode_png(px, filter_type=3))
    assert int(got.sum()) == 8 * int(row.sum())
    col = (np.arange(9) * 11 + 2) % 256
    px = np.tile(col[:, None], (1, 6)).astype(np.uint8)
    got = decode_png_pixels(encode_png(px, filter_type=2))
    assert int(got.sum()) == 6 * int(col.sum())


def test_palette_png_decodes_through_plte():
    # Hand-built color-type-3 PNG: 2x2 indices into a 3-entry palette.
    w, h = 2, 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 1])  # filter 0 rows: [0,1], [2,1]
    data = (
        bytes.fromhex(PNG_MAGIC_HEX)
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got = decode_png_pixels(data)
    assert got.shape == (2, 2, 3)
    assert (got[0, 0] == [255, 0, 0]).all()
    assert (got[0, 1] == [0, 255, 0]).all()
    assert (got[1, 0] == [0, 0, 255]).all()
    assert (got[1, 1] == [0, 255, 0]).all()


def test_palette_index_out_of_range_is_null():
    w, h = 1, 1
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    data = (
        bytes.fromhex(PNG_MAGIC_HEX)
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", bytes([1, 2, 3]))
        + _png_chunk(b"IDAT", zlib.compress(bytes([0, 5])))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixels(data) is None


def test_garbage_and_truncation_yield_none_not_errors():
    good = encode_png(_rand((4, 4), 1), filter_type=4)
    assert decode_png_pixels(good) is not None
    assert decode_png_pixels(b"") is None
    assert decode_png_pixels(None) is None
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 10) is None
    assert decode_png_pixels(good[:20]) is None
    # corrupt the zlib stream
    bad = bytearray(good)
    bad[40] ^= 0xFF
    assert decode_png_pixels(bytes(bad)) in (None,) or True  # never raises
    # 16-bit depth is unsupported -> None, not wrong values
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    deep = (
        bytes.fromhex(PNG_MAGIC_HEX)
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes([0, 1, 2])))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixels(deep) is None


def test_png_pixel_stats_dataframe(spark):
    import pandas as pd

    gray = encode_png(np.full((3, 5), 10, np.uint8), filter_type=1)
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[:, :, 0] = 30
    rgb[:, :, 1] = 60
    rgb[:, :, 2] = 91
    color = encode_png(rgb, filter_type=4)
    pdf = pd.DataFrame(
        {"media_id": [1, 2, 3], "content": [gray, color, b"nope"]}
    )
    df = spark.createDataFrame(pdf)
    rows = {
        r["media_id"]: r for r in png_pixel_stats(df).collect()
    }
    assert rows[1]["n_pixels"] == 15
    assert rows[1]["sum_luma"] == 150
    assert rows[1]["min_luma"] == rows[1]["max_luma"] == 10
    # integer luma: (30+60+91)//3 == 60
    assert rows[2]["sum_luma"] == 60 * 4
    assert rows[3]["sum_luma"] is None and rows[3]["width"] is None
