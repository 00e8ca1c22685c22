"""Baseline JPEG codec (functions/jpeg_codec.py): spec-level checks
(Annex K quality scaling, canonical Huffman table construction,
EXTEND), encoder/decoder round-trips across gray/color, 4:4:4/4:2:0,
restart markers and byte-stuffing, DC-only exactness (the oracle
contract of `multimodal_jpeg_pixels`), and malformed input."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_mlops_spark.functions.jpeg_codec import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_LUMA,
    _build_decode_table,
    _build_encode_table,
    _extend,
    decode_jpeg_pixels,
    encode_jpeg_baseline,
    scaled_quant,
)


def test_quality_scaling_matches_public_formula():
    # q=50 is Annex K verbatim; q=100 clamps to all-ones
    assert (scaled_quant(QUANT_LUMA, 50) == QUANT_LUMA).all()
    assert (scaled_quant(QUANT_LUMA, 100) == 1).all()
    # q=25 doubles the table (5000/25 = 200)
    expect = np.clip((QUANT_LUMA * 200 + 50) // 100, 1, 255)
    assert (scaled_quant(QUANT_LUMA, 25) == expect).all()


def test_canonical_huffman_tables_prefix_free_and_complete():
    for bits, vals in (
        (DC_LUMA_BITS, DC_LUMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS),
    ):
        dec = _build_decode_table(bits, vals)
        assert len(dec) == sum(bits) == len(vals)
        # prefix-free: no code is a prefix of a longer one
        codes = sorted(dec, key=lambda kc: kc[0])
        for i, (n1, c1) in enumerate(codes):
            for n2, c2 in codes[i + 1:]:
                if n2 > n1:
                    assert (c2 >> (n2 - n1)) != c1, (n1, c1, n2, c2)
        enc = _build_encode_table(bits, vals)
        assert {enc[s] for s in enc} == set(dec)


def test_extend_spec_examples():
    # T.81 F.2.2.1: t-bit value with MSB 0 maps negative
    assert _extend(0, 0) == 0
    assert _extend(1, 1) == 1
    assert _extend(0, 1) == -1
    assert _extend(0b011, 3) == -4
    assert _extend(0b100, 3) == 4
    assert _extend(0b111, 3) == 7
    assert _extend(0b000, 3) == -7


def test_dc_only_even_blocks_decode_exactly():
    # the multimodal_jpeg_pixels oracle contract: even-valued
    # constant blocks at quality 50 survive quantization bit-for-bit
    img = np.zeros((16, 24), np.uint8)
    vals = [0, 2, 64, 126, 128, 254]
    for b, v in enumerate(vals):
        my, mx = b // 3, b % 3
        img[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = v
    for rst in (0, 1, 2):
        out = decode_jpeg_pixels(
            encode_jpeg_baseline(img, quality=50, restart_interval=rst)
        )
        assert out is not None
        assert (out[:, :, 0] == img).all()


@pytest.mark.parametrize("shape", [(8, 8), (24, 17), (5, 3), (16, 40)])
def test_gray_round_trip_quality_100(shape):
    img = np.random.RandomState(hash(shape) % 2**31).randint(
        0, 256, shape
    ).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg_baseline(img, quality=100))
    assert out.shape == (*shape, 1)
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2  # IDCT float rounding only


def test_color_round_trip_smooth():
    yy, xx = np.mgrid[0:32, 0:40]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg_baseline(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    assert err.mean() < 3


def test_420_subsampled_round_trip_and_odd_dims():
    yy, xx = np.mgrid[0:33, 0:41]  # not MCU-aligned on purpose
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    for rst in (0, 3):
        out = decode_jpeg_pixels(
            encode_jpeg_baseline(
                img, quality=95, subsample=True, restart_interval=rst
            )
        )
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 6  # chroma is 2x2-averaged


def test_byte_stuffing_occurs_and_decodes():
    # high-entropy data reliably produces 0xFF bytes in the entropy
    # stream; count stuffed pairs to prove the path is exercised
    img = np.random.RandomState(7).randint(0, 256, (40, 40)).astype(
        np.uint8
    )
    blob = encode_jpeg_baseline(img, quality=100)
    scan_start = blob.find(b"\xff\xda")
    assert blob[scan_start:].count(b"\xff\x00") > 0
    out = decode_jpeg_pixels(blob)
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2


def test_rejects_progressive_and_malformed():
    img = np.full((8, 8), 100, np.uint8)
    blob = bytearray(encode_jpeg_baseline(img))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    assert decode_jpeg_pixels(bytes(blob)) is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_pixels(b"not a jpeg") is None
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(None) is None
    good = encode_jpeg_baseline(img)
    assert decode_jpeg_pixels(good[:20]) is None  # truncated


def test_stats_kernel(spark):
    from data_pipeline_mlops_spark.functions.multimodal import (
        jpeg_pixel_stats,
    )

    img = np.full((8, 16), 200, np.uint8)
    img[:, 8:] = 100
    rows = [
        (1, encode_jpeg_baseline(img, quality=50)),
        (2, b"not a jpeg"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in jpeg_pixel_stats(df).collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 8
    assert out[1]["sum_luma"] == 64 * (200 + 100)
    assert out[1]["min_luma"] == 100 and out[1]["max_luma"] == 200
    assert out[2]["n_pixels"] is None


def test_fill_bytes_between_markers_decode():
    # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    # bytes. Insert fill runs before every table/frame marker and
    # assert the decode is byte-identical to the clean blob's.
    img = np.random.RandomState(11).randint(0, 256, (16, 16)).astype(
        np.uint8
    )
    blob = encode_jpeg_baseline(img, quality=90)
    ref = decode_jpeg_pixels(blob)
    padded = bytearray()
    padded += blob[:2]  # SOI
    pos = 2
    scan_start = blob.find(b"\xff\xda")
    while pos < scan_start:
        assert blob[pos] == 0xFF
        import struct as _s

        (seglen,) = _s.unpack(">H", blob[pos + 2:pos + 4])
        padded += b"\xff\xff\xff"  # two fill bytes + marker prefix
        padded += blob[pos + 1:pos + 2 + seglen]
        pos += 2 + seglen
    padded += blob[pos:]  # SOS + entropy stream untouched
    out = decode_jpeg_pixels(bytes(padded))
    assert out is not None and (out == ref).all()


def test_multi_scan_first_sos_subset_returns_none():
    # A non-interleaved baseline JPEG whose first SOS covers only Y of
    # a 3-component frame must return None (unsupported), not decode a
    # 1-channel image as if the file were grayscale.
    img = np.random.RandomState(3).randint(0, 256, (8, 8, 3)).astype(
        np.uint8
    )
    blob = encode_jpeg_baseline(img, quality=90)
    sos = blob.find(b"\xff\xda")
    import struct as _s

    (seglen,) = _s.unpack(">H", blob[sos + 2:sos + 4])
    seg = blob[sos + 4:sos + 2 + seglen]
    ns = seg[0]
    assert ns == 3
    # rebuild SOS with ns=1: first (cs, td/ta) pair + Ss/Se/AhAl tail
    new_seg = bytes([1]) + seg[1:3] + seg[1 + 2 * ns:]
    new_sos = b"\xff\xda" + _s.pack(">H", 2 + len(new_seg)) + new_seg
    patched = blob[:sos] + new_sos + blob[sos + 2 + seglen:]
    assert decode_jpeg_pixels(patched) is None
