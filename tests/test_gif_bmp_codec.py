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


# -- MP3 frame-header walk (round 9) ----------------------------------------

def test_mp3_walker_cbr_vbr_id3_and_mpeg2():
    from data_pipeline_mlops_spark.functions.multimodal import (
        encode_mp3_planted,
        parse_mp3_frames,
    )

    m = parse_mp3_frames(
        encode_mp3_planted(n_frames=5, sr_idx=0, bitrate_indices=[9])
    )
    assert m == {
        "n_frames": 5, "sample_rate": 44100, "channels": 2,
        "bitrate_min_kbps": 128, "bitrate_max_kbps": 128,
        "is_vbr": False, "duration_ms": 5 * 1152 * 1000 // 44100,
    }
    m = parse_mp3_frames(
        encode_mp3_planted(
            n_frames=4, sr_idx=2, mono=True,
            bitrate_indices=[5, 11], id3_size=17,
        )
    )
    assert (m["channels"], m["sample_rate"]) == (1, 32000)
    assert m["is_vbr"] and (m["bitrate_min_kbps"], m["bitrate_max_kbps"]) == (64, 192)
    # MPEG-2: half samplerate, 576 samples/frame, the V2 bitrate table
    m = parse_mp3_frames(
        encode_mp3_planted(n_frames=3, sr_idx=1, bitrate_indices=[7], mpeg2=True)
    )
    assert m["sample_rate"] == 24000
    assert m["duration_ms"] == 3 * 576 * 1000 // 24000


def test_mp3_walker_rejection_posture():
    from data_pipeline_mlops_spark.functions.multimodal import (
        encode_mp3_planted,
        parse_mp3_frames,
    )

    assert parse_mp3_frames(b"") is None
    assert parse_mp3_frames(None) is None
    assert parse_mp3_frames(b"\xff\xfb") is None          # truncated header
    assert parse_mp3_frames(b"not audio at all") is None
    # malformed syncsafe ID3 size (bit 7 set)
    assert parse_mp3_frames(b"ID3\x04\x00\x00\x00\x00\x00\xff") is None
    good = bytearray(encode_mp3_planted(n_frames=2, sr_idx=0, bitrate_indices=[9]))
    free = bytearray(good); free[2] &= 0x0F               # bitrate idx 0
    assert parse_mp3_frames(bytes(free)) is None
    trunc = bytes(good[:-1])                              # torn last frame
    assert parse_mp3_frames(trunc) is None
    switch = bytearray(good)
    # second frame's samplerate index flipped: rate switch mid-stream
    flen = 144_000 * 128 // 44100
    switch[flen + 2] = (switch[flen + 2] & ~0x0C) | (0x01 << 2)
    assert parse_mp3_frames(bytes(switch)) is None


def test_mp3_walker_id3_footer_and_lenient_tail():
    """ADVICE r9: the ID3v2.4 footer flag (b[5] & 0x10) adds a 10-byte
    footer after the tag body that is NOT counted in the syncsafe
    size — the walker must skip it to land on the first frame sync;
    and trailing non-frame bytes (ID3v1 "TAG" trailers) are tolerated
    by design: parse stops at the desync and reports frames so far."""
    from data_pipeline_mlops_spark.functions.multimodal import (
        encode_mp3_planted,
        parse_mp3_frames,
    )

    with_footer = encode_mp3_planted(
        n_frames=4, sr_idx=0, bitrate_indices=[9],
        id3_size=23, id3_footer=True,
    )
    m = parse_mp3_frames(with_footer)
    assert m is not None and m["n_frames"] == 4
    # without the footer skip the walker would start 10 bytes early,
    # inside the zeroed tag body — no sync there, so n_frames==0 → None
    no_skip = bytearray(with_footer)
    no_skip[5] = 0x00  # lie: clear the flag but keep the footer bytes
    assert parse_mp3_frames(bytes(no_skip)) is None
    # lenient tail: ID3v1 trailer after valid frames → full stats
    good = encode_mp3_planted(n_frames=3, sr_idx=0, bitrate_indices=[9])
    tagged = good + b"TAG" + b"\x00" * 125
    assert parse_mp3_frames(tagged) == parse_mp3_frames(good)


def test_mp3_metadata_spark_kernel_null_on_malformed(spark):
    import pandas as pd

    from data_pipeline_mlops_spark.functions.multimodal import (
        encode_mp3_planted,
        mp3_metadata,
    )

    good = encode_mp3_planted(n_frames=3, sr_idx=0, bitrate_indices=[9])
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "content": [good, b"junk"]})
    )
    rows = {r["media_id"]: r for r in mp3_metadata(df).collect()}
    assert rows[1]["n_frames"] == 3 and rows[1]["sample_rate"] == 44100
    assert rows[2]["n_frames"] is None and rows[2]["duration_ms"] is None


# -- perceptual dHash (round 9) ----------------------------------------------

def test_dhash64_matches_fraction_exact_reference():
    """Integer cross-multiplied block-mean comparisons must equal an
    exact rational-mean reference on arbitrary (non-divisible)
    rasters."""
    from fractions import Fraction

    from data_pipeline_mlops_spark.functions.multimodal import (
        DHASH_COLS,
        DHASH_ROWS,
        dhash64,
    )

    def ref(a):
        h, w = a.shape[:2]
        luma = (a[:, :, 0].astype(np.int64) + a[:, :, 1] + a[:, :, 2]) // 3
        rs = np.array_split(np.arange(h), DHASH_ROWS)
        cs = np.array_split(np.arange(w), DHASH_COLS)
        means = [
            [
                Fraction(
                    int(luma[r[0]:r[-1] + 1, c[0]:c[-1] + 1].sum()),
                    int(luma[r[0]:r[-1] + 1, c[0]:c[-1] + 1].size),
                )
                for c in cs
            ]
            for r in rs
        ]
        fp, bit = 0, 0
        for r in range(DHASH_ROWS):
            for c in range(DHASH_COLS - 1):
                if means[r][c] > means[r][c + 1]:
                    fp |= 1 << bit
                bit += 1
        return fp

    rng = np.random.RandomState(0)
    for shape in [(7, 10), (13, 17), (28, 40), (100, 33), (29, 41)]:
        a = rng.randint(0, 256, shape + (3,)).astype(np.uint8)
        got = dhash64(a)
        assert got == ref(a), shape
        assert 0 <= got < (1 << 63)
    assert dhash64(np.zeros((3, 5, 3), np.uint8)) is None  # below grid


def test_dhash_invariant_to_reencoding_and_sensitive_to_content():
    """The perceptual property: the same raster through different
    encodings (BMP orientations) hashes identically; a genuinely
    different raster does not."""
    from data_pipeline_mlops_spark.functions.multimodal import (
        decode_bmp_pixels,
        dhash64,
    )

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (28, 40, 3)).astype(np.uint8)
    h_up = dhash64(decode_bmp_pixels(encode_bmp(rgb, top_down=False)))
    h_dn = dhash64(decode_bmp_pixels(encode_bmp(rgb, top_down=True)))
    assert h_up == h_dn == dhash64(rgb)
    other = rng.randint(0, 256, (28, 40, 3)).astype(np.uint8)
    assert dhash64(other) != h_up


def test_dhash_near_dup_pairs_equals_brute_force(spark):
    """The banded pigeonhole join must find EXACTLY the brute-force
    pair set within max_hamming (pigeonhole completeness + popcount
    verify)."""
    import itertools

    from data_pipeline_mlops_spark.functions.multimodal import (
        dhash_near_dup_pairs,
    )

    rng = np.random.RandomState(3)
    fps = [int(rng.randint(0, 1 << 62)) for _ in range(30)]
    # plant near pairs: flip 1-3 bits of some fingerprints
    for i in (5, 11, 17):
        flipped = fps[i]
        for b in rng.choice(63, size=(i % 3) + 1, replace=False):
            flipped ^= 1 << int(b)
        fps.append(flipped)
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fps)], "media_id long, dhash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dhash_near_dup_pairs(df, max_hamming=3).collect()
    }
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(fps), 2):
        hd = bin(a ^ b).count("1")
        if hd <= 3:
            want.add((i, j, hd))
    assert got == want and len(want) >= 3


def test_image_dhash_spark_kernel_null_on_malformed(spark):
    import pandas as pd

    from data_pipeline_mlops_spark.functions.multimodal import (
        decode_bmp_pixels,
        image_dhash,
    )

    rgb = (np.arange(28 * 40 * 3) % 256).astype(np.uint8).reshape(28, 40, 3)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2, 3],
             "content": [encode_bmp(rgb), b"junk",
                         encode_bmp(np.zeros((3, 3, 3), np.uint8))]}
        )
    )
    rows = {r["media_id"]: r["dhash"] for r in image_dhash(
        df, decode=decode_bmp_pixels
    ).collect()}
    assert rows[1] is not None
    assert rows[2] is None          # undecodable
    assert rows[3] is None          # below the hash grid


# -- perceptual audio energy hash (round 9) ----------------------------------

def test_audio_energy_hash_volume_invariant_and_content_sensitive():
    """The perceptual property: energies scale quadratically under a
    volume change, so every adjacent-window comparison — and the hash
    — is invariant under positive scaling; a genuinely different
    waveform hashes differently."""
    from data_pipeline_mlops_spark.functions.multimodal import (
        audio_energy_hash,
    )

    rng = np.random.RandomState(11)
    s = rng.randint(-5000, 5000, 256).astype(np.int64)
    h = audio_energy_hash(s)
    assert h == audio_energy_hash(s * 3)  # volume up: same envelope
    assert h == audio_energy_hash(np.stack([s, s], axis=1))  # stereo dup
    other = rng.randint(-5000, 5000, 256).astype(np.int64)
    assert audio_energy_hash(other) != h
    assert audio_energy_hash(np.zeros(32, np.int64)) is None  # < windows


def test_audio_energy_hash_no_int64_overflow_at_32bit():
    """32-bit full-scale samples squared exceed int64 per window —
    the python-int energy path must stay exact."""
    from data_pipeline_mlops_spark.functions.multimodal import (
        audio_energy_hash,
    )

    loud = np.full(128, 2_000_000_000, dtype=np.int64)
    loud[:2] = -2_000_000_000  # same energy: all comparisons equal
    assert audio_energy_hash(loud) == 0


def test_audio_ehash_spark_kernel_round_trip_and_null(spark):
    import pandas as pd

    from data_pipeline_mlops_spark.functions.multimodal import (
        audio_ehash,
        audio_energy_hash,
        encode_wav,
    )

    s = ((np.arange(128) + 7) * 31 % 199 - 99).astype(np.int64)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2],
             "content": [encode_wav(s, sample_rate=8000, bits=16),
                         b"not audio"]}
        )
    )
    rows = {r["media_id"]: r["ehash"] for r in audio_ehash(df).collect()}
    assert rows[1] == audio_energy_hash(s)
    assert rows[2] is None
