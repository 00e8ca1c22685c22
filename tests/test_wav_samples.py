"""Real PCM WAV sample decode (functions/multimodal.py::
decode_wav_samples): encoder/decoder round-trips across every
bit-depth branch, chunk-walk robustness (LIST chunk, word-alignment
pad), and malformed input. The registry query
`multimodal_wav_samples` replays planted waveform statistics
arithmetically in DuckDB (tests/test_oracle_parity.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_pipeline_mlops_spark.functions.multimodal import (
    decode_wav_samples,
    encode_wav,
    wav_sample_stats,
)


def _rand(n, ch, bits, seed):
    hi = 2 ** (bits - 1) - 1
    r = np.random.RandomState(seed).randint(-hi - 1, hi + 1, (n, ch))
    return r.astype(np.int64)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("ch", [1, 2, 3])
@pytest.mark.parametrize("extra", [False, True])
def test_round_trip_exact(bits, ch, extra):
    s = _rand(17, ch, bits, seed=bits * 10 + ch)
    blob = encode_wav(s, sample_rate=12345, bits=bits, extra_chunk=extra)
    out = decode_wav_samples(blob)
    assert out is not None
    px, rate = out
    assert rate == 12345
    assert px.shape == (17, ch)
    assert (px == s).all()


def test_mono_1d_input_and_odd_body_padding():
    # 3 frames of 8-bit mono = 3-byte data chunk; RIFF pads to word
    blob = encode_wav(np.array([1, -2, 3]), bits=8, extra_chunk=True)
    px, rate = decode_wav_samples(blob)
    assert (px[:, 0] == [1, -2, 3]).all()
    # the pad byte must be excluded from samples
    assert px.shape == (3, 1)


def test_chunk_order_data_before_fmt():
    # decoder is a WALK, not offset math: build data-before-fmt layout
    body = struct.pack("<3h", 7, -7, 7)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (
        b"data" + struct.pack("<I", len(body)) + body
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    px, rate = decode_wav_samples(blob)
    assert rate == 8000 and (px[:, 0] == [7, -7, 7]).all()


def test_rejects_non_pcm_and_malformed():
    s = np.array([1, 2, 3])
    blob = bytearray(encode_wav(s, bits=16))
    # flip format tag to 3 (IEEE float) — not PCM, must return None
    fmt_off = blob.find(b"fmt ") + 8
    blob[fmt_off:fmt_off + 2] = struct.pack("<H", 3)
    assert decode_wav_samples(bytes(blob)) is None
    assert decode_wav_samples(b"RIFFxxxxWAVE") is None
    assert decode_wav_samples(b"") is None
    assert decode_wav_samples(None) is None
    # truncated data chunk
    good = encode_wav(s, bits=16)
    assert decode_wav_samples(good[:-3]) is None


def test_stats_kernel(spark):
    rows = [
        (1, encode_wav(np.array([5, -5, 5, -5]), sample_rate=8000, bits=16)),
        (2, encode_wav(np.zeros(3, dtype=np.int64), bits=8)),
        (3, b"not a wav"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r["media_id"]: r
        for r in wav_sample_stats(df).collect()
    }
    assert out[1]["sum_abs"] == 20
    assert out[1]["zero_crossings"] == 3
    assert out[1]["min_sample"] == -5 and out[1]["max_sample"] == 5
    assert out[2]["sum_abs"] == 0 and out[2]["zero_crossings"] == 0
    assert out[3]["n_frames"] is None and out[3]["sum_abs"] is None


PCM_GUID = (
    b"\x01\x00\x00\x00\x00\x00\x10\x00"
    b"\x80\x00\x00\xaa\x00\x38\x9b\x71"
)


def _extensible_blob(samples, *, rate=48000, bits=16, guid=PCM_GUID):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) container: 40-byte fmt chunk
    with cbSize=22, valid-bits, channel mask, and a SubFormat GUID."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    body = s.astype("<i2").tobytes() if bits == 16 else (
        s.astype("<i4").tobytes()
    )
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 0xFFFE, ch, rate, rate * block, block, bits
    ) + struct.pack("<HHI", 22, bits, (1 << ch) - 1) + guid
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_extensible_pcm_decodes():
    s = _rand(13, 2, 16, seed=99)
    out = decode_wav_samples(_extensible_blob(s, rate=22050))
    assert out is not None
    px, rate = out
    assert rate == 22050 and px.shape == (13, 2) and (px == s).all()


def test_extensible_non_pcm_guid_rejected():
    s = _rand(5, 1, 16, seed=4)
    float_guid = b"\x03" + PCM_GUID[1:]  # IEEE-float SubFormat
    assert decode_wav_samples(_extensible_blob(s, guid=float_guid)) is None
    # short fmt (no GUID) with 0xFFFE tag must also reject
    blob = bytearray(_extensible_blob(s))
    fmt_off = blob.find(b"fmt ")
    # shrink declared fmt size to 16 (drops the extension bytes from
    # the parser's view while keeping the walk consistent is awkward;
    # instead corrupt the GUID in place)
    blob[fmt_off + 8 + 24:fmt_off + 8 + 40] = b"\x00" * 16
    assert decode_wav_samples(bytes(blob)) is None
