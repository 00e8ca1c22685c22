"""Baseline JPEG (ITU-T T.81) pixel codec — stdlib + numpy only.

Closes the JPEG pixel tier of the multimodal stub
(functions/multimodal.py): `decode_jpeg_pixels` is a real baseline
sequential-DCT decoder (marker walk, DQT/DHT/SOF0/SOS parse, Huffman
entropy decode with byte-stuffing and restart markers, dequant,
de-zigzag, 8x8 IDCT, chroma upsampling, YCbCr->RGB), and
`encode_jpeg_baseline` is a matching encoder used to plant test
images. Everything here derives from the PUBLIC JPEG specification
(ITU-T T.81, Annex K tables) — no codec library involved.

Determinism contract for oracles: quantization uses
floor(x/q + 0.5) and the final sample reconstruction uses
floor(x + 0.5) (NOT numpy's half-to-even round), so a DC-only
(per-block-constant) image decodes to values an external SQL engine
can replay with the same IEEE-double arithmetic — that is what lets
the `multimodal_jpeg_pixels` registry query value-hash against
DuckDB despite JPEG being lossy in general.

At corpus scale this runs inside mapInPandas partitions (Arrow
batches of whole blobs), same shape as the PNG decoder — throughput
scales with executors; swap libjpeg-turbo via decode_media when a
codec library is available.
"""

from __future__ import annotations

import struct

import numpy as np

# -- Annex K quantization tables (luminance / chrominance) -------------------

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# -- Annex K typical Huffman tables (BITS, HUFFVAL) --------------------------

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling (public formula): q<50 ->
    5000/q, else 200-2q; entries clamped to [1, 255]."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: C @ f @ C.T is the forward
    2-D DCT, C.T @ F @ C the inverse."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c * np.sqrt(2.0 / 8.0)
    m[0] = np.sqrt(1.0 / 8.0)
    return m


DCT = _dct_matrix()


def _build_decode_table(bits, vals):
    """Canonical Huffman (T.81 Annex C): map code (length, value) ->
    symbol via a flat dict keyed by (nbits, code)."""
    table = {}
    code = 0
    idx = 0
    for nbits in range(1, 17):
        for _ in range(bits[nbits - 1]):
            table[(nbits, code)] = vals[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    dec = _build_decode_table(bits, vals)
    return {sym: (nbits, code) for (nbits, code), sym in dec.items()}


class _BitReader:
    """MSB-first reader over an entropy-coded segment with 0xFF00
    byte-stuffing removal; stops at any non-stuffed marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.buf
        p = self.pos
        if p >= len(b):
            return False
        byt = b[p]
        if byt == 0xFF:
            if p + 1 < len(b) and b[p + 1] == 0x00:
                self.pos = p + 2
            else:
                return False  # a real marker — segment over
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byt
        self.nbits += 8
        return True

    def read(self, n: int):
        while self.nbits < n:
            if not self._fill():
                return None
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self):
        """Drop partial bits and consume an RSTn marker if present."""
        self.acc = 0
        self.nbits = 0
        b, p = self.buf, self.pos
        if p + 1 < len(b) and b[p] == 0xFF and 0xD0 <= b[p + 1] <= 0xD7:
            self.pos = p + 2
            return True
        return False


def _decode_huff(reader: _BitReader, table):
    code = 0
    for nbits in range(1, 17):
        bit = reader.read(1)
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = table.get((nbits, code))
        if sym is not None:
            return sym
    return None


def _extend(v, t):
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(data: bytes):
    """Baseline sequential JPEG decode. Supports SOF0, 8-bit samples,
    1 or 3 components, any sampling factors up to 2x2 (4:4:4, 4:2:2,
    4:2:0), restart intervals, multi-segment DQT/DHT. Returns a uint8
    array of shape (h, w, 1|3), or None for progressive/arithmetic/
    corrupt input — audit posture, never an error."""
    b = bytes(data or b"")
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    try:
        pos = 2
        qtabs: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
        frame = None
        restart_interval = 0
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return None
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede
            # the marker byte; advance past the run before reading it.
            while pos + 2 <= len(b) and b[pos + 1] == 0xFF:
                pos += 1
            if pos + 4 > len(b):
                return None
            marker = b[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2
                continue
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", b[pos + 2:pos + 4])
            seg = b[pos + 4:pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0xF
                    if pq != 0:
                        return None  # 16-bit tables: not baseline-8
                    tab = np.frombuffer(
                        seg[i + 1:i + 65], dtype=np.uint8
                    ).astype(np.int32)
                    qtabs[tq] = tab
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0xF
                    bits = list(seg[i + 1:i + 17])
                    n = sum(bits)
                    vals = list(seg[i + 17:i + 17 + n])
                    huff[(tc, th)] = _build_decode_table(bits, vals)
                    i += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
                if prec != 8 or nc not in (1, 3):
                    return None
                comps = []
                for ci in range(nc):
                    cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                    )
                frame = {"h": h, "w": w, "comps": comps}
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = seg[0]
                if ns < len(frame["comps"]):
                    # Multi-scan (non-interleaved) baseline: the first
                    # SOS covers only a subset of frame components.
                    # Decoding just that scan would report e.g. a
                    # Y-only image for a color file — keep the
                    # None-on-unsupported posture instead.
                    return None
                scan = []
                for si in range(ns):
                    cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                    comp = next(
                        c for c in frame["comps"] if c["id"] == cs
                    )
                    scan.append((comp, tdta >> 4, tdta & 0xF))
                pos = pos + 2 + seglen
                return _decode_scan(
                    b, pos, frame, scan, qtabs, huff, restart_interval
                )
            pos += 2 + seglen
        return None
    except Exception:
        return None


def _decode_scan(b, pos, frame, scan, qtabs, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or hmax > 2 or vmax > 2:
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                if not reader.align_to_marker():
                    return None
                preds = [0] * len(comps)
                mcu_count = 0
            for ci, (c, td, ta) in enumerate(scan):
                dc_tab = huff.get((0, td))
                ac_tab = huff.get((1, ta))
                q = qtabs.get(c["tq"])
                if dc_tab is None or ac_tab is None or q is None:
                    return None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = _decode_huff(reader, dc_tab)
                        if t is None:
                            return None
                        diffbits = reader.read(t) if t else 0
                        if diffbits is None:
                            return None
                        preds[ci] += _extend(diffbits, t)
                        coeffs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tab)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            mag = reader.read(s)
                            if mag is None:
                                return None
                            coeffs[k] = _extend(mag, s)
                            k += 1
                        block = (coeffs * q)[UNZIGZAG].reshape(8, 8)
                        px = DCT.T @ block.astype(np.float64) @ DCT
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample to full res, level-shift with deterministic rounding
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        samp = np.floor(full[0] + 128.0 + 0.5)
        return np.clip(samp, 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0] + 128.0, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bch = y + 1.772 * cb
    rgb = np.stack(
        [np.floor(ch + 0.5) for ch in (r, g, bch)], axis=2
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


# -- encoder (plant support) -------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int):
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byt = (self.acc >> self.nbits) & 0xFF
            self.out.append(byt)
            if byt == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(writer, coeffs_zz, pred, dc_tab, ac_tab):
    dc = int(coeffs_zz[0])
    diff = dc - pred
    t = _category(diff)
    nbits, code = dc_tab[t]
    writer.write(code, nbits)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coeffs_zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(coeffs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            nb, cd = ac_tab[0xF0]  # ZRL
            writer.write(cd, nb)
            run -= 16
        s = _category(v)
        nb, cd = ac_tab[(run << 4) | s]
        writer.write(cd, nb)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        nb, cd = ac_tab[0x00]  # EOB
        writer.write(cd, nb)
    return dc


def _forward_block(samples: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize with floor(x/q+0.5) (deterministic,
    engine-replayable for DC-only content), in zigzag order."""
    f = DCT @ (samples.astype(np.float64) - 128.0) @ DCT.T
    zz = f.reshape(-1)[ZIGZAG]
    return np.floor(zz / q + 0.5).astype(np.int64)


def encode_jpeg_baseline(
    pixels, *, quality: int = 75, restart_interval: int = 0,
    subsample: bool = False,
) -> bytes:
    """Minimal baseline encoder: (h, w) grayscale or (h, w, 3) RGB,
    Annex K tables scaled by ``quality``, 4:4:4 by default or 4:2:0
    (2x2 luma sampling, chroma averaged over 2x2) with
    ``subsample=True``. Emits SOI/DQT/SOF0/DHT/[DRI]/SOS with the
    standard Huffman tables. Plant support for the decoder above —
    production corpora carry real JPEGs; what matters at scale is
    the DECODER."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qy = scaled_quant(QUANT_LUMA, quality)
    qc = scaled_quant(QUANT_CHROMA, quality)
    if gray:
        planes = [px.astype(np.float64)]
        qids = [0]
        samps = [(1, 1)]
    else:
        r, g, bch = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else [
            (1, 1), (1, 1), (1, 1)
        ]
    qz = [qy.astype(np.float64), qc.astype(np.float64)]
    out = bytearray(b"\xff\xd8")
    for tq, tab in ((0, qy), (1, qc))[: max(qids) + 1]:
        payload = bytes([tq]) + bytes(tab[ZIGZAG].astype(np.uint8))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hv = (samps[ci][0] << 4) | samps[ci][1]
        sof += bytes([ci + 1, hv, qids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tid, bits, vals in tables:
        payload = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    enc_dc_y = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    enc_ac_y = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    enc_dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    enc_ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for ci, plane in enumerate(planes):
        sh, sv = samps[ci]
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:  # chroma downsample by block mean
            ph = (h + ry - 1) // ry * ry
            pw = (w + rx - 1) // rx * rx
            tmp = np.empty((ph, pw), dtype=np.float64)
            tmp[:h, :w] = plane
            tmp[h:, :w] = plane[h - 1:h, :]
            tmp[:, w:] = tmp[:, w - 1:w]
            plane = tmp.reshape(ph // ry, ry, pw // rx, rx).mean(
                axis=(1, 3)
            )
        ch_, cw_ = plane.shape
        p = np.empty((mcuy * sv * 8, mcux * sh * 8), dtype=np.float64)
        p[:ch_, :cw_] = plane
        p[ch_:, :cw_] = plane[ch_ - 1:ch_, :]  # edge-replicate pad
        p[:, cw_:] = p[:, cw_ - 1:cw_]
        padded.append(p)
    writer = _BitWriter()
    preds = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * nc
                mcu_count = 0
                writer.acc = 0
                writer.nbits = 0
            for ci in range(nc):
                sh, sv = samps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        zz = _forward_block(block, qz[qids[ci]][ZIGZAG])
                        if ci == 0:
                            preds[ci] = _encode_block(
                                writer, zz, preds[ci], enc_dc_y, enc_ac_y
                            )
                        else:
                            preds[ci] = _encode_block(
                                writer, zz, preds[ci], enc_dc_c, enc_ac_c
                            )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
