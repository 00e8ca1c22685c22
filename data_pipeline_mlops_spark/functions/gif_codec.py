"""GIF decode/encode with the standard library only — the third REAL
raster tier next to PNG (functions/multimodal.py::decode_png_pixels)
and baseline JPEG (functions/jpeg_codec.py).

Decoder: GIF87a/GIF89a, global + local color tables, variable-width
LZW with Clear/EOI handling and code-width growth, interlaced row
de-passing, extension-block skipping (GCE / comment / application),
multi-frame files (pixels of the FIRST full-canvas frame are decoded;
total frames are counted by walking the remaining image separators).
Returns None for non-GIF / unsupported / corrupt input — the audit
posture shared by every codec in this package, never an error.

Encoder: planted-fixture generator for tests/oracles (same role as
encode_jpeg_baseline). It emits literal LZW codes at a fixed width
with a Clear code each 62 symbols so the decoder's table never grows
past the width the encoder used — a valid, if uncompressed, GIF
stream (the classic "untouched LZW" construction, public in GIFLIB
documentation).

Scale shape: decoding runs inside mapInPandas partitions (Arrow
batches), so throughput scales with executors; the DataFrame plan
around it is a straight map — no shuffle, no driver involvement.
"""

from __future__ import annotations

import struct as _struct

import numpy as _np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


class _BitStream:
    """LSB-first bit reader over the concatenated LZW data."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitpos = 0

    def read(self, nbits: int) -> int | None:
        v = 0
        got = 0
        while got < nbits:
            if self.pos >= len(self.data):
                return None
            take = min(8 - self.bitpos, nbits - got)
            bits = (self.data[self.pos] >> self.bitpos) & ((1 << take) - 1)
            v |= bits << got
            got += take
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.pos += 1
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """Variable-width GIF LZW -> list of palette indices (length
    capped at n_pixels). None on malformed streams.

    Guard capped at the GIF-spec maximum (8): root codes are single
    palette BYTES, so a larger min_code_size cannot describe a valid
    stream — and would crash the root-table build (bytes([i]) with
    i > 255) instead of honoring the None-on-malformed contract."""
    if not 2 <= min_code_size <= 8:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    bs = _BitStream(data)
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = bs.read(width)
        if code is None:
            return None
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        return None
    return bytes(out[:n_pixels])


def _read_subblocks(b: bytes, pos: int):
    """Concatenate data sub-blocks starting at pos; return (data,
    next_pos) or None if truncated."""
    chunks = []
    while True:
        if pos >= len(b):
            return None
        n = b[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(b):
            return None
        chunks.append(b[pos:pos + n])
        pos += n


def decode_gif_pixels(data: bytes):
    """First-frame pixels + frame count: returns (rgb uint8 array of
    shape (h, w, 3), n_frames) or None. The first frame must cover the
    full canvas at offset (0, 0) — partial-canvas first frames (rare;
    they composite onto a background color this decoder does not
    model) return None rather than wrong pixels."""
    b = bytes(data or b"")
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w, h, packed, _bg, _aspect = _struct.unpack("<HHBBB", b[6:13])
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = _np.frombuffer(
                b[pos:pos + 3 * n], dtype=_np.uint8
            ).reshape(-1, 3)
            if len(gct) < n:
                return None
            pos += 3 * n
        first = None
        n_frames = 0
        gce_transparent = False
        while pos < len(b):
            tag = b[pos]
            if tag == 0x3B:  # trailer
                break
            if tag == 0x21:  # extension: label + sub-blocks
                label = b[pos + 1] if pos + 1 < len(b) else None
                got = _read_subblocks(b, pos + 2)
                if got is None:
                    return None
                ext, pos = got
                if label == 0xF9 and len(ext) >= 1:
                    # Graphic Control Extension: applies to the NEXT
                    # image; bit 0 of the packed field marks one
                    # palette index as transparent
                    gce_transparent = bool(ext[0] & 0x01)
                continue
            if tag != 0x2C:  # not an image separator
                return None
            left, top, fw, fh, fpacked = _struct.unpack(
                "<HHHHB", b[pos + 1:pos + 10]
            )
            pos += 10
            lct = None
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                lct = _np.frombuffer(
                    b[pos:pos + 3 * n], dtype=_np.uint8
                ).reshape(-1, 3)
                if len(lct) < n:
                    return None
                pos += 3 * n
            if pos >= len(b):
                return None
            min_code_size = b[pos]
            got = _read_subblocks(b, pos + 1)
            if got is None:
                return None
            lzw, pos = got
            n_frames += 1
            if first is None:
                if (left, top, fw, fh) != (0, 0, w, h):
                    return None
                if gce_transparent:
                    # a transparent first frame composites onto the
                    # background, which this decoder does not model —
                    # reject rather than report the palette color at
                    # the transparent index (same posture as the
                    # partial-canvas-first-frame rejection above)
                    return None
                idx = _lzw_decode(lzw, min_code_size, fw * fh)
                if idx is None:
                    return None
                pal = lct if lct is not None else gct
                if pal is None:
                    return None
                arr = _np.frombuffer(idx, dtype=_np.uint8)
                if int(arr.max(initial=0)) >= len(pal):
                    return None
                px = arr.reshape(fh, fw)
                if fpacked & 0x40:  # interlaced: de-pass rows
                    out = _np.zeros_like(px)
                    for src_y, dst_y in enumerate(_interlace_rows(fh)):
                        out[dst_y] = px[src_y]
                    px = out
                first = pal[px]
        if first is None:
            return None
        return first, n_frames
    except Exception:
        return None


def encode_gif(
    frames,
    palette,
    *,
    interlace_first: bool = False,
) -> bytes:
    """Planted-fixture encoder: one or more (h, w) uint8 index frames
    sharing a global palette (n<=256 rows of RGB). Literal LZW codes
    at fixed width with a Clear each 62 symbols — valid GIF89a."""
    frames = [_np.asarray(f, dtype=_np.uint8) for f in frames]
    pal = _np.asarray(palette, dtype=_np.uint8).reshape(-1, 3)
    bits = max(2, int(len(pal) - 1).bit_length())
    gct_n = 1 << bits
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes() + b"\x00" * (3 * (gct_n - len(pal)))
    min_code = max(2, bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    for fi, fr in enumerate(frames):
        fh, fw = fr.shape
        inter = interlace_first and fi == 0
        out += _struct.pack(
            "<BHHHHB", 0x2C, 0, 0, fw, fh, 0x40 if inter else 0
        )
        out.append(min_code)
        vals = fr
        if inter:
            vals = fr[_interlace_rows(fh)]
        # the decoder adds one table entry per code after the first;
        # width would grow once next_code hits 2*clear, i.e. after
        # clear-1 codes — send a Clear every clear-2 symbols so the
        # stream stays at the fixed width
        period = clear - 2
        codes: list[int] = [clear]
        for i, v in enumerate(vals.ravel()):
            if i and i % period == 0:
                codes.append(clear)
            codes.append(int(v))
        codes.append(eoi)
        # pack LSB-first at fixed width
        acc = 0
        nbits = 0
        data = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            data.append(acc & 0xFF)
        for off in range(0, len(data), 255):
            chunk = data[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
