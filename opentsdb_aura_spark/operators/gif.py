"""GIF codec, dependency-free (stdlib + numpy) — the remaining image
format a real crawl corpus contains in volume after JPEG/PNG.

- decode: GIF87a/GIF89a, global and local color tables, interlaced
  images (the 4-pass GIF row order), transparency index (the
  transparent color is emitted as its palette RGB — the engine's RGB
  pipeline has no alpha), and ANIMATED files (the FIRST frame is
  decoded, the standard thumbnail semantics; ``gif_frame_count``
  reports the frame count for metadata).  The LZW decompressor
  implements the variable-width LSB-first code stream with CLEAR /
  EOI handling and the 12-bit table cap.
- encode: single-frame GIF89a writer with a minimal palette (≤256
  distinct colors required, like the paletted-PNG writer) and a real
  LZW compressor — the fixture generator that makes the decoder
  testable without PIL.

Reference parity: the reference engine has no image path — this module
serves the training-data-pipeline extension surface (multimodal.py
``_decode_real``).  Format layout follows the public GIF89a
specification.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


# ---------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF LZW: variable-width LSB-first codes → index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary: code → byte string; rebuilt on CLEAR
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"LZW code {code} out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW compressor: emits CLEAR, the code stream (resetting the
    dictionary at the 4096-entry cap), and EOI; LSB-first packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    put(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        put(table[w])
        table[wk] = next_code
        # width grows when the NEXT emitted code could be the new entry
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            put(clear)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        put(table[w])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """GIF → (width, height, top-down RGB) of the FIRST frame."""
    if data[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_inner(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt GIF payload: {e!r}") from e


def _decode_gif_inner(data: bytes) -> tuple[int, int, bytes]:
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n

    # screen canvas: frames may be smaller than the logical screen and
    # offset into it; fill with the background color first
    if gct is not None and bg < len(gct):
        canvas = np.tile(gct[bg], (sh, sw, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)

    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: introducer, label, sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02X} at {pos}")
        # image descriptor
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(lzw), min_code_size, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("truncated GIF pixel data")
        rows = np.frombuffer(bytes(idx[: iw * ih]), dtype=np.uint8).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows stored in 4-pass order
            deinterlaced = np.empty_like(rows)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                n_rows = len(range(start, ih, step))
                deinterlaced[start::step] = rows[src : src + n_rows]
                src += n_rows
            rows = deinterlaced
        if int(rows.max(initial=0)) >= len(ct):
            raise ValueError("GIF color index out of range")
        canvas[iy : iy + ih, ix : ix + iw] = ct[rows]
        return sw, sh, canvas.tobytes()  # first frame only
    raise ValueError("GIF contains no image data")


def gif_frame_count(data: bytes) -> int:
    """Number of image frames in a GIF (animated metadata).

    Same corrupt-payload contract as :func:`decode_gif`: truncated or
    malformed streams raise ValueError — never a raw IndexError, and
    never a silent 0 for a file cut off mid-structure (a valid GIF
    always ends with the 0x3B trailer)."""
    if data[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    try:
        return _gif_frame_count_inner(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt GIF payload: {e!r}") from e


def _gif_frame_count_inner(data: bytes) -> int:
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    count = 0
    while pos < len(data):
        if data[pos] == 0x3B:  # trailer: the only valid end
            return count
        if data[pos] == 0x21:
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif data[pos] == 0x2C:
            count += 1
            _ix, _iy, _iw, _ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 0x07))
            pos += 1  # min code size
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        else:
            raise ValueError(f"unexpected GIF block 0x{data[pos]:02X}")
    raise ValueError("truncated GIF payload: missing trailer")


# ---------------------------------------------------------------- encode


def encode_gif(width: int, height: int, rgb: bytes, *, interlace: bool = False) -> bytes:
    """Single-frame GIF89a from top-down RGB bytes (≤256 distinct
    colors, like the paletted-PNG writer); real LZW compression.
    ``interlace=True`` stores rows in the 4-pass order so the
    decoder's de-interlacer has genuine fixtures."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height * width, 3)
    palette, idx = np.unique(px, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, got {len(palette)}")
    # color-table size is a power of two >= 2 entries
    bits = max(1, int(len(palette) - 1).bit_length())
    n_ct = 1 << bits
    ct = np.zeros((n_ct, 3), dtype=np.uint8)
    ct[: len(palette)] = palette
    idx = idx.astype(np.uint8).reshape(height, width)
    if interlace:
        idx = np.concatenate([idx[start::step] for start, step in _GIF_INTERLACE_PASSES])
    min_code_size = max(2, bits)  # spec: at least 2
    lzw = _lzw_encode(idx.tobytes(), min_code_size)
    sub_blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255] for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
        + ct.tobytes()
        + struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0)
        + bytes([min_code_size])
        + sub_blocks
        + b"\x00\x3b"
    )
