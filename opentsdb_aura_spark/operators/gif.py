"""GIF codec, dependency-free (stdlib + numpy) — the remaining image
format a real crawl corpus contains in volume after JPEG/PNG.

- decode: GIF87a/GIF89a, global and local color tables, interlaced
  images (the 4-pass GIF row order), and ANIMATED files two ways:
  ``decode_gif`` returns the FIRST frame (thumbnail semantics, the
  transparent color emitted as its palette RGB — the engine's RGB
  pipeline has no alpha), while ``decode_gif_frames`` iterates EVERY
  presented canvas with real disposal handling (none / do-not-dispose
  / restore-to-background / restore-to-previous) and transparency
  show-through compositing — the 1→many frame surface
  (``av.sample_gif_frames``).  ``gif_frame_count`` reports the frame
  count without LZW work.  The LZW decompressor implements the
  variable-width LSB-first code stream with CLEAR / EOI handling and
  the 12-bit table cap.
- encode: single- and multi-frame GIF89a writers with a minimal
  palette (≤256 distinct colors required, like the paletted-PNG
  writer) and a real LZW compressor — the fixture generators that make
  the decoders testable without PIL.  ``encode_gif_animated`` writes
  per-frame Graphic Control Extensions (disposal method, transparency
  index) and partial frame blocks offset into the logical screen.

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


def _parse_screen(data: bytes):
    """Logical-screen descriptor + global color table → (sw, sh, gct,
    background RGB canvas, position of the first block)."""
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
    return sw, sh, gct, canvas, pos


def _iter_gif_images(data: bytes, gct, pos: int):
    """Walk the block stream yielding one tuple per image frame:
    (ix, iy, ct, index rows, disposal method, transparent index) — the
    Graphic Control Extension (0x21 0xF9) preceding each image carries
    disposal + transparency; other extensions are skipped.  Raises
    ValueError on structural damage (the decode_gif contract)."""
    disposal, transp = 0, None
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: introducer, label, sub-blocks
            label = data[pos + 1]
            body = bytearray()
            pos += 2
            while data[pos] != 0:
                body += data[pos + 1 : pos + 1 + data[pos]]
                pos += 1 + data[pos]
            pos += 1
            if label == 0xF9 and len(body) >= 4:  # Graphic Control Ext
                disposal = (body[0] >> 2) & 0x07
                transp = body[3] if body[0] & 0x01 else None
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
        yield ix, iy, ct, rows, disposal, transp
        disposal, transp = 0, None  # a GCE governs ONE image


def _decode_gif_inner(data: bytes) -> tuple[int, int, bytes]:
    sw, sh, gct, canvas, pos = _parse_screen(data)
    for ix, iy, ct, rows, _disp, _transp in _iter_gif_images(data, gct, pos):
        ih, iw = rows.shape
        # first frame only; transparent color emitted as its palette RGB
        canvas[iy : iy + ih, ix : ix + iw] = ct[rows]
        return sw, sh, canvas.tobytes()
    raise ValueError("GIF contains no image data")


def decode_gif_frames(data: bytes) -> tuple[int, int, list[bytes]]:
    """ANIMATED GIF → (width, height, [presented full-canvas RGB per
    frame]) with real disposal handling — the 1→many surface that
    feeds frame sampling (``av.sample_gif_frames``), shaped like
    ``decode_y4m``.

    Per the GIF89a spec each frame composites onto the logical-screen
    canvas: transparent pixels (GCE transparency index) leave the
    underlying canvas showing through, then after presentation the
    frame's disposal method runs — 0/1 keep the canvas, 2 restores the
    frame's REGION to the background color, 3 restores the canvas to
    its pre-frame state.  Every presented canvas is materialized
    top-down RGB at screen size, so downstream per-frame features are
    uniform regardless of per-frame block geometry."""
    if data[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    try:
        sw, sh, gct, canvas, pos = _parse_screen(data)
        background = canvas[0, 0].copy() if sh and sw else None
        out: list[bytes] = []
        for ix, iy, ct, rows, disposal, transp in _iter_gif_images(data, gct, pos):
            ih, iw = rows.shape
            region = canvas[iy : iy + ih, ix : ix + iw]
            saved = region.copy() if disposal == 3 else None
            rgb = ct[rows]
            if transp is not None:
                opaque = rows != transp
                region[opaque] = rgb[opaque]
            else:
                region[:] = rgb
            out.append(canvas.tobytes())
            if disposal == 2:
                region[:] = background
            elif disposal == 3:
                region[:] = saved
        if not out:
            raise ValueError("GIF contains no image data")
        return sw, sh, out
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt GIF payload: {e!r}") from e


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


def encode_gif_animated(
    width: int,
    height: int,
    frames: list[tuple[int, int, int, int, bytes]],
    *,
    disposals: list[int] | None = None,
    transparent: tuple[int, int, int] | None = None,
    bg_rgb: tuple[int, int, int] = (0, 0, 0),
) -> bytes:
    """Multi-frame GIF89a writer — the fixture generator for the
    animated decode path (``decode_gif_frames``), like ``encode_gif``
    is for the single-frame path.

    ``frames`` is a list of (ix, iy, iw, ih, top-down RGB bytes) image
    blocks composited onto a ``width``×``height`` logical screen;
    ``disposals[f]`` ∈ {0,1,2,3} (default 1 = do not dispose) is
    written into each frame's Graphic Control Extension.  If
    ``transparent`` is given, pixels exactly matching that RGB triple
    are stored as a reserved transparent palette index with the GCE
    transparency flag set (show-through compositing).  One GLOBAL
    palette over all frames plus the background and transparent
    colors (≤256 total, like the single-frame writer); background
    index 0 is ``bg_rgb``."""
    if disposals is None:
        disposals = [1] * len(frames)
    if len(disposals) != len(frames):
        raise ValueError("disposals must match frames")
    # global palette: background first (index 0 = screen background),
    # then the transparent sentinel, then every color any frame uses
    colors = [tuple(int(c) for c in bg_rgb)]
    transp_idx = None
    if transparent is not None:
        transparent = tuple(int(c) for c in transparent)
        transp_idx = 1
        colors.append(transparent)
    seen = {c: i for i, c in enumerate(colors)}
    index_maps = []
    for ix, iy, iw, ih, rgb in frames:
        if len(rgb) != iw * ih * 3:
            raise ValueError(f"frame needs {iw * ih * 3} RGB bytes, got {len(rgb)}")
        px = np.frombuffer(rgb, dtype=np.uint8).reshape(ih * iw, 3)
        idx = np.empty(ih * iw, dtype=np.uint8)
        for j, p in enumerate(map(tuple, px.tolist())):
            if p == transparent:
                idx[j] = transp_idx
                continue
            if p not in seen:
                if len(seen) >= 256:
                    raise ValueError("GIF needs <=256 colors across all frames")
                seen[p] = len(seen)
                colors.append(p)
            idx[j] = seen[p]
        index_maps.append(idx.reshape(ih, iw))
    bits = max(1, (len(colors) - 1).bit_length())
    n_ct = 1 << bits
    ct = np.zeros((n_ct, 3), dtype=np.uint8)
    ct[: len(colors)] = np.array(colors, dtype=np.uint8)
    min_code_size = max(2, bits)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += ct.tobytes()
    for (ix, iy, iw, ih, _rgb), idx, disp in zip(frames, index_maps, disposals):
        gce_flags = (disp & 0x07) << 2
        t = 0
        if transp_idx is not None:
            gce_flags |= 0x01
            t = transp_idx
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, gce_flags, 0, t, 0)
        out += struct.pack("<BHHHHB", 0x2C, ix, iy, iw, ih, 0)
        lzw = _lzw_encode(idx.tobytes(), min_code_size)
        out += bytes([min_code_size])
        out += b"".join(
            bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255] for i in range(0, len(lzw), 255)
        )
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


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
