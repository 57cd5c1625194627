"""Baseline-sequential JPEG codec, dependency-free (stdlib + numpy).

The multimodal decode stage (multimodal.py `_decode_real`) treats
payload bytes as opaque until a codec claims them; JPEG is the most
common format in a real crawl corpus, so the engine carries its own
baseline decoder rather than stubbing the whole format out.  Scope —
the honest boundary, raised as NotImplementedError beyond it:

- decode: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr,
  standard entropy coding (DHT Huffman), restart markers, and chroma
  subsampling with sampling factors in {1, 2, 4} where every factor
  divides the max (covers 4:4:4, 4:2:2, 4:4:0, 4:2:0, 4:1:1 — i.e.
  the layouts real crawl corpora contain; T.81 A.2.3 MCU interleave
  with per-component box upsampling on output).  Progressive (SOF2),
  arithmetic coding, and non-dividing factors raise.
- encode: the matching writer (4:4:4, 4:2:2, or 4:2:0 via
  ``subsampling=``; Annex K quantization tables at quality 75-ish,
  Annex K Huffman tables) — exists to make the decoder testable
  without PIL and to generate corpus fixtures.

JPEG is lossy, so unlike BMP/PPM/PNG the pixel oracle cannot demand
bit-equality: tests bound the roundtrip error (flat fields ±3/channel,
PSNR on structured images) and the Spark-side catalog query verifies
the decode PIPELINE on exact metadata (dimensions) instead.

Reference parity: the reference engine has no image path at all —
this module exists for the training-data-pipeline extension surface.
Format layout follows ITU-T T.81 (public spec); tables are Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 luminance / K.2 chrominance quantization tables (quality 50
# base), scaled here to ~quality 75 (scale 0.5, min 1)
_QL_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_QC_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])
_QL = np.maximum(1, (_QL_BASE * 0.5).astype(np.int32))
_QC = np.maximum(1, (_QC_BASE * 0.5).astype(np.int32))

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8×8 DCT-II matrix: X = D @ x @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _huff_encode_table(bits, vals):
    """symbol → (code, length) from the (BITS, HUFFVAL) spec lists."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """(length, code) → symbol."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


class _BitReader:
    """Entropy-stream reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:  # marker — iterator should have stopped; signal
                    raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Byte-align and consume an RSTn marker; returns its index."""
        self.n = 0
        while self.pos < len(self.data) and self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RSTn, got 0xFF{m:02X}")
        self.pos += 2
        return m - 0xD0


def _huff_symbol(r: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | r.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size, code bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(v if v > 0 else -v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


# ---------------------------------------------------------------- encode


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    m = np.array([
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ])
    out = px.astype(np.float64) @ m.T
    out[:, :, 1:] += 128.0
    return out


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y = px[:, :, 0]
    cb = px[:, :, 1] - 128.0
    cr = px[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


#: encoder-side sampling layouts: name → per-component (h, v) for (Y, Cb, Cr)
_SUBSAMPLING = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def _encode_block(w: _BitWriter, block: np.ndarray, quant: np.ndarray, pred: int, dc_tab, ac_tab) -> int:
    """FDCT + quantize + Huffman-encode one 8×8 sample block; returns
    the new DC predictor."""
    coef = _D @ (block - 128.0) @ _D.T
    # orthonormal DCT vs T.81 scaling: identical up to the same
    # constant both sides use, so quant tables apply directly
    q = np.round(coef.flatten()[_ZIGZAG] / quant.astype(np.float64)[_ZIGZAG]).astype(int)
    diff = int(q[0]) - pred
    s, code = _magnitude(diff)
    hc, hl = dc_tab[s]
    w.put(hc, hl)
    if s:
        w.put(code, s)
    run = 0
    last_nz = max(np.nonzero(q[1:])[0]) + 1 if np.any(q[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_tab[0xF0]  # ZRL
            w.put(hc, hl)
            run -= 16
        s, code = _magnitude(v)
        hc, hl = ac_tab[(run << 4) | s]
        w.put(hc, hl)
        w.put(code, s)
        run = 0
    if last_nz < 63:
        hc, hl = ac_tab[0x00]  # EOB
        w.put(hc, hl)
    return int(q[0])


def encode_jpeg(
    width: int, height: int, rgb: bytes, *, restart_interval: int = 0, subsampling: str = "444"
) -> bytes:
    """Baseline-sequential JFIF writer (fixed ~q75 Annex K tables) —
    the test-vector generator for :func:`decode_jpeg`.

    ``subsampling`` ∈ {"444", "422", "420"}: 4:2:2 and 4:2:0 emit the
    T.81 A.2.3 interleaved MCU layout (2×1 / 2×2 luma blocks per MCU,
    chroma box-mean downsampled) so the decoder's subsampled path has
    genuine fixtures.  ``restart_interval`` > 0 emits a DRI segment and
    RSTn markers every that many MCUs (exercises the restart path)."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING)}, got {subsampling!r}")
    factors = _SUBSAMPLING[subsampling]
    hmax = max(h for h, _v in factors)
    vmax = max(v for _h, v in factors)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(px)
    # pad the full-resolution image to a whole number of MCUs so every
    # component plane divides evenly after downsampling
    ph = -(-height // (8 * vmax)) * 8 * vmax
    pw = -(-width // (8 * hmax)) * 8 * hmax
    padded = np.empty((ph, pw, 3))
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]  # edge replicate
    padded[:, width:] = padded[:, width - 1 : width]

    # per-component sample planes: box-mean downsample by (vmax/v, hmax/h)
    planes = []
    for ci, (h, v) in enumerate(factors):
        sx, sy = hmax // h, vmax // v
        plane = padded[:, :, ci]
        if sx > 1 or sy > 1:
            plane = plane.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        planes.append(plane)

    dc_tabs = [_huff_encode_table(_DC_L_BITS, _DC_L_VALS), _huff_encode_table(_DC_C_BITS, _DC_C_VALS)]
    ac_tabs = [_huff_encode_table(_AC_L_BITS, _AC_L_VALS), _huff_encode_table(_AC_C_BITS, _AC_C_VALS)]
    quants = [_QL, _QC]

    w = _BitWriter()
    scan_parts: list[bytes] = []
    pred = [0, 0, 0]
    mcu = 0
    rst = 0
    mcux, mcuy = pw // (8 * hmax), ph // (8 * vmax)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                scan_parts.append(w.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                w = _BitWriter()
                pred = [0, 0, 0]
            mcu += 1
            for comp, (h, v) in enumerate(factors):
                tid = 0 if comp == 0 else 1
                for vy in range(v):
                    for vx in range(h):
                        by, bx = (my * v + vy) * 8, (mx * h + vx) * 8
                        pred[comp] = _encode_block(
                            w, planes[comp][by : by + 8, bx : bx + 8],
                            quants[tid], pred[comp], dc_tabs[tid], ac_tabs[tid],
                        )
    scan_parts.append(w.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in table[_ZIGZAG]))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([
            1, (factors[0][0] << 4) | factors[0][1], 0,
            2, (factors[1][0] << 4) | factors[1][1], 1,
            3, (factors[2][0] << 4) | factors[2][1], 1,
        ]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8" + app0 + dqt(0, _QL) + dqt(1, _QC)
        + dht(0, 0, _DC_L_BITS, _DC_L_VALS) + dht(1, 0, _AC_L_BITS, _AC_L_VALS)
        + dht(0, 1, _DC_C_BITS, _DC_C_VALS) + dht(1, 1, _AC_C_BITS, _AC_C_VALS)
        + dri + sof + sos + scan + b"\xff\xd9"
    )


# ---------------------------------------------------------------- decode


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Baseline-sequential JPEG → (width, height, top-down RGB).

    Supports SOF0, 8-bit, 1 or 3 components with sampling factors in
    {1, 2, 4} where each divides the max (4:4:4, 4:2:2, 4:4:0, 4:2:0,
    4:1:1), restart intervals.  Subsampled chroma planes are box-
    replicated (nearest) back to full resolution.  Progressive /
    arithmetic / non-dividing-factor streams raise
    NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, struct.error) as e:
        # truncated downloads are routine in crawls: surface them under
        # the module's documented ValueError contract so per-payload
        # skip logic catches them, instead of IndexError killing the task
        raise ValueError(f"truncated JPEG payload: {e}") from e


def _decode_jpeg_inner(data: bytes) -> tuple[int, int, bytes]:
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    width = height = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, quant_tid)
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"only baseline sequential (SOF0) supported, got SOF marker 0xFF{marker:02X}")
        (length,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8)
                quant[tid] = tbl
                b += 65
        elif marker == 0xC0:  # SOF0
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise NotImplementedError(f"unsupported component count {nc}")
            for ci in range(nc):
                cid, samp, qid = body[6 + 3 * ci : 9 + 3 * ci]
                h, v = samp >> 4, samp & 0x0F
                if h not in (1, 2, 4) or v not in (1, 2, 4):
                    raise NotImplementedError(f"unsupported sampling factors {h}x{v}")
                comps.append((cid, samp, qid))
            hmax = max(c[1] >> 4 for c in comps)
            vmax = max(c[1] & 0x0F for c in comps)
            for _cid, samp, _qid in comps:
                if hmax % (samp >> 4) or vmax % (samp & 0x0F):
                    raise NotImplementedError(
                        "sampling factors must divide the max (integer box upsampling)"
                    )
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[tid] = _huff_decode_table(bits, vals)
                b += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_tabs = []
            for si in range(ns):
                cid, tids = body[1 + 2 * si], body[2 + 2 * si]
                scan_tabs.append((cid, tids >> 4, tids & 0x0F))
            pos = pos + 2 + length
            return _decode_scan(
                data, pos, width, height, comps, scan_tabs, quant, huff_dc, huff_ac, restart_interval
            )
        pos += 2 + length
    raise ValueError("no SOS marker found")


def _decode_block(r: _BitReader, pred: int, dct: dict, act: dict, q: np.ndarray) -> tuple[int, np.ndarray]:
    """Huffman-decode + dequantize + IDCT one 8×8 block; returns
    (new DC predictor, spatial block)."""
    zz = np.zeros(64, dtype=np.int64)
    s = _huff_symbol(r, dct)
    pred += _receive_extend(r, s)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_symbol(r, act)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _receive_extend(r, size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    # q is in NATURAL order (the DQT parse un-zigzags it), zz in zigzag
    # order: the i-th zigzag coefficient pairs with q at its natural
    # position _ZIGZAG[i]
    coef[_ZIGZAG] = zz * q[_ZIGZAG]
    return pred, _D.T @ coef.reshape(8, 8) @ _D + 128.0


def _decode_scan(data, pos, width, height, comps, scan_tabs, quant, huff_dc, huff_ac, restart_interval):
    nc = len(comps)
    dc_by_cid = {cid: d for cid, d, _a in scan_tabs}
    ac_by_cid = {cid: a for cid, _d, a in scan_tabs}

    # T.81 A.2.3: a single-component scan is non-interleaved — MCU is
    # one block and the declared factors are irrelevant to the layout
    if nc == 1:
        factors = [(1, 1)]
        hmax = vmax = 1
    else:
        factors = [(samp >> 4, samp & 0x0F) for _cid, samp, _qid in comps]
        hmax = max(h for h, _v in factors)
        vmax = max(v for _h, v in factors)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = [
        np.empty((mcuy * v * 8, mcux * h * 8), dtype=np.float64) for h, v in factors
    ]

    r = _BitReader(data, pos)
    pred = [0] * nc
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.align_to_marker()
                pred = [0] * nc
            for ci, (cid, _samp, qid) in enumerate(comps):
                dct = huff_dc[dc_by_cid[cid]]
                act = huff_ac[ac_by_cid[cid]]
                q = quant[qid]
                h, v = factors[ci]
                for vy in range(v):
                    for vx in range(h):
                        pred[ci], block = _decode_block(r, pred[ci], dct, act, q)
                        by, bx = (my * v + vy) * 8, (mx * h + vx) * 8
                        planes[ci][by : by + 8, bx : bx + 8] = block
            mcu += 1

    if nc == 1:
        y = np.clip(planes[0][:height, :width], 0, 255)
        rgb = np.repeat(np.round(y).astype(np.uint8)[:, :, None], 3, axis=2)
        return width, height, rgb.tobytes()
    # box-replicate subsampled planes back to full resolution, crop
    full = []
    for ci, (h, v) in enumerate(factors):
        plane = planes[ci]
        sx, sy = hmax // h, vmax // v
        if sy > 1:
            plane = np.repeat(plane, sy, axis=0)
        if sx > 1:
            plane = np.repeat(plane, sx, axis=1)
        full.append(plane[:height, :width])
    ycc = np.stack(full, axis=-1)
    rgb = np.clip(np.round(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
    return width, height, rgb.tobytes()
