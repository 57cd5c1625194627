"""Baseline-sequential JPEG codec, dependency-free (stdlib + numpy).

The multimodal decode stage (multimodal.py `_decode_real`) treats
payload bytes as opaque until a codec claims them; JPEG is the most
common format in a real crawl corpus, so the engine carries its own
baseline decoder rather than stubbing the whole format out.  Scope —
the honest boundary, raised as NotImplementedError beyond it:

- decode: baseline sequential (SOF0) AND progressive (SOF2) DCT,
  8-bit, grayscale or YCbCr, standard entropy coding (DHT Huffman),
  restart markers, and chroma subsampling with sampling factors in
  {1, 2, 4} where every factor divides the max (covers 4:4:4, 4:2:2,
  4:4:0, 4:2:0, 4:1:1 — i.e. the layouts real crawl corpora contain;
  T.81 A.2.3 MCU interleave with per-component box upsampling on
  output).  Progressive scans support both spectral selection and
  successive approximation (DC/AC first + refinement with EOBRUN,
  T.81 G.1.2).  Arithmetic coding and non-dividing factors raise.
- encode: the matching writer (4:4:4, 4:2:2, or 4:2:0 via
  ``subsampling=``; ``progressive=True`` emits the standard 10-scan
  spectral-selection + successive-approximation script; Annex K
  quantization tables at quality 75-ish, Annex K Huffman tables) —
  exists to make the decoder testable without PIL and to generate
  corpus fixtures.  The progressive correctness oracle is built in:
  both writers quantize identically, so a progressive roundtrip must
  produce PIXEL-IDENTICAL output to the sequential roundtrip of the
  same image — any drift in the refinement bit streams shows up as a
  pixel diff against the independently-tested baseline path.

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


def _encode_entropy_block(w: _BitWriter, q: np.ndarray, pred: int, dc_tab, ac_tab) -> int:
    """Huffman-encode one quantized zigzag block (sequential scan);
    returns the new DC predictor.  Quantization happens once for both
    writers in :func:`_quantized_components`, so the progressive ==
    baseline pixel-identity oracle is structural, not a property of
    two float pipelines rounding alike."""
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


#: AC Huffman table for PROGRESSIVE scans: Annex K AC tables have no
#: EOBn (n>0) symbols, which progressive EOBRUN coding needs — so the
#: writer uses one flat 8-bit canonical table holding every symbol a
#: progressive AC scan can emit (EOB0-14, ZRL, (run 0-15, size 1-10)).
#: 176 codes of length 8 is a valid incomplete Huffman code; fixture
#: size is irrelevant, decode coverage is the point.
_AC_PROG_VALS = sorted(
    {(rn << 4) for rn in range(15)} | {0xF0} | {(run << 4) | s for run in range(16) for s in range(1, 11)}
)
_AC_PROG_BITS = [0] * 16
_AC_PROG_BITS[7] = len(_AC_PROG_VALS)  # all codes 8 bits long


def _quantized_components(width: int, height: int, rgb: bytes, factors) -> list[np.ndarray]:
    """FDCT + quantize every component: list of (blocks_high, blocks_wide,
    64) int32 zigzag arrays over MCU-padded planes — the shared front
    half of the sequential and progressive writers (bit-identical
    quantization to the inline baseline loop)."""
    hmax = max(h for h, _v in factors)
    vmax = max(v for _h, v in factors)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(px)
    ph = -(-height // (8 * vmax)) * 8 * vmax
    pw = -(-width // (8 * hmax)) * 8 * hmax
    padded = np.empty((ph, pw, 3))
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]
    padded[:, width:] = padded[:, width - 1 : width]
    out = []
    for ci, (h, v) in enumerate(factors):
        sx, sy = hmax // h, vmax // v
        plane = padded[:, :, ci]
        if sx > 1 or sy > 1:
            plane = plane.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
        nat = np.einsum("ij,njk,kl->nil", _D, blocks, _D.T).reshape(-1, 64)
        q = (_QL if ci == 0 else _QC).astype(np.float64)
        zz = np.round(nat[:, _ZIGZAG] / q[_ZIGZAG][None, :]).astype(np.int32)
        out.append(zz.reshape(bh, bw, 64))
    return out


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    *,
    restart_interval: int = 0,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """Baseline-sequential JFIF writer (fixed ~q75 Annex K tables) —
    the test-vector generator for :func:`decode_jpeg`.

    ``subsampling`` ∈ {"444", "422", "420"}: 4:2:2 and 4:2:0 emit the
    T.81 A.2.3 interleaved MCU layout (2×1 / 2×2 luma blocks per MCU,
    chroma box-mean downsampled) so the decoder's subsampled path has
    genuine fixtures.  ``restart_interval`` > 0 emits a DRI segment and
    RSTn markers every that many MCUs (exercises the restart path).
    ``progressive=True`` emits SOF2 with the standard 10-scan
    spectral-selection + successive-approximation script (libjpeg's
    default progression); quantization is bit-identical to the
    sequential writer, so progressive decode must reproduce the
    sequential roundtrip pixels exactly."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING)}, got {subsampling!r}")
    factors = _SUBSAMPLING[subsampling]
    if progressive:
        return _encode_progressive(width, height, rgb, factors, restart_interval)
    hmax = max(h for h, _v in factors)
    vmax = max(v for _h, v in factors)
    coefs = _quantized_components(width, height, rgb, factors)

    dc_tabs = [_huff_encode_table(_DC_L_BITS, _DC_L_VALS), _huff_encode_table(_DC_C_BITS, _DC_C_VALS)]
    ac_tabs = [_huff_encode_table(_AC_L_BITS, _AC_L_VALS), _huff_encode_table(_AC_C_BITS, _AC_C_VALS)]

    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    mcus = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
    segs = []
    for chunk in _restart_chunks(mcus, restart_interval):
        w = _BitWriter()
        pred = [0, 0, 0]
        for my, mx in chunk:
            for comp, (h, v) in enumerate(factors):
                tid = 0 if comp == 0 else 1
                for vy in range(v):
                    for vx in range(h):
                        pred[comp] = _encode_entropy_block(
                            w, coefs[comp][my * v + vy, mx * h + vx],
                            pred[comp], dc_tabs[tid], ac_tabs[tid],
                        )
        segs.append(w.flush())
    scan = _join_restart_segments(segs)

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


def _encode_ac_first_blocks(w: _BitWriter, blocks, ss: int, se: int, al: int, ac_prog) -> None:
    """AC first-scan entropy coding for a sequence of zigzag blocks
    (T.81 G.1.2.2 with EOBRUN coalescing)."""
    eobrun = 0

    def flush_eobrun():
        nonlocal eobrun
        if eobrun:
            rn = eobrun.bit_length() - 1
            hc, hl = ac_prog[rn << 4]
            w.put(hc, hl)
            if rn:
                w.put(eobrun - (1 << rn), rn)
            eobrun = 0

    for zz in blocks:
        sv = [
            (1 if int(zz[k]) >= 0 else -1) * (abs(int(zz[k])) >> al)
            for k in range(ss, se + 1)
        ]
        nz = [i for i, v in enumerate(sv) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun()
            continue
        flush_eobrun()
        run = 0
        for i in range(nz[-1] + 1):
            v = sv[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                hc, hl = ac_prog[0xF0]
                w.put(hc, hl)
                run -= 16
            s, code = _magnitude(v)
            hc, hl = ac_prog[(run << 4) | s]
            w.put(hc, hl)
            w.put(code, s)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun()
    flush_eobrun()


def _encode_ac_refine_blocks(w: _BitWriter, blocks, ss: int, se: int, al: int, ac_prog) -> None:
    """AC successive-approximation refinement entropy coding (T.81
    G.1.2.3, libjpeg encode_mcu_AC_refine structure).

    Two distinct correction-bit pools, exactly as libjpeg's BE/BR
    split — conflating them desynchronizes the stream: ``eob_bits``
    holds previous blocks' tail corrections and is emitted ONLY with
    the next EOBn symbol (the decoder reads them in its end-of-band
    correction sweeps); ``cur_bits`` holds the current block's
    corrections since the last symbol and is emitted right after the
    next inline symbol (ZRL or placement), whose traversal span is
    where the decoder consumes them."""
    eobrun = 0
    eob_bits: list[int] = []  # ride the next EOBn flush (libjpeg BE)
    cur_bits: list[int] = []  # follow the next inline symbol (libjpeg BR)

    def flush_eobrun():
        nonlocal eobrun
        if eobrun:
            rn = eobrun.bit_length() - 1
            hc, hl = ac_prog[rn << 4]
            w.put(hc, hl)
            if rn:
                w.put(eobrun - (1 << rn), rn)
            eobrun = 0
            for b in eob_bits:
                w.put(b, 1)
            eob_bits.clear()

    def drain_cur():
        for b in cur_bits:
            w.put(b, 1)
        cur_bits.clear()

    for zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        newly = [i for i, a in enumerate(absv) if a == 1]
        last_new = newly[-1] if newly else -1
        run = 0
        for i in range(last_new + 1):
            a = absv[i]
            if a == 0:
                run += 1
                continue
            while run > 15:
                flush_eobrun()
                hc, hl = ac_prog[0xF0]
                w.put(hc, hl)
                run -= 16
                drain_cur()
            if a > 1:  # history-nonzero: buffer its correction bit
                cur_bits.append(a & 1)
                continue
            flush_eobrun()
            hc, hl = ac_prog[(run << 4) | 1]
            w.put(hc, hl)
            w.put(1 if int(zz[ss + i]) >= 0 else 0, 1)
            drain_cur()
            run = 0
        if last_new < se - ss:
            # band extends past the last placement: the tail (zero-
            # history runs + history corrections, including any bits
            # still unflushed in cur_bits) is conveyed by EOB
            eobrun += 1
            cur_bits.extend(a & 1 for a in absv[last_new + 1 :] if a > 1)
            eob_bits.extend(cur_bits)
            cur_bits.clear()
            if eobrun == 0x7FFF:
                flush_eobrun()
    flush_eobrun()


def _restart_chunks(units: list, restart_interval: int):
    """Split a scan's unit sequence (MCUs or blocks) into restart
    segments: [units] when restarts are off, else ri-sized chunks."""
    if not restart_interval:
        return [units]
    ri = int(restart_interval)
    return [units[i : i + ri] for i in range(0, len(units), ri)]


def _join_restart_segments(segs: list[bytes]) -> bytes:
    """Entropy segments separated by RST0..RST7 markers (cycling)."""
    out = [segs[0]]
    for i, s in enumerate(segs[1:]):
        out.append(bytes([0xFF, 0xD0 + (i % 8)]))
        out.append(s)
    return b"".join(out)


def _encode_progressive(
    width: int, height: int, rgb: bytes, factors, restart_interval: int = 0
) -> bytes:
    """SOF2 writer: libjpeg's standard progression script — interleaved
    DC first at Al=1, per-component AC first scans with spectral bands
    and Al in {1, 2}, then DC + AC refinement scans down to Al=0 —
    over the same quantized coefficients as the sequential writer.

    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (interleaved DC scans) / blocks (non-interleaved scans): each
    restart segment is coded with fresh DC predictors and a flushed
    EOBRUN, which falls out of chunking the unit list and running the
    existing per-chunk coders (they already start clean and flush at
    the end)."""
    coefs = _quantized_components(width, height, rgb, factors)
    nc = 3
    hmax = max(h for h, _v in factors)
    vmax = max(v for _h, v in factors)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # real (non-padded) per-component block dims for non-interleaved scans
    real = []
    for h, v in factors:
        cw, ch = -(-width * h // hmax), -(-height * v // vmax)
        real.append((-(-cw // 8), -(-ch // 8)))

    dc_tabs = [_huff_encode_table(_DC_L_BITS, _DC_L_VALS), _huff_encode_table(_DC_C_BITS, _DC_C_VALS)]
    ac_prog = _huff_encode_table(_AC_PROG_BITS, _AC_PROG_VALS)
    mcus = [(my, mx) for my in range(mcuy) for mx in range(mcux)]

    def dc_scan(ah: int, al: int) -> bytes:
        segs = []
        for chunk in _restart_chunks(mcus, restart_interval):
            w = _BitWriter()
            pred = [0, 0, 0]
            for my, mx in chunk:
                for ci, (h, v) in enumerate(factors):
                    tid = 0 if ci == 0 else 1
                    for vy in range(v):
                        for vx in range(h):
                            dc = int(coefs[ci][my * v + vy, mx * h + vx, 0])
                            if ah == 0:
                                val = dc >> al  # arithmetic shift (T.81 G.1.2.1)
                                diff = val - pred[ci]
                                pred[ci] = val
                                s, code = _magnitude(diff)
                                hc, hl = dc_tabs[tid][s]
                                w.put(hc, hl)
                                if s:
                                    w.put(code, s)
                            else:
                                w.put((dc >> al) & 1, 1)
            segs.append(w.flush())
        return _join_restart_segments(segs)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        bw, bh = real[ci]
        blocks = [coefs[ci][by, bx] for by in range(bh) for bx in range(bw)]
        segs = []
        for chunk in _restart_chunks(blocks, restart_interval):
            w = _BitWriter()
            if ah == 0:
                _encode_ac_first_blocks(w, chunk, ss, se, al, ac_prog)
            else:
                _encode_ac_refine_blocks(w, chunk, ss, se, al, ac_prog)
            segs.append(w.flush())
        return _join_restart_segments(segs)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in table[_ZIGZAG]))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    def sos(scan_comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(scan_comps)])
        for ci in scan_comps:
            dc_tid = 0 if ci == 0 else 1
            body += bytes([ci + 1, (dc_tid << 4) | 0])  # AC always table 0 (the prog table)
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    # libjpeg jcparam.c standard script (chroma scans for color only)
    script: list[tuple[list[int], int, int, int, int]] = [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]

    parts = [
        b"\xff\xd8",
        seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
        dqt(0, _QL),
        dqt(1, _QC),
        dht(0, 0, _DC_L_BITS, _DC_L_VALS),
        dht(0, 1, _DC_C_BITS, _DC_C_VALS),
        dht(1, 0, _AC_PROG_BITS, _AC_PROG_VALS),
        seg(
            0xFFC2,
            struct.pack(">BHHB", 8, height, width, nc)
            + bytes([
                1, (factors[0][0] << 4) | factors[0][1], 0,
                2, (factors[1][0] << 4) | factors[1][1], 1,
                3, (factors[2][0] << 4) | factors[2][1], 1,
            ]),
        ),
    ]
    if restart_interval:
        parts.insert(2, seg(0xFFDD, struct.pack(">H", restart_interval)))
    for scan_comps, ss, se, ah, al in script:
        parts.append(sos(scan_comps, ss, se, ah, al))
        if ss == 0:
            parts.append(dc_scan(ah, al))
        else:
            parts.append(ac_scan(scan_comps[0], ss, se, ah, al))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


# ---------------------------------------------------------------- decode


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """JPEG → (width, height, top-down RGB).

    Supports baseline sequential (SOF0) and progressive (SOF2), 8-bit,
    1 or 3 components with sampling factors in {1, 2, 4} where each
    divides the max (4:4:4, 4:2:2, 4:4:0, 4:2:0, 4:1:1), restart
    intervals, and progressive spectral-selection + successive-
    approximation scans.  Subsampled chroma planes are box-replicated
    (nearest) back to full resolution.  Arithmetic coding, hierarchical
    / lossless SOF types, and non-dividing factors raise
    NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, KeyError, struct.error) as e:
        # truncated or internally-inconsistent downloads are routine in
        # crawls: surface them under the module's documented ValueError
        # contract so per-payload skip logic catches them, instead of
        # IndexError/KeyError (e.g. a scan naming an undefined quant or
        # Huffman table) killing the task
        raise ValueError(f"corrupt JPEG payload: {e!r}") from e


def _decode_jpeg_inner(data: bytes) -> tuple[int, int, bytes]:
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    width = height = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, quant_tid)
    restart_interval = 0
    progressive = False
    coef: list[np.ndarray] | None = None  # per-comp zigzag coefficients (SOF2)

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0) and progressive (SOF2) supported, got SOF marker 0xFF{marker:02X}"
            )
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
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            progressive = marker == 0xC2
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
            if not progressive:
                return _decode_scan(
                    data, pos, width, height, comps, scan_tabs, quant, huff_dc, huff_ac, restart_interval
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if coef is None:
                coef = _alloc_progressive_coef(width, height, comps)
            pos = _decode_progressive_scan(
                data, pos, width, height, comps, scan_tabs,
                ss, se, ahal >> 4, ahal & 0x0F,
                coef, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += 2 + length
    if progressive and coef is not None:
        return _reconstruct_progressive(width, height, comps, coef, quant)
    raise ValueError("no SOS marker found")


def _comp_geometry(width: int, height: int, comps):
    """Per T.81 A.1.1/A.2: (hmax, vmax, mcux, mcuy, per-comp
    [(h, v, blocks_wide_padded, blocks_high_padded, blocks_wide_real,
    blocks_high_real)]).  Padded dims cover whole MCUs (interleaved
    scans); real dims cover the component's own samples
    (non-interleaved scans)."""
    if len(comps) == 1:
        factors = [(1, 1)]
        hmax = vmax = 1
    else:
        factors = [(samp >> 4, samp & 0x0F) for _cid, samp, _qid in comps]
        hmax = max(h for h, _v in factors)
        vmax = max(v for _h, v in factors)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    geo = []
    for h, v in factors:
        cw, ch = -(-width * h // hmax), -(-height * v // vmax)
        geo.append((h, v, mcux * h, mcuy * v, -(-cw // 8), -(-ch // 8)))
    return hmax, vmax, mcux, mcuy, geo


def _alloc_progressive_coef(width, height, comps) -> list[np.ndarray]:
    _hmax, _vmax, _mcux, _mcuy, geo = _comp_geometry(width, height, comps)
    return [np.zeros((bhp, bwp, 64), dtype=np.int32) for _h, _v, bwp, bhp, _bw, _bh in geo]


def _decode_progressive_scan(
    data, pos, width, height, comps, scan_tabs, ss, se, ah, al, coef, huff_dc, huff_ac, restart_interval
):
    """One SOF2 scan (T.81 G.2): accumulate band [ss, se] at precision
    ``al`` into the per-component zigzag coefficient store.  Returns
    the stream position of the next marker."""
    _hmax, _vmax, mcux, mcuy, geo = _comp_geometry(width, height, comps)
    idx_by_cid = {cid: i for i, (cid, _s, _q) in enumerate(comps)}
    scan_cis = [idx_by_cid[cid] for cid, _d, _a in scan_tabs]
    r = _BitReader(data, pos)

    if ss == 0:  # DC scan (se must be 0 per spec)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        dc_tab = {ci: huff_dc.get(d) for ci, (_cid, d, _a) in zip(scan_cis, scan_tabs)}
        if ah == 0 and any(dc_tab[ci] is None for ci in scan_cis):
            # corrupt/crafted stream: keep the documented ValueError
            # contract so per-payload skip logic catches it
            raise ValueError("progressive DC scan references an undefined Huffman table")
        pred = {ci: 0 for ci in scan_cis}

        def dc_block(ci, by, bx):
            blk = coef[ci][by, bx]
            if ah == 0:  # first scan: diff-coded, shifted
                s = _huff_symbol(r, dc_tab[ci])
                pred[ci] += _receive_extend(r, s)
                blk[0] = pred[ci] << al
            else:  # refinement: one raw bit per block
                if r.bit():
                    blk[0] |= 1 << al

        if len(scan_cis) > 1:  # interleaved MCU order over padded dims
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        r.align_to_marker()
                        pred = {ci: 0 for ci in scan_cis}
                    for ci in scan_cis:
                        h, v = geo[ci][0], geo[ci][1]
                        for vy in range(v):
                            for vx in range(h):
                                dc_block(ci, my * v + vy, mx * h + vx)
                    unit += 1
        else:  # non-interleaved: the component's real block raster
            ci = scan_cis[0]
            _h, _v, _bwp, _bhp, bw, bh = geo[ci]
            unit = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        r.align_to_marker()
                        pred = {ci: 0 for ci in scan_cis}
                    dc_block(ci, by, bx)
                    unit += 1
    else:  # AC scan: always single-component (T.81 G.1.1.1)
        if len(scan_cis) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci = scan_cis[0]
        ac_tab = huff_ac.get(scan_tabs[0][2])
        if ac_tab is None:
            raise ValueError("progressive AC scan references an undefined Huffman table")
        _h, _v, _bwp, _bhp, bw, bh = geo[ci]
        eobrun = 0
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    r.align_to_marker()
                    eobrun = 0
                unit += 1
                blk = coef[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(r, blk, ss, se, al, eobrun, ac_tab)
                else:
                    eobrun = _ac_refine_block(r, blk, ss, se, al, eobrun, ac_tab)

    # byte-align and find the next marker (skipping stuffed FF00 and
    # stray RSTn the restart accounting already consumed)
    p = r.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("unterminated progressive scan")


def _ac_first_block(r, blk, ss, se, al, eobrun, ac_tab) -> int:
    """AC coefficients, first scan at this precision (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_symbol(r, ac_tab)
        run, s = rs >> 4, rs & 0x0F
        if s == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += r.bits(run)
            return eobrun  # current block ends; eobrun covers FURTHER blocks
        k += run
        if k > se:
            raise ValueError("AC coefficient index out of band")
        blk[k] = _receive_extend(r, s) << al
        k += 1
    return 0


def _ac_refine_block(r, blk, ss, se, al, eobrun, ac_tab) -> int:
    """AC successive-approximation refinement (T.81 G.1.2.3): place
    newly-significant ±2^al coefficients and read one correction bit
    for every already-nonzero coefficient traversed."""
    delta = 1 << al

    def correct(k):
        c = int(blk[k])
        if r.bit() and (c & delta) == 0:
            blk[k] = c + delta if c >= 0 else c - delta

    if eobrun > 0:
        for k in range(ss, se + 1):
            if blk[k] != 0:
                correct(k)
        return eobrun - 1

    k = ss
    while k <= se:
        rs = _huff_symbol(r, ac_tab)
        run, s = rs >> 4, rs & 0x0F
        if s == 0:
            if run < 15:  # EOB: corrections for the rest of this block
                eobrun = (1 << run) - 1
                if run:
                    eobrun += r.bits(run)
                for kk in range(k, se + 1):
                    if blk[kk] != 0:
                        correct(kk)
                return eobrun
            newval = 0  # ZRL: skip 16 zero-history positions
        else:
            if s != 1:
                raise ValueError("AC refinement magnitude must be 1")
            newval = delta if r.bit() else -delta
        while k <= se:
            if blk[k] != 0:
                correct(k)
            else:
                if run == 0:
                    if newval:
                        blk[k] = newval
                    k += 1
                    break
                run -= 1
            k += 1
    return 0


def _reconstruct_progressive(width, height, comps, coef, quant):
    """Dequantize + IDCT the accumulated coefficient store, then the
    same upsample/crop/color tail as the sequential path."""
    hmax, vmax, _mcux, _mcuy, geo = _comp_geometry(width, height, comps)
    nc = len(comps)
    full = []
    for ci, (_cid, _samp, qid) in enumerate(comps):
        q = quant[qid].astype(np.float64)
        bhp, bwp, _ = coef[ci].shape
        zz = coef[ci].reshape(bhp * bwp, 64).astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, _ZIGZAG] = zz * q[_ZIGZAG]
        spatial = np.einsum("ij,njk,kl->nil", _D.T, nat.reshape(-1, 8, 8), _D) + 128.0
        plane = (
            spatial.reshape(bhp, bwp, 8, 8).transpose(0, 2, 1, 3).reshape(bhp * 8, bwp * 8)
        )
        h, v = geo[ci][0], geo[ci][1]
        sx, sy = hmax // h, vmax // v
        if sy > 1:
            plane = np.repeat(plane, sy, axis=0)
        if sx > 1:
            plane = np.repeat(plane, sx, axis=1)
        full.append(plane[:height, :width])
    if nc == 1:
        y = np.clip(full[0], 0, 255)
        rgb = np.repeat(np.round(y).astype(np.uint8)[:, :, None], 3, axis=2)
        return width, height, rgb.tobytes()
    ycc = np.stack(full, axis=-1)
    rgb = np.clip(np.round(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
    return width, height, rgb.tobytes()


def _decode_block_zz(r: _BitReader, pred: int, dct: dict, act: dict, zz: np.ndarray) -> int:
    """Huffman-decode one sequential 8×8 block into the zigzag slot
    ``zz`` (already zeroed); returns the new DC predictor."""
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
    return pred


def _decode_scan(data, pos, width, height, comps, scan_tabs, quant, huff_dc, huff_ac, restart_interval):
    """Sequential (SOF0) scan: Huffman-walk every MCU into the shared
    zigzag coefficient store, then the same vectorized dequant + IDCT
    + upsample tail the progressive path uses
    (``_reconstruct_progressive``)."""
    nc = len(comps)
    dc_by_cid = {cid: d for cid, d, _a in scan_tabs}
    ac_by_cid = {cid: a for cid, _d, a in scan_tabs}

    _hmax, _vmax, mcux, mcuy, geo = _comp_geometry(width, height, comps)
    factors = [(g[0], g[1]) for g in geo]
    coef = _alloc_progressive_coef(width, height, comps)

    r = _BitReader(data, pos)
    pred = [0] * nc
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.align_to_marker()
                pred = [0] * nc
            for ci, (cid, _samp, _qid) in enumerate(comps):
                dct = huff_dc[dc_by_cid[cid]]
                act = huff_ac[ac_by_cid[cid]]
                h, v = factors[ci]
                for vy in range(v):
                    for vx in range(h):
                        pred[ci] = _decode_block_zz(
                            r, pred[ci], dct, act, coef[ci][my * v + vy, mx * h + vx]
                        )
            mcu += 1
    return _reconstruct_progressive(width, height, comps, coef, quant)
