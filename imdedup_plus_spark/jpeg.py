"""From-scratch baseline JFIF (JPEG) codec — the reference's native domain.

The reference dedups JPEGs by decoding them to quantized-DCT coefficient
planes and sketching THOSE, never the pixels (``/root/reference/jpeg.c:
16-122``; its whole two-stage design runs in DCT space). Round 1/2 had to
stub this lane because no JPEG library exists in this container; this
module removes the stub the same way ``png.py`` did for PNG: a complete
from-scratch implementation of the public format, written from the
ISO/IEC 10918-1 (ITU T.81) spec.

Scope: baseline sequential DCT, 8-bit, single (grayscale) component,
standard Annex-K luminance quantization + Huffman tables, real JFIF
markers (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, 0xFF byte stuffing). The decoder
parses only what the encoder emits (tables are READ from the stream, not
assumed) — enough for every payload this engine synthesizes, and the
exact analog of the reference's "decode container -> coefficient planes"
step.

Cross-engine exactness — the reason this codec is oracle-checkable where
libjpeg would not be: the forward DCT is INTEGER-ONLY fixed point.

* basis matrix ``DCT_M[u][k] = round(c_u * cos((2k+1)*u*pi/16) * 2**13)``
  with ``c_0 = sqrt(1/8)``, ``c_u = 1/2`` — computed once here and
  INLINED as literals into the DuckDB oracle (``dct_stats_sql``), so no
  libm cos() is evaluated on either engine at query time;
* each 1-D pass descales with ``floor((x + 4096) / 8192)`` (arithmetic
  shift in numpy, exact double division + floor in SQL — magnitudes stay
  far below 2**52 so the double path is exact);
* quantization is ``sign(F) * ((|F| + Q//2) // Q)``.

``decode_jpeg_to_dct(encode_jpeg(img))`` therefore reproduces the
encoder's quantized coefficients EXACTLY (integer identity through
zigzag + DC-prediction + Huffman + byte stuffing and back), which is
what ``mm_jpeg_dct_stats`` checks against the DuckDB replay — the
CHECK_DECOMPRESS discipline (``/root/reference/jpeg.c:583-603``) applied
to the entropy layer. Pixel reconstruction (``decode_jpeg``) uses the
float inverse transform and is NOT bit-replayable (JPEG is lossy); tests
bound its error instead (PSNR).
"""

from __future__ import annotations

import math

import numpy as np

# --- fixed-point DCT basis -------------------------------------------------

DCT_SHIFT = 13
_HALF = 1 << (DCT_SHIFT - 1)

#: DCT_M[u][k] = round(c_u * cos((2k+1) u pi / 16) * 2^13); int64 literals,
#: shared verbatim with the SQL oracle.
DCT_M: list[list[int]] = [
    [
        int(round((math.sqrt(1.0 / 8) if u == 0 else 0.5)
                  * math.cos((2 * k + 1) * u * math.pi / 16) * (1 << DCT_SHIFT)))
        for k in range(8)
    ]
    for u in range(8)
]
_M = np.array(DCT_M, dtype=np.int64)

#: Annex K table K.1 — standard luminance quantization (row-major u, v).
QUANT_LUMA: list[list[int]] = [
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
]
_Q = np.array(QUANT_LUMA, dtype=np.int64)

#: zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient.
ZIGZAG: list[tuple[int, int]] = []
_r = _c = 0
for _i in range(64):
    ZIGZAG.append((_r, _c))
    if (_r + _c) % 2 == 0:  # moving up-right
        if _c == 7:
            _r += 1
        elif _r == 0:
            _c += 1
        else:
            _r -= 1
            _c += 1
    else:  # moving down-left
        if _r == 7:
            _c += 1
        elif _c == 0:
            _r += 1
        else:
            _r += 1
            _c -= 1

# Annex K tables K.3/K.5 — standard luminance DC/AC Huffman specs
# (BITS = #codes per length 1..16, HUFFVAL = symbols in code order).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman (T.81 C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _build_codes(DC_BITS, DC_VALS)
_AC_CODES = _build_codes(AC_BITS, AC_VALS)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1  # one's complement for negatives
    return size, bits


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker inside entropy data")
            self.pos += 1  # skip stuffed 0x00
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _build_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


_DC_TREE = _decode_tree(DC_BITS, DC_VALS)
_AC_TREE = _decode_tree(AC_BITS, AC_VALS)


def _rdiv(a: np.ndarray) -> np.ndarray:
    """floor((a + 2^12) / 2^13) — arithmetic shift = floor division."""
    return (a + _HALF) >> DCT_SHIFT


def forward_dct_quant(block: np.ndarray) -> np.ndarray:
    """8x8 uint8 spatial block -> 8x8 int64 QUANTIZED coefficients.

    Integer-only: level shift, two fixed-point 1-D passes with the shared
    descale rule, Annex-K quantization. This exact arithmetic is replayed
    by ``dct_stats_sql`` in DuckDB.
    """
    s = block.astype(np.int64) - 128
    g = _rdiv(_M @ s)           # rows -> vertical frequencies u
    f = _rdiv(g @ _M.T)         # cols -> horizontal frequencies v
    sign = np.sign(f)
    return sign * ((np.abs(f) + _Q // 2) // _Q)


def _pad_blocks(img: np.ndarray) -> np.ndarray:
    """Edge-clamp pad to 8-multiples -> (bh, bw, 8, 8) block array."""
    h, w = img.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = img[np.minimum(np.arange(H), h - 1)][:, np.minimum(np.arange(W), w - 1)]
    return padded.reshape(H // 8, 8, W // 8, 8).swapaxes(1, 2)


def _marker(tag: int, body: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(img: np.ndarray) -> bytes:
    """Grayscale uint8 (h, w) -> baseline JFIF bytes."""
    if img.ndim != 2:
        raise ValueError("grayscale (h, w) images only")
    h, w = img.shape
    blocks = _pad_blocks(img)
    bh, bw = blocks.shape[:2]

    wr = _BitWriter()
    prev_dc = 0
    for br in range(bh):
        for bc in range(bw):
            q = forward_dct_quant(blocks[br, bc])
            zz = [int(q[r][c]) for (r, c) in ZIGZAG]
            # DC: predicted difference
            size, bits = _magnitude(zz[0] - prev_dc)
            prev_dc = zz[0]
            code, length = _DC_CODES[size]
            wr.put(code, length)
            if size:
                wr.put(bits, size)
            # AC: (run, size) symbols with ZRL and EOB
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c0, l0 = _AC_CODES[0xF0]  # ZRL: 16 zeros
                    wr.put(c0, l0)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = _AC_CODES[(run << 4) | size]
                wr.put(code, length)
                wr.put(bits, size)
                run = 0
            if run:
                c0, l0 = _AC_CODES[0x00]  # EOB
                wr.put(c0, l0)
    entropy = wr.flush()

    zz_q = bytes(int(_Q[r][c]) for (r, c) in ZIGZAG)
    out = bytearray()
    out += b"\xff\xd8"                                   # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, b"\x00" + zz_q)                 # DQT, table 0, 8-bit
    out += _marker(
        0xC0,                                            # SOF0 baseline
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x01" + b"\x01\x11\x00",                     # 1 comp, 1x1, qtab 0
    )
    out += _marker(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _marker(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += _marker(0xDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")  # SOS
    out += entropy
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


def _parse_markers(data: bytes):
    """JFIF scan: returns (h, w, qtable 8x8 int64, dc_spec, ac_spec,
    entropy bytes). Validates the subset this codec emits."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    h = w = None
    q = None
    dc_spec = ac_spec = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        tag = data[pos + 1]
        if tag == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if tag == 0xDB:
            if body[0] != 0x00:
                raise ValueError("only 8-bit q-table 0 supported")
            flat = list(body[1:65])
            q = np.zeros((8, 8), dtype=np.int64)
            for i, (r, c) in enumerate(ZIGZAG):
                q[r][c] = flat[i]
        elif tag == 0xC0:
            if body[0] != 8 or body[5] != 1:
                raise ValueError("baseline 8-bit single-component only")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
        elif tag == 0xC4:
            cls_id, bits, vals = body[0], list(body[1:17]), list(body[17:])
            if cls_id == 0x00:
                dc_spec = (bits, vals)
            elif cls_id == 0x10:
                ac_spec = (bits, vals)
            else:
                raise ValueError("only table slot 0 supported")
        elif tag == 0xDA:
            # entropy data runs from here to EOI
            end = data.rfind(b"\xff\xd9")
            if end < 0:
                raise ValueError("missing EOI")
            return h, w, q, dc_spec, ac_spec, data[pos:end]
        # APP0 and others: skipped
    raise ValueError("missing SOS")


def decode_jpeg_to_dct(data: bytes):
    """JFIF bytes -> (coefs (bh, bw, 8, 8) int64 QUANTIZED, h, w, qtable).

    The reference-parity entry point: coefficient planes without inverse
    transform (``/root/reference/jpeg.c:16-122`` decodes to DCT planes
    for the feature stage). Exact integer inverse of the encoder's
    entropy layer.
    """
    h, w, q, dc_spec, ac_spec, entropy = _parse_markers(data)
    dc_tree = _decode_tree(*dc_spec)
    ac_tree = _decode_tree(*ac_spec)
    bh, bw = -(-h // 8), -(-w // 8)
    rd = _BitReader(entropy)

    def read_symbol(tree):
        code, length = 0, 0
        while True:
            code = (code << 1) | rd.bit()
            length += 1
            if (length, code) in tree:
                return tree[(length, code)]
            if length > 16:
                raise ValueError("invalid Huffman stream")

    def extend(bits: int, size: int) -> int:
        if size == 0:
            return 0
        if bits >> (size - 1):  # positive
            return bits
        return bits - (1 << size) + 1

    coefs = np.zeros((bh, bw, 8, 8), dtype=np.int64)
    prev_dc = 0
    for br in range(bh):
        for bc in range(bw):
            zz = [0] * 64
            size = read_symbol(dc_tree)
            prev_dc += extend(rd.bits(size), size)
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = read_symbol(ac_tree)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                i += run
                zz[i] = extend(rd.bits(size), size)
                i += 1
            for idx, (r, c) in enumerate(ZIGZAG):
                coefs[br, bc, r, c] = zz[idx]
    return coefs, h, w, q


_M_F = np.array(
    [
        [(math.sqrt(1.0 / 8) if u == 0 else 0.5)
         * math.cos((2 * k + 1) * u * math.pi / 16) for k in range(8)]
        for u in range(8)
    ]
)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes -> grayscale uint8 pixels (lossy; float inverse DCT)."""
    coefs, h, w, q = decode_jpeg_to_dct(data)
    bh, bw = coefs.shape[:2]
    out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    for br in range(bh):
        for bc in range(bw):
            f = (coefs[br, bc] * q).astype(np.float64)
            out[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8] = _M_F.T @ f @ _M_F
    px = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
    return px[:h, :w]
