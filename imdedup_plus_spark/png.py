"""Minimal real PNG codec — pure stdlib ``zlib`` + ``numpy``.

The reference's multimodal core is a real image codec: it parses JPEG
containers and losslessly re-encodes DCT planes
(``/root/reference/jpeg.c:16-122``, verify ``jpeg.c:583-603``). This
container ships no image libraries, so the analog here is a from-scratch
implementation of the one raster format whose codec needs nothing beyond
the standard library: PNG (ISO/IEC 15948, a public specification) is
zlib-compressed scanlines with 5 per-row predictor filters — and zlib IS
in the Python stdlib.

Supported (decode + encode): 8-bit depth, color types 0 (grayscale),
2 (RGB), 6 (RGBA); all five row filters (None/Sub/Up/Average/Paeth);
non-interlaced. Unsupported (raise ``ValueError``): 16-bit, palette,
Adam7 interlace — and non-PNG magics raise before any parse.

Decode correctness is machine-checked two ways:

* ``tests/test_png.py`` — encode->decode byte-identity over every filter
  type and color type, plus golden vectors;
* the ``mm_png_roundtrip`` driver query — Spark builds a deterministic
  per-doc image (integer arithmetic on ``(doc_id, row, col)``), encodes
  with a different filter per row, decodes with THIS decoder, and emits
  pixel statistics; the DuckDB oracle computes the same statistics
  directly from the arithmetic. Any codec bug anywhere in the
  encode/filter/inflate/unfilter path breaks bit-parity.

Scale shape: the codec is driver-free — it runs inside Arrow-batched
``mapInPandas`` kernels (``multimodal.decode_image``), one image per row,
no shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type -> channel count (8-bit only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec 9.4), vectorized: nearest of left/up/
    up-left to a+b-c, ties preferring a, then b."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, filters: list[int] | int = 0) -> bytes:
    """uint8 array (H,W) or (H,W,3) or (H,W,4) -> PNG bytes.

    ``filters`` is one filter type for all rows or a per-row list — tests
    and the roundtrip query use ``row % 5`` so decoding exercises every
    filter path."""
    if img.dtype != np.uint8:
        raise ValueError("encode_png: uint8 arrays only")
    if img.ndim == 2:
        ctype, ch = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype, ch = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        ctype, ch = 6, 4
    else:
        raise ValueError(f"encode_png: unsupported shape {img.shape}")
    h, w = img.shape[:2]
    if isinstance(filters, int):
        filters = [filters] * h
    raw = img.reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    out = bytearray()
    for r in range(h):
        row = raw[r]
        f = filters[r]
        left = np.concatenate([np.zeros(ch, np.uint8), row[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.uint8), prev[:-ch]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) // 2
            ).astype(np.uint8)
        elif f == 4:
            enc = row - _paeth(left, prev, ul)
        else:
            raise ValueError(f"encode_png: bad filter {f}")
        out.append(f)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W) gray or (H,W,C) color.

    Walks the chunk stream (length/tag/body/crc), inflates the IDAT
    concatenation, reverses the per-row filter. CRCs are verified — a
    corrupt container fails loudly, the CHECK_DECOMPRESS discipline."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos, w = 8, None
    idat = bytearray()
    h = ctype = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if f == 1:
            # Sub: decoded[i] = cumulative sum of its channel lane mod 256
            row = (
                row.reshape(-1, ch).astype(np.uint64).cumsum(axis=0).astype(np.uint8)
            ).reshape(-1)
        elif f == 2:
            row += prev
        elif f == 3:
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((int(left) + int(prev[i])) // 2)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = int(row[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"PNG row {r}: bad filter {f}")
        img[r] = row
        prev = row
    img = img.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def resize_nearest(img: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """Nearest-neighbor resize with pure floor index math
    (``src = dst * old // new``) so the DuckDB oracle can replicate the
    sampled pixel grid exactly."""
    h, w = img.shape[:2]
    rows = (np.arange(new_h) * h) // new_h
    cols = (np.arange(new_w) * w) // new_w
    return img[rows][:, cols]
