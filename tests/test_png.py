"""PNG codec: encode->decode identity over every filter/color type,
golden vectors, corruption detection, resize index math. Pure-python (no
Spark fixture) — the Spark-side use is tested via mm_png_* queries."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from imdedup_plus_spark.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    resize_nearest,
)


def _rand_img(rng, h, w, ch):
    a = rng.integers(0, 256, size=(h, w, ch) if ch > 1 else (h, w), dtype=np.uint8)
    return a


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter_and_colortype(ch, filt):
    rng = np.random.default_rng(ch * 10 + filt)
    img = _rand_img(rng, 13, 17, ch)
    out = decode_png(encode_png(img, filters=filt))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)


def test_roundtrip_mixed_filters_per_row():
    rng = np.random.default_rng(99)
    img = _rand_img(rng, 25, 9, 3)
    data = encode_png(img, filters=[r % 5 for r in range(25)])
    np.testing.assert_array_equal(decode_png(data), img)


def test_golden_tiny_gray():
    """2x2 gray, filter 0 — container laid out by hand."""
    img = np.array([[0, 255], [17, 34]], dtype=np.uint8)
    data = encode_png(img, filters=0)
    assert data[:8] == PNG_MAGIC
    # IHDR: width=2 height=2 depth=8 colortype=0
    assert data[16:29] == struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    # raw scanlines: filter byte 0 + row bytes
    start = data.index(b"IDAT") + 4
    (ln,) = struct.unpack(">I", data[start - 8 : start - 4])
    raw = zlib.decompress(data[start : start + ln])
    assert raw == b"\x00\x00\xff\x00\x11\x22"
    np.testing.assert_array_equal(decode_png(data), img)


def test_decode_interop_shape_and_edges():
    # 1x1, 1-wide, 1-tall images survive
    for shape in [(1, 1), (1, 7), (7, 1)]:
        img = np.arange(np.prod(shape), dtype=np.uint8).reshape(shape)
        np.testing.assert_array_equal(decode_png(encode_png(img, filters=4)), img)


def test_corruption_detected():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="magic"):
        decode_png(b"JUNK" + bytes(data[4:]))
    data[40] ^= 0xFF  # flip a body byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_unsupported_rejected():
    img = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(encode_png(img))
    # patch IHDR depth to 16 and fix the CRC
    ihdr = bytearray(data[16:29])
    ihdr[8] = 16
    data[16:29] = ihdr
    data[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="depth"):
        decode_png(bytes(data))


def test_resize_nearest_index_math():
    img = np.arange(36, dtype=np.uint8).reshape(6, 6)
    out = resize_nearest(img, 3, 2)
    # rows 0,2,4; cols 0,3
    np.testing.assert_array_equal(out, img[[0, 2, 4]][:, [0, 3]])
    up = resize_nearest(img, 12, 12)
    assert up.shape == (12, 12)
    np.testing.assert_array_equal(up[::2, ::2], img)
