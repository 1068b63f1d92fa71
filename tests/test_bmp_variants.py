"""BMP palette/RLE coverage: 1/4/8-bit color-table files and RLE8/RLE4
compression against a TEST-SIDE writer and the JVM's ImageIO."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hindex_spark.operators import imagecodec as ic


def _bmp_header(w, h, bits, compression, data, n_colors, palette):
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([b, g, r, 0])
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bits, compression,
        len(data), 2835, 2835, n_colors, 0,
    )
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return hdr + info + bytes(pal) + data


def write_bmp_indexed(idx, palette, bits, top_down=False):
    """Uncompressed palette BMP from a (h, w) index array."""
    h, w = idx.shape
    stride = ((w * bits + 31) // 32) * 4
    rows = idx if top_down else idx[::-1]
    data = bytearray()
    for y in range(h):
        if bits == 8:
            line = bytes(rows[y].tolist())
        else:
            b = ((rows[y][:, None] >> np.arange(bits - 1, -1, -1)) & 1)
            line = np.packbits(b.reshape(-1).astype(np.uint8)).tobytes()
        data += line.ljust(stride, b"\x00")
    hh = -h if top_down else h
    return _bmp_header(w, hh, bits, 0, bytes(data), len(palette), palette)


def write_bmp_rle8(idx, palette):
    """RLE8 BMP: encode each row as literal runs (count=1 encoded runs
    plus some longer runs), EOL per row, EOB at the end."""
    h, w = idx.shape
    data = bytearray()
    for y in range(h - 1, -1, -1):  # storage is bottom-up
        x = 0
        row = idx[y]
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            data += bytes([run, int(row[x])])
            x += run
        data += b"\x00\x00"  # end of line
    data += b"\x00\x01"  # end of bitmap
    return _bmp_header(w, h, 8, 1, bytes(data), len(palette), palette)


def _pal(k):
    return [((i * 37) % 256, (i * 91) % 256, (i * 151) % 256)
            for i in range(k)]


@settings(max_examples=80, deadline=None)
@given(st.sampled_from([1, 4, 8]), st.integers(1, 25), st.integers(1, 19),
       st.booleans(), st.integers(0, 2**31 - 1))
def test_bmp_indexed_roundtrip(bits, w, h, top_down, seed):
    k = min(1 << bits, 16)
    idx = np.random.default_rng(seed).integers(0, k, (h, w), dtype=np.uint8)
    bmp = write_bmp_indexed(idx, _pal(k), bits, top_down)
    dec = ic.decode_image(bmp)
    assert dec is not None and dec[:3] == (w, h, 3)
    got = np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, np.array(_pal(k), dtype=np.uint8)[idx])


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 25), st.integers(1, 19), st.integers(0, 2**31 - 1))
def test_bmp_rle8_roundtrip(w, h, seed):
    # runs of repeated values exercise the encoded-run path
    rng = np.random.default_rng(seed)
    idx = np.repeat(
        rng.integers(0, 8, (h, max(1, w // 3 + 1)), dtype=np.uint8), 3, axis=1
    )[:, :w]
    bmp = write_bmp_rle8(idx, _pal(8))
    dec = ic.decode_image(bmp)
    assert dec is not None and dec[:3] == (w, h, 3)
    got = np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, np.array(_pal(8), dtype=np.uint8)[idx])


def test_bmp_rle_escapes():
    """Delta and early-EOB leave skipped pixels at palette index 0."""
    pal = _pal(4)
    # 4x3, bottom-up: row y=2(bottom) '2 pixels of 1', delta (1,1),
    # then 1 pixel of 3 at (3, middle row), EOB
    data = bytes([2, 1, 0, 2, 1, 1, 1, 3, 0, 1])
    bmp = _bmp_header(4, 3, 8, 1, data, 4, pal)
    dec = ic.decode_image(bmp)
    assert dec[:3] == (4, 3, 3)
    got = np.frombuffer(dec[3], dtype=np.uint8).reshape(3, 4, 3)
    exp_idx = np.zeros((3, 4), dtype=np.uint8)
    exp_idx[2, 0] = exp_idx[2, 1] = 1  # bottom storage row -> raster row 2
    exp_idx[1, 3] = 3                  # after delta(+1,+1)
    assert np.array_equal(got, np.array(pal, dtype=np.uint8)[exp_idx])


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_bmp_total_on_garbage(data):
    ic.decode_image(b"BM" + data.ljust(52, b"\x00"))  # must not raise


@pytest.mark.parametrize("bits,rle", [(8, False), (8, True), (4, False),
                                      (1, False)])
def test_bmp_matches_jvm_imageio(spark, bits, rle):
    rng = np.random.default_rng(bits + rle)
    w, h = 17, 11
    k = min(1 << bits, 16)
    idx = rng.integers(0, k, (h, w), dtype=np.uint8)
    if rle:
        idx = np.repeat(idx[:, ::3], 3, axis=1)[:, :w]
        bmp = write_bmp_rle8(idx, _pal(k))
    else:
        bmp = write_bmp_indexed(idx, _pal(k), bits)
    dec = ic.decode_image(bmp)
    ours = np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, 3)
    jvm = spark.sparkContext._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytes(bmp))
    img = jvm.javax.imageio.ImageIO.read(stream)
    assert img is not None, "JVM ImageIO could not parse our BMP"
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            r, g, b = (argb >> 16) & 255, (argb >> 8) & 255, argb & 255
            assert (r, g, b) == tuple(int(v) for v in ours[y, x]), (x, y)
