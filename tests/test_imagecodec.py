"""Unit tests for the pure-stdlib image codec (operators/imagecodec.py):
PNG decode across all five row filters and every supported color type,
BMP 24/32-bit with padding and row order, encode/decode roundtrips,
nearest resize, and graceful None on non-images. No Spark needed."""

import struct
import zlib

from hindex_spark.operators import imagecodec as ic


def _png_with_filters(w, h, ch, raster, filters):
    """Hand-build a PNG applying a chosen filter type per row — the
    encoder only writes filter 0, so decoding filters 1-4 needs
    adversarially constructed input."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    scan = bytearray()
    for y in range(h):
        f = filters[y]
        scan.append(f)
        row = raster[y * stride:(y + 1) * stride]
        prev = raster[(y - 1) * stride:y * stride] if y else bytes(stride)
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if (y and x >= ch) else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = (row[x] - a) & 0xFF
            elif f == 2:
                v = (row[x] - b) & 0xFF
            elif f == 3:
                v = (row[x] - ((a + b) >> 1)) & 0xFF
            else:
                v = (row[x] - paeth(a, b, c)) & 0xFF
            scan.append(v)

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_channel_counts():
    for ch in (1, 2, 3, 4):
        raster = bytes((i * 7 + ch) % 256 for i in range(5 * 3 * ch))
        payload = ic.encode_png(raster, 5, 3, ch)
        assert ic.decode_image(payload) == (5, 3, ch, raster)


def test_png_all_filter_types_decode():
    # 5 rows, one per filter type; values chosen to exercise wrap-around
    raster = bytes((i * 37 + 11) % 256 for i in range(5 * 4 * 3))
    payload = _png_with_filters(4, 5, 3, raster, [0, 1, 2, 3, 4])
    assert ic.decode_image(payload) == (4, 5, 3, raster)


def test_png_palette_expands_to_rgb():
    # 2x2, palette of 3 colors
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = bytes([0, 1, 2, 0])
    scan = b"\x00" + idx[:2] + b"\x00" + idx[2:]

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert ic.decode_image(payload) == (
        2, 2, 3,
        bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 0, 0]),
    )


def _bmp(w, h, bits, pixels_rgb, top_down=False):
    """Minimal BMP writer for test input (BGR order, padded rows)."""
    src_bpp = bits // 8
    stride = ((w * src_bpp) + 3) & ~3
    body = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for y in rows:
        row = bytearray()
        for x in range(w):
            r, g, b = pixels_rgb[y * w + x]
            row += bytes([b, g, r] + ([0] if src_bpp == 4 else []))
        row += bytes(stride - len(row))
        body += row
    hdr_h = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, bits, 0,
                       len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    file_hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return bytes(file_hdr + info + body)


def test_bmp_24_and_32_bottom_up_and_top_down():
    pixels = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    want24 = bytes(v for p in pixels for v in p)
    for td in (False, True):
        assert ic.decode_image(_bmp(2, 2, 24, pixels, top_down=td)) == (
            2, 2, 3, want24
        )
    w32, h32, ch32, r32 = ic.decode_image(_bmp(2, 2, 32, pixels))
    assert (w32, h32, ch32) == (2, 2, 4)
    assert [tuple(r32[i * 4:i * 4 + 3]) for i in range(4)] == pixels


def test_bmp32_zero_alpha_canonicalizes_to_rgb_stats():
    """The multimodal seam strips a 32-bit BMP's all-zero 4th channel
    (BITMAPINFOHEADER padding, which Pillow also drops) before
    computing pixel stats — so mean/max agree across the Pillow and
    pure-codec decode paths instead of the zeros dragging the mean."""
    from hindex_spark.operators import multimodal as mm

    pixels = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    payload = _bmp(2, 2, 32, pixels)
    flat = [v for p in pixels for v in p]
    d = mm._codec_canonical(payload, ic.decode_image(payload))
    assert d[2] == 3 and d[3] == bytes(flat)
    stats = mm._decode_auto(payload)
    assert stats["mean_byte"] == sum(flat) / len(flat)
    assert stats["max_byte"] == 220
    # a REAL alpha channel (any nonzero 4th byte) is preserved
    w, h, ch, raster = ic.decode_image(payload)
    real = raster[:3] + b"\x80" + raster[4:]
    assert mm._codec_canonical(payload, (w, h, ch, real))[2] == 4


def test_non_images_and_corrupt_return_none():
    assert ic.decode_image(b"hello world, not an image") is None
    assert ic.decode_image(b"") is None
    png = ic.encode_png(bytes(12), 2, 2, 3)
    assert ic.decode_image(png[:20]) is None  # truncated -> None, no raise
    assert ic.decode_image(b"BM" + b"\x00" * 60) is None  # bits=0 unsupported


def test_resize_nearest_center_convention():
    # 4x1 RGB stripes; downsize to 2x1 must pick source centers 1 and 3
    raster = bytes([0, 0, 0, 50, 50, 50, 100, 100, 100, 200, 200, 200])
    out = ic.resize_nearest(raster, 4, 1, 3, 2, 1)
    assert out == bytes([50, 50, 50, 200, 200, 200])
    # upscale 1x1 -> 3x2 replicates the pixel
    out2 = ic.resize_nearest(bytes([7, 8, 9]), 1, 1, 3, 3, 2)
    assert out2 == bytes([7, 8, 9] * 6)
