"""GIF decoder (imagecodec._decode_gif) against a test-side GIF WRITER
with a real LZW compressor.

The writer implements the actual GIF89a LZW algorithm (dictionary
growth, variable code width, CLEAR at table-full), so roundtrips
exercise the decoder's table growth, width bumps, and the KwKwK case —
not just literal codes. GIF is lossless, so every comparison is
byte-exact. A live cross-check reads our encoded GIF back through the
JVM's ImageIO (an independent implementation riding in Spark's JVM)
and compares per-pixel.
"""

import struct

import numpy as np
import pytest

from hindex_spark.operators import imagecodec as ic


# ---------------------------------------------------------------------------
# test-side GIF writer (real LZW)
# ---------------------------------------------------------------------------


class _LSBBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, width):
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices, min_code):
    """Standard GIF LZW: emit CLEAR, build dictionary of index strings,
    bump code width when the NEXT code would not fit, re-CLEAR at 4096."""
    clear = 1 << min_code
    eoi = clear + 1
    bw = _LSBBitWriter()

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code + 1

    table, next_code, width = fresh()
    bw.put(clear, width)
    cur = b""
    for ix in bytes(indices):
        nxt = cur + bytes([ix])
        if nxt in table:
            cur = nxt
            continue
        bw.put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            bw.put(clear, width)
            table, next_code, width = fresh()
        cur = bytes([ix])
    if cur:
        bw.put(table[cur], width)
    bw.put(eoi, width)
    return bw.flush()


def _sub_blocks(data):
    out = b""
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00"


def make_gif(indices, palette, w, h, interlaced=False, transparent=None,
             version=b"GIF89a", local_table=False):
    """indices: (h, w) uint8 into palette [(r,g,b), ...]."""
    n = max(2, (len(palette) - 1).bit_length())  # table size exponent
    size = 1 << n
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * (3 * size - len(pal))
    flat = np.asarray(indices, dtype=np.uint8)
    if interlaced:
        rows = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2),
        ])
        flat = flat[rows]
    min_code = max(2, n)
    out = version + struct.pack("<HHBBB", w, h,
                                (0x80 | (n - 1)) if not local_table else 0,
                                0, 0)
    if not local_table:
        out += bytes(pal)
    if transparent is not None:
        out += b"\x21\xf9\x04" + bytes([1, 0, 0, transparent]) + b"\x00"
    ipacked = (0x40 if interlaced else 0) | ((0x80 | (n - 1)) if local_table else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_table:
        out += bytes(pal)
    out += bytes([min_code])
    out += _sub_blocks(_lzw_encode(flat.reshape(-1).tobytes(), min_code))
    return out + b"\x3b"


def _pal(k):
    return [((i * 37) % 256, (i * 91) % 256, (i * 151) % 256) for i in range(k)]


# ---------------------------------------------------------------------------
# decoder tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k,w,h", [(4, 7, 5), (16, 33, 9), (256, 40, 30)])
def test_gif_roundtrip_exact(k, w, h):
    rng = np.random.default_rng(k)
    idx = rng.integers(0, k, size=(h, w), dtype=np.uint8)
    gif = make_gif(idx, _pal(k), w, h)
    dec = ic.decode_image(gif)
    assert dec is not None and dec[:3] == (w, h, 3)
    pal = np.array(_pal(k), dtype=np.uint8)
    want = pal[idx]
    assert np.array_equal(
        np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, 3), want
    )


def test_gif_dictionary_growth_and_repeats():
    """Long runs force dictionary growth past several width bumps and
    exercise the KwKwK case heavily."""
    w, h = 101, 67
    row = np.tile(np.arange(4, dtype=np.uint8), (w + 3) // 4)[:w]
    idx = np.tile(row, (h, 1))
    idx[::3] = 2  # long constant runs
    gif = make_gif(idx, _pal(4), w, h)
    dec = ic.decode_image(gif)
    pal = np.array(_pal(4), dtype=np.uint8)
    assert np.array_equal(
        np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, 3), pal[idx]
    )


def test_gif_interlaced():
    rng = np.random.default_rng(5)
    w, h = 19, 23
    idx = rng.integers(0, 8, size=(h, w), dtype=np.uint8)
    gif = make_gif(idx, _pal(8), w, h, interlaced=True)
    dec = ic.decode_image(gif)
    pal = np.array(_pal(8), dtype=np.uint8)
    assert np.array_equal(
        np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, 3), pal[idx]
    )


def test_gif_transparency_yields_rgba():
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    gif = make_gif(idx, _pal(4), 2, 2, transparent=2)
    w, h, ch, raster = ic.decode_image(gif)
    assert ch == 4
    px = np.frombuffer(raster, dtype=np.uint8).reshape(2, 2, 4)
    assert px[1, 0, 3] == 0 and px[0, 0, 3] == 255
    pal = np.array(_pal(4), dtype=np.uint8)
    assert np.array_equal(px[:, :, :3], pal[idx])


def test_gif_local_color_table_and_87a():
    idx = np.array([[1, 0, 3]], dtype=np.uint8)
    for kwargs in ({"local_table": True}, {"version": b"GIF87a"}):
        gif = make_gif(idx, _pal(4), 3, 1, **kwargs)
        dec = ic.decode_image(gif)
        pal = np.array(_pal(4), dtype=np.uint8)
        assert np.array_equal(
            np.frombuffer(dec[3], dtype=np.uint8).reshape(1, 3, 3), pal[idx]
        )


def test_gif_truncation_and_garbage_total():
    idx = np.random.default_rng(0).integers(0, 16, (12, 12), np.uint8)
    gif = make_gif(idx, _pal(16), 12, 12)
    for cut in range(0, len(gif), 7):
        ic.decode_image(gif[:cut])  # must never raise
    junk = bytearray(gif)
    for pos in range(6, len(junk), 11):
        junk[pos] ^= 0xA5
        ic.decode_image(bytes(junk))  # must never raise
        junk[pos] ^= 0xA5


def test_gif_through_decode_auto(spark, sf_dir):
    """The multimodal seam stats real GIF pixels."""
    from hindex_spark.operators import multimodal as mm

    idx = np.array([[0, 1, 2, 3]], dtype=np.uint8)
    gif = make_gif(idx, _pal(4), 4, 1)
    stats = mm._decode_auto(gif)
    pal = np.array(_pal(4), dtype=np.uint8)
    raster = pal[idx].reshape(-1)
    assert stats["n_bytes"] == len(gif)
    assert stats["max_byte"] == int(raster.max())
    assert stats["mean_byte"] == pytest.approx(float(raster.mean()))


def test_gif_matches_jvm_imageio(spark):
    """Independent-decoder cross-check: the JVM's ImageIO reads our
    encoded GIF; per-pixel RGB must match our decoder exactly (GIF is
    lossless)."""
    rng = np.random.default_rng(9)
    w, h = 16, 11
    idx = rng.integers(0, 32, size=(h, w), dtype=np.uint8)
    gif = make_gif(idx, _pal(32), w, h)
    ours = np.frombuffer(ic.decode_image(gif)[3], dtype=np.uint8).reshape(h, w, 3)

    jvm = spark.sparkContext._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytes(gif))
    img = jvm.javax.imageio.ImageIO.read(stream)
    assert img is not None, "JVM ImageIO could not parse our GIF"
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            r, g, b = (argb >> 16) & 255, (argb >> 8) & 255, argb & 255
            assert (r, g, b) == tuple(int(v) for v in ours[y, x]), (x, y)
