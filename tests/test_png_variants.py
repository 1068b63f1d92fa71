"""PNG completeness: depths 1/2/4/8/16, all five color types, Adam7
interlace, palette transparency (tRNS) — imagecodec._decode_png against
a TEST-SIDE writer (real forward filtering, per-row filter variety, real
Adam7 pass packing) and the JVM's ImageIO as an independent decoder.
"""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hindex_spark.operators import imagecodec as ic

_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype, data):
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _pack_row(row, depth):
    """(pw, channels) int array -> packed scanline bytes."""
    flat = row.reshape(-1)
    if depth == 8:
        return flat.astype(np.uint8).tobytes()
    if depth == 16:
        return flat.astype(">u2").tobytes()
    bits = ((flat[:, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def _filter_rows(rows, bpp, filters):
    """Forward-apply PNG filters (one per row, cycling ``filters``)."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for i, line in enumerate(rows):
        f = filters[i % len(filters)]
        out.append(f)
        if f == 0:
            out += line
        elif f == 1:
            out += bytes(
                (line[x] - (line[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(len(line))
            )
        elif f == 2:
            out += bytes((line[x] - prev[x]) & 0xFF for x in range(len(line)))
        elif f == 3:
            out += bytes(
                (line[x] - (((line[x - bpp] if x >= bpp else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(len(line))
            )
        else:  # Paeth
            out += bytes(
                (line[x] - ic._paeth(
                    line[x - bpp] if x >= bpp else 0,
                    prev[x],
                    prev[x - bpp] if x >= bpp else 0,
                )) & 0xFF
                for x in range(len(line))
            )
        prev = line
    return bytes(out)


def write_png(samples, depth, color, interlace=False, palette=None,
              trns=None, filters=(0, 1, 2, 3, 4)):
    """Test-side PNG writer: ``samples`` is (h, w, channels) ints in
    [0, 2^depth); real forward filters and real Adam7 pass layout."""
    h, w, channels = samples.shape
    assert channels == _CHANNELS[color]
    bpp = max(1, channels * depth // 8)
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    data = bytearray()
    for x0, y0, dx, dy in passes:
        sub = samples[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        rows = [_pack_row(sub[y], depth) for y in range(sub.shape[0])]
        data += _filter_rows(rows, bpp, filters)
    out = ic._PNG_SIG
    out += _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0))
    if color == 3:
        pal = bytearray()
        for r, g, b in palette:
            pal += bytes([r, g, b])
        out += _chunk(b"PLTE", bytes(pal))
        if trns is not None:
            out += _chunk(b"tRNS", bytes(trns))
    out += _chunk(b"IDAT", zlib.compress(bytes(data), 6))
    return out + _chunk(b"IEND", b"")


def _expected_8bit(samples, depth, color, palette=None, trns=None):
    """The decoder's documented 8-bit mapping."""
    if color == 3:
        pal = np.array(palette, dtype=np.uint8)
        idx = samples[:, :, 0]
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[: len(trns)] = list(trns)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if depth == 16:
        return (samples >> 8).astype(np.uint8)
    if depth < 8:
        return (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return samples.astype(np.uint8)


@st.composite
def png_case(draw):
    depth = draw(st.sampled_from([1, 2, 4, 8, 16]))
    color = draw(st.sampled_from(
        {1: [0, 3], 2: [0, 3], 4: [0, 3], 8: [0, 2, 3, 4, 6],
         16: [0, 2, 4, 6]}[depth]
    ))
    w = draw(st.integers(min_value=1, max_value=21))
    h = draw(st.integers(min_value=1, max_value=17))
    interlace = draw(st.booleans())
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    ch = _CHANNELS[color]
    rng = np.random.default_rng(seed)
    if color == 3:
        k = min(1 << depth, 16)
        samples = rng.integers(0, k, size=(h, w, 1), dtype=np.int64)
        palette = [((i * 37) % 256, (i * 91) % 256, (i * 151) % 256)
                   for i in range(k)]
        trns = bytes(rng.integers(0, 256, size=k, dtype=np.int64).tolist()) \
            if draw(st.booleans()) else None
    else:
        samples = rng.integers(0, 1 << depth, size=(h, w, ch), dtype=np.int64)
        palette = trns = None
    return samples, depth, color, interlace, palette, trns


@settings(max_examples=120, deadline=None)
@given(png_case())
def test_png_roundtrip_every_variant(case):
    """Writer -> decoder identity across every color type x depth x
    interlace combination, with all five filters exercised per image."""
    samples, depth, color, interlace, palette, trns = case
    png = write_png(samples, depth, color, interlace, palette, trns)
    dec = ic.decode_image(png)
    assert dec is not None, (depth, color, interlace)
    w, h = samples.shape[1], samples.shape[0]
    exp = _expected_8bit(samples, depth, color, palette, trns)
    assert dec[0] == w and dec[1] == h and dec[2] == exp.shape[2]
    got = np.frombuffer(dec[3], dtype=np.uint8).reshape(exp.shape)
    assert np.array_equal(got, exp), (depth, color, interlace)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=256))
def test_png_total_on_garbage(data):
    ic.decode_image(ic._PNG_SIG + data)  # must not raise


@settings(max_examples=60, deadline=None)
@given(png_case(), st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=0, max_value=255))
def test_png_total_on_byte_flip(case, pos, val):
    samples, depth, color, interlace, palette, trns = case
    png = bytearray(write_png(samples, depth, color, interlace, palette, trns))
    png[pos % len(png)] = val
    ic.decode_image(bytes(png))  # None or a decode — never a crash


@pytest.mark.parametrize("depth,color,interlace", [
    (16, 0, False), (16, 2, False), (16, 2, True), (16, 6, False),
    (8, 2, True), (8, 6, True), (8, 3, True),
    (4, 0, True), (2, 0, False), (1, 0, True), (4, 3, False),
])
def test_png_matches_jvm_imageio(spark, depth, color, interlace):
    """Independent-decoder cross-check: ImageIO reads the same file;
    8-bit variants must match exactly, 16-bit within the 1-count
    rounding spread (we emit the high byte = floor(v/256); Java's
    ColorModel scales by v*255/65535 — off-by-one at worst)."""
    rng = np.random.default_rng(depth * 100 + color * 10 + interlace)
    w, h = 19, 13
    ch = _CHANNELS[color]
    if color == 3:
        k = min(1 << depth, 16)
        samples = rng.integers(0, k, size=(h, w, 1), dtype=np.int64)
        palette = [((i * 37) % 256, (i * 91) % 256, (i * 151) % 256)
                   for i in range(k)]
        png = write_png(samples, depth, color, interlace, palette)
    else:
        samples = rng.integers(0, 1 << depth, size=(h, w, ch), dtype=np.int64)
        png = write_png(samples, depth, color, interlace)
    dec = ic.decode_image(png)
    assert dec is not None
    ours = np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, dec[2])

    jvm = spark.sparkContext._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytes(png))
    img = jvm.javax.imageio.ImageIO.read(stream)
    assert img is not None, "JVM ImageIO could not parse our PNG"
    if depth == 16 and color == 0:
        # Java's getRGB() on TYPE_USHORT_GRAY runs the linear-gray ->
        # sRGB gamma transform; compare the RAW 16-bit raster samples
        # instead (our contract: high byte).
        raster = img.getRaster()
        for y in range(h):
            for x in range(w):
                v = raster.getSample(x, y, 0)
                assert int(ours[y, x, 0]) == (v >> 8), (x, y, v)
        return
    tol = 1 if depth == 16 else 0
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            jr, jg, jb = (argb >> 16) & 255, (argb >> 8) & 255, argb & 255
            if dec[2] == 1:
                o = int(ours[y, x, 0])
                orr, og, ob = o, o, o
            elif dec[2] == 2:
                o = int(ours[y, x, 0])
                orr, og, ob = o, o, o
            else:
                orr, og, ob = (int(v) for v in ours[y, x, :3])
            assert abs(jr - orr) <= tol and abs(jg - og) <= tol \
                and abs(jb - ob) <= tol, (x, y, (jr, jg, jb), (orr, og, ob))
