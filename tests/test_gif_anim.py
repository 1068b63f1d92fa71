"""Animated GIF: multi-frame decode with disposal compositing
(imagecodec.gif_frames) and the GIF89a writer (imagecodec.encode_gif).

Validation strategy mirrors the single-frame GIF suite:

* an INDEPENDENT test-side animation writer (built on the real-LZW
  encoder from tests/test_gifcodec.py) drives the decoder, and a
  per-pixel numpy reference compositor checks disposal/offset/
  transparency semantics frame by frame (hypothesis-driven);
* our own writer's output is cross-checked against the JVM's ImageIO
  multi-frame GIF reader (an independent implementation riding in
  Spark's JVM) per frame, per pixel;
* byte-flip / truncation totality at the operator seam.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hindex_spark.operators import imagecodec as ic
from test_gifcodec import _lzw_encode, _pal, _sub_blocks


def make_anim(specs, palette, w, h):
    """Independent multi-frame GIF89a writer: ``specs`` is a list of
    (idx (ih, iw) uint8, left, top, disposal, transparent)."""
    n = max(2, (len(palette) - 1).bit_length())
    size = 1 << n
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * (3 * size - len(pal))
    min_code = max(2, n)
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (n - 1), 0, 0)
    out += bytes(pal)
    for idx, left, top, disposal, transparent in specs:
        ih, iw = idx.shape
        gflags = (disposal & 7) << 2
        tr = 0
        if transparent is not None:
            gflags |= 1
            tr = transparent
        out += b"\x21\xf9\x04" + bytes([gflags, 0, 0, tr]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, 0)
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(idx.reshape(-1).tobytes(), min_code))
    return out + b"\x3b"


def composite_reference(specs, palette, w, h):
    """Per-pixel reference compositor (independent of the decoder's
    vectorized path): disposal 0/1 leave, 2 clears the rect, 3 restores
    the pre-frame canvas; transparent indices never paint."""
    pal = np.array(palette, dtype=np.uint8)
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    out = []
    for idx, left, top, disposal, transparent in specs:
        ih, iw = idx.shape
        y0, x0 = min(top, h), min(left, w)
        y1, x1 = min(top + ih, h), min(left + iw, w)
        saved = canvas.copy()
        for yy in range(y1 - y0):
            for xx in range(x1 - x0):
                v = int(idx[yy, xx])
                if transparent is not None and v == transparent:
                    continue
                canvas[y0 + yy, x0 + xx, :3] = pal[min(v, len(pal) - 1)]
                canvas[y0 + yy, x0 + xx, 3] = 255
        out.append(canvas.copy())
        if disposal == 2:
            canvas[y0:y1, x0:x1] = 0
        elif disposal == 3:
            canvas = saved
    return out


@st.composite
def anim_spec(draw):
    w = draw(st.integers(min_value=2, max_value=12))
    h = draw(st.integers(min_value=2, max_value=10))
    k = draw(st.sampled_from([4, 8, 16]))
    n_frames = draw(st.integers(min_value=1, max_value=4))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    specs = []
    for f in range(n_frames):
        if f == 0 or draw(st.booleans()):
            iw, ih, left, top = w, h, 0, 0  # full-screen frame
        else:
            iw = draw(st.integers(min_value=1, max_value=w))
            ih = draw(st.integers(min_value=1, max_value=h))
            left = draw(st.integers(min_value=0, max_value=w - iw))
            top = draw(st.integers(min_value=0, max_value=h - ih))
        disposal = draw(st.sampled_from([0, 1, 2, 3]))
        transparent = draw(st.sampled_from([None, 0, k - 1]))
        idx = rng.integers(0, k, size=(ih, iw), dtype=np.uint8)
        specs.append((idx, left, top, disposal, transparent))
    return specs, k, w, h


@settings(max_examples=80, deadline=None)
@given(anim_spec())
def test_gif_anim_compositing_property(spec):
    """gif_frames == the per-pixel reference compositor for every
    combination of rects, disposal methods, and transparency."""
    specs, k, w, h = spec
    gif = make_anim(specs, _pal(k), w, h)
    expected = composite_reference(specs, _pal(k), w, h)
    got = list(ic.gif_frames(gif))
    assert len(got) == len(expected)
    for (fno, fw, fh, ch, raster), exp in zip(got, expected):
        assert (fw, fh, ch) == (w, h, 4)
        assert np.array_equal(
            np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 4), exp
        ), fno


@settings(max_examples=60, deadline=None)
@given(anim_spec())
def test_encode_gif_roundtrip_property(spec):
    """Our writer -> our decoder is the identity under the same
    reference compositor semantics (writer emits per-frame GCE)."""
    specs, k, w, h = spec
    gif = ic.encode_gif(specs, _pal(k), w, h)
    expected = composite_reference(specs, _pal(k), w, h)
    got = list(ic.gif_frames(gif))
    assert len(got) == len(expected)
    for (fno, _fw, _fh, _ch, raster), exp in zip(got, expected):
        assert np.array_equal(
            np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 4), exp
        ), fno


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1),
       st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=0, max_value=255))
def test_gif_anim_total_on_byte_flip(seed, pos, val):
    """Flip any byte (or truncate) of a valid animation: the operator
    seam's contract is catchable failure — ValueError/struct/index
    errors are fine, interpreter-level blowups (RecursionError,
    MemoryError) are not, and valid prefixes may still yield frames."""
    rng = np.random.default_rng(seed)
    specs = [
        (rng.integers(0, 8, size=(6, 7), dtype=np.uint8), 0, 0, 1, None)
        for _ in range(3)
    ]
    gif = bytearray(make_anim(specs, _pal(8), 7, 6))
    p = pos % len(gif)
    gif[p] = val
    try:
        for _ in ic.gif_frames(bytes(gif[: max(8, p)])):
            pass
    except (ValueError, struct.error, IndexError, KeyError):
        pass
    try:
        for _ in ic.gif_frames(bytes(gif)):
            pass
    except (ValueError, struct.error, IndexError, KeyError):
        pass


def test_gif_anim_matches_jvm_imageio(spark):
    """Independent-decoder cross-check of the WRITER + multi-frame
    semantics: the JVM ImageIO GIF reader reads every frame of our
    encode_gif output; full-screen opaque frames mean raw frame ==
    composited frame, so per-pixel RGB must match exactly."""
    rng = np.random.default_rng(11)
    w, h, k, n = 9, 7, 32, 4
    frames = [rng.integers(0, k, size=(h, w), dtype=np.uint8) for _ in range(n)]
    gif = ic.encode_gif(frames, _pal(k), w, h)
    ours = [
        np.frombuffer(r, dtype=np.uint8).reshape(h, w, 4)
        for _fno, _w, _h, _ch, r in ic.gif_frames(gif)
    ]
    assert len(ours) == n

    jvm = spark.sparkContext._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytes(gif))
    iis = jvm.javax.imageio.ImageIO.createImageInputStream(stream)
    readers = jvm.javax.imageio.ImageIO.getImageReaders(iis)
    assert readers.hasNext(), "JVM has no GIF reader"
    reader = readers.next()
    reader.setInput(iis)
    n_jvm = reader.getNumImages(True)
    assert n_jvm == n
    for i in range(n):
        img = reader.read(i)
        for y in range(h):
            for x in range(w):
                argb = img.getRGB(x, y)
                r, g, b = (argb >> 16) & 255, (argb >> 8) & 255, argb & 255
                assert (r, g, b) == tuple(int(v) for v in ours[i][y, x, :3]), (
                    i, x, y
                )


def test_video_frame_features_dispatches_gif(spark):
    """The frame-features seam handles AVI and animated GIF in ONE
    corpus: per-container frame stats, every-Nth sampling on both."""
    from hindex_spark.operators import multimodal as mm
    from hindex_spark.operators import videocodec as vc

    # one real AVI + one real animated GIF + one garbage blob
    avi = vc.encode_avi(
        [np.full((2, 3, 3), 10, dtype=np.uint8),
         np.full((2, 3, 3), 20, dtype=np.uint8),
         np.full((2, 3, 3), 30, dtype=np.uint8)],
        fps_rate=10, fps_scale=1,
    )
    gif = ic.encode_gif(
        [np.full((2, 3), 40, dtype=np.uint8),
         np.full((2, 3), 50, dtype=np.uint8),
         np.full((2, 3), 60, dtype=np.uint8)],
        [(i, i, i) for i in range(256)], 3, 2,
    )
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(gif)), (3, bytearray(b"junk"))],
        "doc_id long, blob binary",
    )
    rows = {(r["doc_id"], r["frame_no"]): (r["mean_px"], r["max_px"])
            for r in mm.video_frame_features(df, every=2).collect()}
    assert set(rows) == {(1, 0), (1, 2), (2, 0), (2, 2)}
    assert rows[(1, 0)] == (10.0, 10) and rows[(1, 2)] == (30.0, 30)
    assert rows[(2, 0)] == (40.0, 40) and rows[(2, 2)] == (60.0, 60)


def test_gif_anim_sequential_decode_cost_note():
    """gif_frames is a GENERATOR: taking the first frame of a long
    animation must not decode the rest (lazy iteration — the cheapest
    shape the sequential format allows)."""
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 4, size=(30, 40), dtype=np.uint8)
              for _ in range(50)]
    gif = ic.encode_gif(frames, _pal(4), 40, 30)
    it = ic.gif_frames(gif)
    fno, w, h, ch, raster = next(it)
    assert fno == 0 and (w, h) == (40, 30)
    it.close()


def test_video_stats_gif_branch(spark):
    """video_stats on an animated GIF: geometry from the screen,
    fps/duration from GCE delays, pixel stats over composited frames;
    corrupt GIFs keep the NULL-fields contract."""
    from hindex_spark.operators import multimodal as mm

    frames = [np.full((2, 3), v, dtype=np.uint8) for v in (10, 20, 60)]
    gif = ic.encode_gif(frames, [(i, i, i) for i in range(256)], 3, 2,
                        delay_cs=5)
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"GIF89a" + b"\x00" * 20))],
        "doc_id long, blob binary",
    )
    rows = {r["doc_id"]: r for r in mm.video_stats(df).collect()}
    r = rows[1]
    assert (r["width"], r["height"]) == (3, 2)
    assert r["n_frames"] == 3 and r["duration_ms"] == 150
    assert r["fps"] == 20.0
    assert r["mean_px"] == 30.0 and r["max_px"] == 60
    assert rows[2]["width"] is None and rows[2]["n_frames"] is None
