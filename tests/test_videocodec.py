"""AVI codec (operators/videocodec.py) + multimodal video operators.

Codec tier: encode/decode roundtrips for uncompressed DIB (row padding,
bottom-up flip, BGR->RGB), MJPEG frames through the pure-Python JPEG
decoder, container-walk robustness (nested LISTs, rec-grouped movi,
truncation, non-AVI RIFF), and the closed-form container size the
oracle gates rely on. Spark tier: the mapInPandas operators re-derived
with plain numpy over the same payloads.
"""

import struct

import numpy as np
import pytest

from hindex_spark.operators import imagecodec as ic
from hindex_spark.operators import multimodal as mm
from hindex_spark.operators import videocodec as vc


def _frames(n=5, h=2, w=3, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def _chunk(cid, body):
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h", [(3, 2), (4, 4), (5, 3), (1, 1)])
def test_dib_roundtrip_exact(w, h):
    """Row padding differs per width (w=3 pads 9->12, w=4 pads none,
    w=5 pads 15->16); every geometry must roundtrip byte-exactly."""
    frames = _frames(4, h, w, seed=w * 10 + h)
    dec = vc.decode_avi(vc.encode_avi(frames, fps_rate=30, fps_scale=1))
    assert dec["width"] == w and dec["height"] == h
    assert dec["n_frames"] == 4
    assert dec["rate"] == 30 and dec["scale"] == 1
    assert dec["compression"] == vc.BI_RGB and dec["bit_count"] == 24
    for i, f in enumerate(frames):
        fw, fh, ch, raster = vc.frame_raster(dec, i)
        got = np.frombuffer(raster, dtype=np.uint8).reshape(fh, fw, 3)
        assert np.array_equal(got, f)


def test_container_size_closed_form():
    """The video oracles assert n_bytes = 224 + 32*n for 3x2 frames;
    pin that the encoder's canonical layout actually produces it."""
    for n in (1, 4, 8):
        avi = vc.encode_avi(_frames(n), fps_rate=10, fps_scale=1)
        assert len(avi) == 224 + 32 * n


def test_truncated_movi_is_total():
    avi = vc.encode_avi(_frames(5))
    dec = vc.decode_avi(avi[:-10])  # cuts into the last frame chunk
    assert dec is not None
    assert vc.frame_raster(dec, 4) is None  # short chunk refuses
    assert vc.frame_raster(dec, 3) is not None  # earlier frames intact


def test_rec_grouped_movi_chunks():
    """Interleaved AVIs group movi chunks inside LIST 'rec ' — the
    walker must descend into them."""
    frames = _frames(2)
    plain = vc.encode_avi(frames)
    dec0 = vc.decode_avi(plain)
    # rebuild: wrap each frame chunk in its own rec list
    row = 12  # 3px * 3B = 9 -> padded 12
    body = plain
    movi_at = body.find(b"movi")
    head = body[: movi_at - 8]  # up to the movi LIST header
    fchunks = []
    for i in range(2):
        raw = np.zeros((2, row), dtype=np.uint8)
        bgr = frames[i][:, :, [2, 1, 0]]
        raw[:, :9] = bgr[::-1].reshape(2, 9)
        fchunks.append(_chunk(b"LIST", b"rec " + _chunk(b"00db", raw.tobytes())))
    movi = b"movi" + b"".join(fchunks)
    rebuilt = head + _chunk(b"LIST", movi)
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt) - 8 + 0) + rebuilt[8:]
    dec = vc.decode_avi(rebuilt)
    assert dec is not None and len(dec["frames"]) == 2
    for i in range(2):
        assert vc.frame_raster(dec, i) == vc.frame_raster(dec0, i)


def test_mjpeg_frames_via_jpeg_decoder():
    jp = open("tests/fixtures/jpeg/grayscale.jpg", "rb").read()
    img = ic.decode_image(jp)
    w, h = img[0], img[1]
    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 0, 0, 0x10, 2, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 2, 0, 0, 0)
            + struct.pack("<HHHH", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, vc.FOURCC_MJPG, 0, 0, 0, 0, 0)
    strl = b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
    hdrl = b"hdrl" + _chunk(b"avih", avih) + _chunk(b"LIST", strl)
    movi = b"movi" + _chunk(b"00dc", jp) + _chunk(b"00dc", jp)
    riff = b"AVI " + _chunk(b"LIST", hdrl) + _chunk(b"LIST", movi)
    dec = vc.decode_avi(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert dec["compression"] == vc.FOURCC_MJPG and dec["n_frames"] == 2
    fw, fh, ch, raster = vc.frame_raster(dec, 0)
    assert (fw, fh, ch) == (w, h, 3)
    gray = np.frombuffer(img[3], dtype=np.uint8)
    rgb = np.frombuffer(raster, dtype=np.uint8).reshape(-1, 3)
    assert np.array_equal(rgb[:, 0], gray) and np.array_equal(rgb[:, 2], gray)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF" + struct.pack("<I", 4) + b"WAVE",  # RIFF but not AVI
        b"RIFF" + struct.pack("<I", 4) + b"AVI ",  # AVI with no headers
        b"\x00" * 64,
    ],
)
def test_undecodable_returns_none(payload):
    assert vc.decode_avi(payload) is None


def test_unsupported_codec_parses_metadata_only():
    avi = bytearray(vc.encode_avi(_frames(2)))
    pos = avi.find(struct.pack("<IiiHH", 40, 3, 2, 1, 24))
    comp_at = pos + 16
    avi[comp_at : comp_at + 4] = b"X264"  # pretend it's h264
    dec = vc.decode_avi(bytes(avi))
    assert dec is not None and dec["n_frames"] == 2
    assert vc.frame_raster(dec, 0) is None  # refuses pixels, keeps metadata


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def test_video_stats_operator(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(15)
    rows = mm.video_stats(mm.attach_video_blob(docs)).collect()
    assert len(rows) == 15
    for r in rows:
        frames = mm._video_formula_frames(r.doc_id)
        allpx = np.concatenate([f.reshape(-1) for f in frames]).astype(np.float64)
        n = len(frames)
        assert (r.width, r.height, r.fps) == (3, 2, 10.0)
        assert r.n_frames == n and r.duration_ms == n * 100
        assert r.n_bytes == 224 + 32 * n
        assert r.mean_px == pytest.approx(float(allpx.mean()), abs=1e-9)
        assert r.max_px == int(allpx.max())


def test_video_stats_undecodable_blob_keeps_row(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(4)
    rows = mm.video_stats(mm.attach_blob(docs)).collect()  # utf-8 blobs
    assert len(rows) == 4
    assert all(r.width is None and r.mean_px is None for r in rows)


def test_video_frame_features_samples_every_other(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    rows = mm.video_frame_features(mm.attach_video_blob(docs), every=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frs in by_doc.items():
        frames = mm._video_formula_frames(doc_id)
        want = list(range(0, len(frames), 2))
        assert sorted(r.frame_no for r in frs) == want
        for r in frs:
            px = frames[r.frame_no].reshape(-1).astype(np.float64)
            assert r.mean_px == pytest.approx(float(px.mean()), abs=1e-9)
            assert r.max_px == int(px.max())
