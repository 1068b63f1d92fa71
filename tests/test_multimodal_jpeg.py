"""JPEG golden fixtures for the multimodal decode seam.

Two real CC0 JPEGs (tests/fixtures/jpeg/) with goldens precomputed via
an independent decoder (Spark's JVM ImageIO image source):

    DP153539.jpg  : BASELINE SOF0 4:2:0, 300x296, 3ch,
                    raster mean 119.0041, max 255
    grayscale.jpg : PROGRESSIVE SOF2, 300x215, 1ch,
                    raster mean 142.1358, max 255

Both decode to REAL pixels on every host — Pillow when installed, the
pure-Python imagecodec T.81 decoder otherwise — and must land within
the conforming-decoder IDCT spread of the ImageIO goldens (JPEG decode
is not bit-exact across decoders; the codec itself was validated
per-pixel against ImageIO at p99 deviation <= 2, progressive exact to
maxdiff 1). Fixture geometry is additionally verified from the JPEG
SOF header in pure Python, independent of any decoder. Zero skips.
"""

import os
import struct

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg")

GOLDEN = {
    "grayscale.jpg": {
        "w": 300, "h": 215, "ch": 1, "pixel_mean": 142.1358,
        "n_bytes": 36728,
    },
    "DP153539.jpg": {
        "w": 300, "h": 296, "ch": 3, "pixel_mean": 119.0041,
        "n_bytes": 26354,
    },
}


def _jpeg_dims(payload: bytes):
    """Width/height from the SOF marker — pure header parse, no
    decoder; proves the committed fixtures are structurally real JPEGs
    with the expected geometry on any host."""
    assert payload[:2] == b"\xff\xd8", "not a JPEG"
    i = 2
    while i < len(payload) - 9:
        assert payload[i] == 0xFF
        marker = payload[i + 1]
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            h, w = struct.unpack(">HH", payload[i + 5:i + 9])
            return w, h
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2:i + 4])
        i += 2 + seglen
    raise AssertionError("no SOF marker found")


def test_jpeg_codec_matches_imageio_goldens():
    """The pure-Python T.81 decoder on both modes: exact geometry and
    channel count, pixel mean within the cross-decoder tolerance."""
    from hindex_spark.operators import imagecodec as ic

    for name, g in GOLDEN.items():
        payload = open(os.path.join(FIXTURE_DIR, name), "rb").read()
        assert ic.sniff(payload) == "jpeg"
        dec = ic.decode_image(payload)
        assert dec is not None, name
        w, h, ch, raster = dec
        assert (w, h, ch) == (g["w"], g["h"], g["ch"])
        assert len(raster) == w * h * ch
        mean = sum(raster) / len(raster)
        assert abs(mean - g["pixel_mean"]) < 1.0, (name, mean)
        assert max(raster) == 255


def test_jpeg_codec_refuses_non_dct_variants():
    """A mangled SOF (hierarchical marker) must refuse -> None (the
    callers' stub fallback), never a wrong raster; truncated entropy
    data must still return a full-geometry raster (zero-padded bits),
    not crash — the resilient-decoder contract."""
    from hindex_spark.operators import imagecodec as ic

    payload = bytearray(
        open(os.path.join(FIXTURE_DIR, "DP153539.jpg"), "rb").read())
    i = payload.find(b"\xff\xc0")
    assert i > 0
    payload[i + 1] = 0xC3  # SOF3 (lossless hierarchical): unsupported
    assert ic.decode_image(bytes(payload)) is None
    whole = open(os.path.join(FIXTURE_DIR, "DP153539.jpg"), "rb").read()
    cut = ic.decode_image(whole[: len(whole) // 2])
    assert cut is not None and (cut[0], cut[1], cut[2]) == (300, 296, 3)


def test_jpeg_fixture_decode_goldens():
    """The seam: _decode_auto yields pixel stats for both fixtures on
    every host (PIL or codec), never the byte stub."""
    from hindex_spark.operators.multimodal import _decode_auto

    for name, g in GOLDEN.items():
        payload = open(os.path.join(FIXTURE_DIR, name), "rb").read()
        assert _jpeg_dims(payload) == (g["w"], g["h"])
        got = _decode_auto(payload)
        assert got["n_bytes"] == len(payload) == g["n_bytes"]
        assert abs(got["mean_byte"] - g["pixel_mean"]) < 1.5, (name, got)
        assert got["max_byte"] == 255


def test_jpeg_fixture_through_extract_features(spark):
    """The same contract through the mapInPandas operator: real JPEG
    blobs ride the Arrow batch path and yield pixel stats on every
    host."""
    from hindex_spark.operators.multimodal import extract_features

    rows = []
    names = sorted(GOLDEN)
    for i, name in enumerate(names):
        payload = open(os.path.join(FIXTURE_DIR, name), "rb").read()
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: r for r in extract_features(df).collect()}
    for i, name in enumerate(names):
        g = GOLDEN[name]
        assert got[i]["n_bytes"] == g["n_bytes"]
        assert abs(got[i]["mean_byte"] - g["pixel_mean"]) < 1.5


def test_jpeg_blob_real_resize(spark):
    """resize_blobs(target_size=...) on a real JPEG blob: the codec (or
    PIL) decodes, nearest-resamples, and re-encodes PNG — the output
    must be a decodable 8x8 image whose pixels come from the photo
    (not the byte-sampler stand-in)."""
    from hindex_spark.operators import imagecodec as ic
    from hindex_spark.operators.multimodal import resize_blobs

    payload = open(os.path.join(FIXTURE_DIR, "DP153539.jpg"), "rb").read()
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, blob binary")
    out = resize_blobs(df, target_size=(8, 8)).collect()[0]
    dec = ic.decode_image(bytes(out["blob"]))
    assert dec is not None
    w, h, ch, raster = dec
    assert (w, h, ch) == (8, 8, 3)
    g = GOLDEN["DP153539.jpg"]
    # an 8x8 nearest sample of the photo keeps its brightness ballpark;
    # the byte-sampler stand-in over compressed JPEG bytes would not
    # decode as PNG at all, so reaching here already proves the path
    mean = sum(raster) / len(raster)
    assert abs(mean - g["pixel_mean"]) < 40, mean
