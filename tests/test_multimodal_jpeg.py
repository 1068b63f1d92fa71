"""JPEG golden fixtures for the multimodal decode seam.

Two real CC0 JPEGs (tests/fixtures/jpeg/) with goldens precomputed via
an independent decoder (Spark's JVM ImageIO image source):

    DP153539.jpg  : baseline SOF0 4:2:0, 300x296, 3ch,
                    raster mean 119.0041, max 255
    grayscale.jpg : PROGRESSIVE SOF2, 300x215, 1ch,
                    raster mean 142.1358, max 255
                    (byte-stub stats: n=36728, mean 117.574711, max 255)

Contract matrix exercised with ZERO skips on every host:

- baseline JPEG decodes to real pixels on EVERY path — Pillow when
  installed, the pure-Python imagecodec baseline decoder otherwise —
  and both must land within the conforming-decoder IDCT spread of the
  ImageIO golden (JPEG decode is not bit-exact across decoders).
- progressive JPEG decodes via Pillow where it exists; without Pillow
  the codec refuses (documented non-baseline contract) and the payload
  takes the deterministic byte stub with EXACT stub stats.
- fixture geometry is verified from the JPEG SOF header in pure Python
  everywhere, independent of any decoder.
"""

import os
import struct

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg")

GOLDEN = {
    "grayscale.jpg": {
        "w": 300, "h": 215, "pixel_mean": 142.1358, "progressive": True,
        "stub": (36728, 117.574711, 255),
    },
    "DP153539.jpg": {
        "w": 300, "h": 296, "pixel_mean": 119.0041, "progressive": False,
        "stub": (26354, 131.669576, 255),
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


def test_jpeg_baseline_codec_matches_imageio_golden():
    """The pure-Python baseline decoder itself: exact geometry, pixel
    mean within the cross-decoder tolerance of the ImageIO golden."""
    from hindex_spark.operators import imagecodec as ic

    payload = open(os.path.join(FIXTURE_DIR, "DP153539.jpg"), "rb").read()
    assert ic.sniff(payload) == "jpeg"
    dec = ic.decode_image(payload)
    assert dec is not None
    w, h, ch, raster = dec
    g = GOLDEN["DP153539.jpg"]
    assert (w, h, ch) == (g["w"], g["h"], 3)
    assert len(raster) == w * h * 3
    mean = sum(raster) / len(raster)
    assert abs(mean - g["pixel_mean"]) < 1.0, mean
    assert max(raster) == 255


def test_jpeg_progressive_refused_by_codec():
    """Progressive (SOF2) is outside the baseline contract: the codec
    returns None (the callers' stub fallback), never a wrong raster."""
    from hindex_spark.operators import imagecodec as ic

    payload = open(os.path.join(FIXTURE_DIR, "grayscale.jpg"), "rb").read()
    assert ic.sniff(payload) == "jpeg"
    assert ic.decode_image(payload) is None


def test_jpeg_fixture_decode_goldens():
    from hindex_spark.operators.multimodal import (
        _decode_auto, _decode_stub, _pil,
    )

    for name, g in GOLDEN.items():
        payload = open(os.path.join(FIXTURE_DIR, name), "rb").read()
        assert _jpeg_dims(payload) == (g["w"], g["h"])
        got = _decode_auto(payload)
        assert got["n_bytes"] == len(payload) == g["stub"][0]
        if not g["progressive"] or _pil() is not None:
            # real pixel decode (PIL or the baseline codec): mean
            # within the JPEG cross-decoder IDCT spread
            assert abs(got["mean_byte"] - g["pixel_mean"]) < 1.5, (
                name, got)
            assert got["max_byte"] == 255
        else:
            # progressive without PIL: documented byte-stub contract
            assert got == _decode_stub(payload)
            assert abs(got["mean_byte"] - g["stub"][1]) < 1e-6
            assert got["max_byte"] == g["stub"][2]


def test_jpeg_fixture_through_extract_features(spark):
    """The same contract through the mapInPandas operator: real JPEG
    blobs ride the Arrow batch path; the baseline image yields pixel
    stats on every host, the progressive one only where PIL exists."""
    from hindex_spark.operators.multimodal import _pil, extract_features

    rows = []
    names = sorted(GOLDEN)
    for i, name in enumerate(names):
        payload = open(os.path.join(FIXTURE_DIR, name), "rb").read()
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: r for r in extract_features(df).collect()}
    for i, name in enumerate(names):
        g = GOLDEN[name]
        assert got[i]["n_bytes"] == g["stub"][0]
        if not g["progressive"] or _pil() is not None:
            assert abs(got[i]["mean_byte"] - g["pixel_mean"]) < 1.5
        else:
            assert abs(got[i]["mean_byte"] - g["stub"][1]) < 1e-6
