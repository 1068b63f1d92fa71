"""G.711 companded audio (mu-law format 7, A-law format 6): the ITU
expansion tables, their compression inverses, container decode through
``decode_wav``, and a full 256-byte cross-validation of BOTH laws
against the JVM's javax.sound converter — an independent G.711
implementation riding in Spark's JVM."""

import numpy as np
import pytest

from hindex_spark.operators import audiocodec as ac

ALL = np.arange(256, dtype=np.uint8)


def test_ulaw_anchors_and_roundtrip():
    u = ac.ulaw_to_linear(ALL)
    assert u[0xFF] == 0 and u[0x7F] == 0          # the +0/-0 pair
    assert u[0x00] == -32124 and u[0x80] == 32124  # full-scale
    rt = ac.linear_to_ulaw(u.astype(np.int32))
    # every byte roundtrips; -0 (0x7F) canonicalizes to +0 (0xFF)
    for b in range(256):
        assert rt[b] == (0xFF if b == 0x7F else b), b


def test_alaw_anchors_and_bijective_roundtrip():
    a = ac.alaw_to_linear(ALL)
    assert a.max() == 32256 and a.min() == -32256
    assert np.abs(a).min() == 8  # A-law has no exact zero level
    rt = ac.linear_to_alaw(a.astype(np.int32))
    assert np.array_equal(rt, ALL)  # all 256 bytes bijective


def test_expansion_monotonic_within_sign():
    for law in (ac.ulaw_to_linear, ac.alaw_to_linear):
        v = law(ALL).astype(np.int64)
        pos = np.sort(v[v > 0])
        assert (np.diff(pos) > 0).all()  # strictly increasing levels


def _g711_wav(law_fmt: int, data: bytes) -> bytes:
    return ac.encode_wav_raw(data, 8000, law_fmt, channels=1, bits=8)


def test_decode_wav_g711_container():
    data = bytes(range(256)) * 2
    for fmt, table in ((ac.WAVE_FORMAT_MULAW, ac.ulaw_to_linear),
                       (ac.WAVE_FORMAT_ALAW, ac.alaw_to_linear)):
        dec = ac.decode_wav(_g711_wav(fmt, data))
        assert dec is not None
        assert dec["audio_format"] == fmt
        assert dec["sample_rate"] == 8000 and dec["channels"] == 1
        assert dec["bits"] == 8 and dec["n_frames"] == 512
        exp = table(np.frombuffer(data, dtype=np.uint8)).astype(np.int32)
        assert np.array_equal(dec["samples_native"].reshape(-1), exp)
        # normalized on the 16-bit linear scale, not the 8-bit one
        assert np.allclose(dec["samples"].reshape(-1), exp / 32768.0)


@pytest.mark.parametrize("fmt,enc_name", [
    (ac.WAVE_FORMAT_MULAW, "ULAW"), (ac.WAVE_FORMAT_ALAW, "ALAW")])
def test_g711_matches_javax_sound_all_bytes(spark, fmt, enc_name):
    """Independent-decoder cross-check: javax.sound expands the same
    256-byte stream to PCM16; our tables must match EXACTLY on every
    byte, both laws."""
    data = bytes(range(256))
    wav = _g711_wav(fmt, data)
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(wav)
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(bais)
    assert enc_name in ais.getFormat().toString()
    Enc = jvm.javax.sound.sampled.AudioFormat.Encoding
    target = jvm.javax.sound.sampled.AudioFormat(
        Enc.PCM_SIGNED, 8000.0, 16, 1, 2, 8000.0, False)
    conv = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
    ref = np.frombuffer(bytes(conv.readAllBytes()), dtype="<i2")
    ours = (ac.ulaw_to_linear if fmt == ac.WAVE_FORMAT_MULAW
            else ac.alaw_to_linear)(np.frombuffer(data, dtype=np.uint8))
    assert np.array_equal(ref, ours), np.nonzero(ref != ours)[0][:10]


def test_audio_stats_over_g711(spark):
    """The operator seam: G.711 blobs decode to real linear stats (and
    the byte stub never fires for them)."""
    from hindex_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")
    rows = {r["doc_id"]: r for r in
            mm.audio_stats(mm.attach_audio_blob_g711(docs)).collect()}
    for d, r in rows.items():
        n = 256 + 2 * (d % 64)
        assert r["n_frames"] == n and r["bits"] == 8
        assert r["sample_rate"] == 8000
        b = ((d * 31 + np.arange(n) * 7) % 256).astype(np.uint8)
        lin = (ac.ulaw_to_linear(b) if d % 2 == 0
               else ac.alaw_to_linear(b)).astype(np.float64)
        assert r["peak"] == float(np.max(np.abs(lin)))
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(lin * lin))))
