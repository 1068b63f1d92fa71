"""WAV codec (operators/audiocodec.py) + multimodal audio operators.

Codec tier is pure numpy (no Spark): byte-exact roundtrips for every
PCM width, cross-validation against the CPython stdlib ``wave`` module
(an independent RIFF implementation), float formats, the EXTENSIBLE
wrapper, chunk-walk robustness, truncation totality, and resample
algebra. The Spark tier runs the mapInPandas operators end to end and
re-derives their outputs with plain numpy over the same payloads.
"""

import io
import struct
import wave

import numpy as np
import pytest

from hindex_spark.operators import audiocodec as ac
from hindex_spark.operators import multimodal as mm


def _pcm16(n=50, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32767, size=(n, ch), dtype=np.int64)


# ---------------------------------------------------------------------------
# codec: decode/encode
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2, 3])
def test_roundtrip_pcm_widths(bits, channels):
    scale = int(ac._PCM_SCALE[bits])
    rng = np.random.default_rng(bits * 10 + channels)
    x = rng.integers(-scale, scale - 1, size=(64, channels), dtype=np.int64)
    dec = ac.decode_wav(ac.encode_wav(x, 44100, bits=bits))
    assert dec["bits"] == bits
    assert dec["channels"] == channels
    assert dec["sample_rate"] == 44100
    assert dec["n_frames"] == 64
    assert np.array_equal(dec["samples_native"], x)
    assert np.allclose(dec["samples"], x / scale)


def test_extreme_values_roundtrip():
    x = np.array([[-32768], [32767], [0], [-1], [1]], dtype=np.int64)
    dec = ac.decode_wav(ac.encode_wav(x, 8000, bits=16))
    assert np.array_equal(dec["samples_native"], x)
    assert dec["samples"].min() == -1.0  # -32768/32768 hits the norm floor


def test_stdlib_wave_cross_validation():
    """Our encode must be readable by the stdlib wave module and our
    decode must read stdlib-written files — two independent RIFF
    implementations agreeing byte-for-byte."""
    x = _pcm16(n=40, ch=2, seed=3)
    ours = ac.encode_wav(x, 22050, bits=16)
    r = wave.open(io.BytesIO(ours), "rb")
    assert (r.getnchannels(), r.getframerate(), r.getnframes()) == (2, 22050, 40)
    assert r.readframes(40) == x.astype("<i2").tobytes()

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(22050)
    w.writeframes(x.astype("<i2").tobytes())
    w.close()
    dec = ac.decode_wav(buf.getvalue())
    assert dec["sample_rate"] == 22050
    assert np.array_equal(dec["samples_native"], x)


@pytest.mark.parametrize("bits,dt", [(32, "<f4"), (64, "<f8")])
def test_ieee_float_formats(bits, dt):
    xf = np.random.default_rng(9).uniform(-1, 1, size=(30, 1))
    body = xf.astype(dt).tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000,
                                8000 * bits // 8, bits // 8, bits)
        + b"data" + struct.pack("<I", len(body))
    )
    dec = ac.decode_wav(hdr + body)
    assert dec["audio_format"] == ac.WAVE_FORMAT_IEEE_FLOAT
    assert np.allclose(dec["samples"][:, 0], xf[:, 0].astype(dt).astype(np.float64))


def test_extensible_wrapper_unwraps_to_pcm():
    x = _pcm16(n=10)
    body = x.astype("<i2").tobytes()
    ext = (
        struct.pack("<HHIIHH", ac.WAVE_FORMAT_EXTENSIBLE, 1, 8000, 16000, 2, 16)
        + struct.pack("<H", 22) + struct.pack("<HI", 16, 4)
        + struct.pack("<H", ac.WAVE_FORMAT_PCM) + b"\x00" * 14
    )
    wavb = (
        b"RIFF" + struct.pack("<I", 36 + len(ext) + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(ext)) + ext
        + b"data" + struct.pack("<I", len(body)) + body
    )
    dec = ac.decode_wav(wavb)
    assert dec["audio_format"] == ac.WAVE_FORMAT_PCM
    assert np.array_equal(dec["samples_native"], x)


def test_unknown_and_odd_chunks_are_skipped():
    x = _pcm16(n=10)
    body = x.astype("<i2").tobytes()
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    core = (
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + odd + b"data" + struct.pack("<I", len(body)) + body
    )
    dec = ac.decode_wav(b"RIFF" + struct.pack("<I", 4 + len(core)) + b"WAVE" + core)
    assert np.array_equal(dec["samples_native"][:, 0], x[:, 0])


def test_truncated_data_clamps_to_whole_frames():
    x = _pcm16(n=10, ch=2)
    full = ac.encode_wav(x, 8000, bits=16)
    dec = ac.decode_wav(full[:-5])  # cuts mid-frame
    assert dec is not None
    assert dec["n_frames"] == 8  # 40-5=35 bytes -> 8 whole 4-byte frames
    assert np.array_equal(dec["samples_native"], x[:8])


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"not audio",
        b"RIFF\x00\x00\x00\x00WAVE",  # no chunks
        b"RIFX" + b"\x00" * 64,  # wrong magic
        # ADPCM (format 2): compressed, must refuse not misdecode
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
        + struct.pack("<I", 16) + struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4)
        + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00",
    ],
)
def test_undecodable_returns_none(payload):
    assert ac.decode_wav(payload) is None


# ---------------------------------------------------------------------------
# codec: resample
# ---------------------------------------------------------------------------


def test_resample_identity_and_decimation():
    x = _pcm16(n=100).astype(np.float64)
    assert np.array_equal(ac.resample_linear(x, 8000, 8000), x)
    half = ac.resample_linear(x, 8000, 4000)
    assert np.array_equal(half[:, 0], x[::2, 0])  # integer positions: exact


def test_resample_linear_ramp_is_exact():
    ramp = np.arange(100, dtype=np.float64)[:, None]
    up = ac.resample_linear(ramp, 4000, 8000)
    assert up.shape[0] == 199  # positions 0 .. 99 step 0.5, no extrapolation
    assert np.allclose(up[:, 0], np.arange(199) * 0.5)


def test_resample_never_extrapolates():
    x = _pcm16(n=33).astype(np.float64)
    for dst in (3000, 6000, 11025, 44100):
        y = ac.resample_linear(x, 8000, dst)
        assert y.min() >= x.min() and y.max() <= x.max()
        assert y.shape[0] == (33 - 1) * dst // 8000 + 1


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def _numpy_oracle_stats(doc_id: int):
    v = mm._audio_formula_samples(doc_id).astype(np.float64)
    return (
        v.shape[0],
        float(np.sqrt(np.mean(v * v))),
        float(np.max(np.abs(v))),
    )


def test_audio_stats_operator(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    rows = mm.audio_stats(mm.attach_audio_blob(docs)).collect()
    assert len(rows) == 20
    for r in rows:
        n, rms, peak = _numpy_oracle_stats(r.doc_id)
        assert r.sample_rate == 8000 and r.channels == 1 and r.bits == 16
        assert r.n_frames == n
        assert r.n_bytes == 44 + 2 * n
        assert r.duration_ms == n * 1000 // 8000
        assert r.rms == pytest.approx(rms, abs=1e-9)
        assert r.peak == peak


def test_audio_stats_undecodable_blob_keeps_row(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    rows = mm.audio_stats(mm.attach_blob(docs)).collect()  # utf-8 blobs
    assert len(rows) == 5
    assert all(r.sample_rate is None and r.rms is None for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_audio_windows_operator(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    rows = mm.audio_windows(mm.attach_audio_blob(docs), window=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, wins in by_doc.items():
        v = mm._audio_formula_samples(doc_id).astype(np.float64)
        n = v.shape[0]
        assert len(wins) == (n + 15) // 16
        for r in sorted(wins, key=lambda r: r.win_no):
            seg = v[r.win_no * 16 : (r.win_no + 1) * 16]
            assert r.n_in_win == seg.shape[0]
            assert r.rms == pytest.approx(float(np.sqrt(np.mean(seg * seg))), abs=1e-9)
            assert r.zcr == int(np.sum(seg[1:] * seg[:-1] < 0))


def test_audio_resample_operator_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = mm.audio_resample(mm.attach_audio_blob(docs), 6000).collect()
    for r in out:
        v = mm._audio_formula_samples(r.doc_id).astype(np.float64)[:, None]
        expect = np.floor(ac.resample_linear(v, 8000, 6000) + 0.5).astype(np.int64)
        assert r.src_rate == 8000 and r.dst_rate == 6000
        assert r.in_frames == v.shape[0]
        assert r.out_frames == expect.shape[0]
        dec = ac.decode_wav(bytes(r.blob))
        assert dec["sample_rate"] == 6000
        assert np.array_equal(dec["samples_native"], expect)


def test_audio_resample_passes_through_undecodable(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(3)
    out = mm.audio_resample(mm.attach_blob(docs), 6000).collect()
    assert all(r.src_rate is None and r.out_frames is None for r in out)
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for r in out:
        assert bytes(r.blob) == texts[r.doc_id].encode("utf-8")  # unchanged
