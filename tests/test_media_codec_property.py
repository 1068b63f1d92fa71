"""Property-based invariants for the pure-Python media codecs.

No Spark — pure codec algebra, so the example budgets can be generous:

* WAV ROUNDTRIP: encode -> decode is the identity on native samples for
  every PCM width x channel count x frame count.
* WAV TOTALITY: decode_wav never raises on arbitrary bytes, nor on a
  valid container truncated at ANY byte offset (it returns None or a
  whole-frame prefix).
* RESAMPLE ALGEBRA: output length is floor((n-1)*dst/src)+1, identity
  at equal rates, bounded by the input envelope (linear interpolation
  never overshoots), and integer-ratio decimation picks exact samples.
* AVI ROUNDTRIP + TOTALITY: same contracts for the video container
  (frame rasters byte-exact; decode_avi total on mutations/truncation).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from hindex_spark.operators import audiocodec as ac
from hindex_spark.operators import videocodec as vc


@st.composite
def pcm_payload(draw):
    bits = draw(st.sampled_from([8, 16, 24, 32]))
    ch = draw(st.integers(min_value=1, max_value=4))
    n = draw(st.integers(min_value=0, max_value=200))
    scale = int(ac._PCM_SCALE[bits])
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    x = np.random.default_rng(seed).integers(
        -scale, scale - 1, size=(n, ch), dtype=np.int64
    )
    rate = draw(st.sampled_from([8000, 16000, 22050, 44100]))
    return x, rate, bits


@settings(max_examples=120, deadline=None)
@given(pcm_payload())
def test_wav_roundtrip_identity(payload):
    x, rate, bits = payload
    dec = ac.decode_wav(ac.encode_wav(x, rate, bits=bits))
    assert dec["sample_rate"] == rate and dec["bits"] == bits
    assert dec["n_frames"] == x.shape[0]
    assert np.array_equal(dec["samples_native"], x)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_wav_decode_total_on_garbage(data):
    ac.decode_wav(data)  # must not raise; None or a valid dict


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=127),
)
def test_wav_decode_total_on_truncation(seed, cut):
    x = np.random.default_rng(seed).integers(-32768, 32767, (12, 2), np.int64)
    full = ac.encode_wav(x, 8000, bits=16)
    dec = ac.decode_wav(full[: min(cut, len(full))])
    if dec is not None:  # whole-frame prefix, never misaligned data
        assert np.array_equal(dec["samples_native"], x[: dec["n_frames"]])


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=2, max_value=120),
    st.sampled_from([3000, 4000, 6000, 8000, 11025, 16000]),
    st.sampled_from([3000, 4000, 6000, 8000, 11025, 16000]),
)
def test_resample_algebra(seed, n, src, dst):
    x = np.random.default_rng(seed).uniform(-1000, 1000, size=(n, 1))
    y = ac.resample_linear(x, src, dst)
    if src == dst:
        assert np.array_equal(y, x)
        return
    assert y.shape[0] == (n - 1) * dst // src + 1
    assert y.min() >= x.min() - 1e-9 and y.max() <= x.max() + 1e-9
    if src % dst == 0:  # integer decimation: exact source samples
        assert np.array_equal(y[:, 0], x[:: src // dst, 0])


@st.composite
def rgb_video(draw):
    w = draw(st.integers(min_value=1, max_value=6))
    h = draw(st.integers(min_value=1, max_value=5))
    n = draw(st.integers(min_value=1, max_value=6))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(n)]


@settings(max_examples=80, deadline=None)
@given(rgb_video())
def test_avi_roundtrip_identity(frames):
    dec = vc.decode_avi(vc.encode_avi(frames, fps_rate=24, fps_scale=1))
    h, w, _ = frames[0].shape
    assert (dec["width"], dec["height"], dec["n_frames"]) == (w, h, len(frames))
    for i, f in enumerate(frames):
        fw, fh, ch, raster = vc.frame_raster(dec, i)
        assert np.array_equal(
            np.frombuffer(raster, dtype=np.uint8).reshape(fh, fw, 3), f
        )


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_avi_decode_total_on_garbage(data):
    vc.decode_avi(data)  # must not raise


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=400),
)
def test_avi_total_on_truncation_and_mutation(seed, pos):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (2, 3, 3), np.uint8) for _ in range(3)]
    full = bytearray(vc.encode_avi(frames))
    # truncate at pos
    dec = vc.decode_avi(bytes(full[: min(pos, len(full))]))
    if dec is not None:
        for i in range(len(dec["frames"])):
            vc.frame_raster(dec, i)  # total per frame too
    # flip one byte at pos (in-bounds) — decode must stay total
    if pos < len(full):
        full[pos] ^= 0xFF
        dec = vc.decode_avi(bytes(full))
        if dec is not None:
            for i in range(len(dec["frames"])):
                vc.frame_raster(dec, i)


@st.composite
def gif_image(draw):
    k = draw(st.sampled_from([4, 8, 64, 256]))
    w = draw(st.integers(min_value=1, max_value=40))
    h = draw(st.integers(min_value=1, max_value=30))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    inter = draw(st.booleans())
    idx = np.random.default_rng(seed).integers(0, k, (h, w), np.uint8)
    return idx, k, w, h, inter


@settings(max_examples=80, deadline=None)
@given(gif_image())
def test_gif_roundtrip_property(img):
    """Encoder (real LZW, tests/test_gifcodec.py) -> decoder is the
    identity on palette-expanded pixels for every geometry, palette
    size, and interlace flag."""
    from test_gifcodec import make_gif, _pal
    from hindex_spark.operators import imagecodec as ic

    idx, k, w, h, inter = img
    dec = ic.decode_image(make_gif(idx, _pal(k), w, h, interlaced=inter))
    assert dec is not None and dec[:3] == (w, h, 3)
    pal = np.array(_pal(k), dtype=np.uint8)
    assert np.array_equal(
        np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, 3), pal[idx]
    )


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_gif_decode_total_on_garbage(data):
    from hindex_spark.operators import imagecodec as ic

    ic.decode_image(b"GIF89a" + data)  # must not raise
