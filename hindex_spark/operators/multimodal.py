"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched Pandas operators.

The Spark-side plumbing (schema, partition-sized batch iteration, UDF
signatures) is real and tested. Media decode goes through a runtime
seam (``_pil``): when Pillow is importable on the executors,
``extract_features`` decodes real pixels and ``resize_blobs(...,
target_size=(w, h))`` performs a real ``Image.resize`` + PNG re-encode;
when it is not (this container), the pure-Python codecs still REALLY
decode: PNG/BMP/JPEG/GIF pixels (operators/imagecodec.py, baseline and
progressive), WAV samples (operators/audiocodec.py — PCM/IEEE-float
with stats, windowed DSP, resampling), and AVI video frames
(operators/videocodec.py — uncompressed DIB and MJPEG). Only genuinely
undecodable payloads (compressed audio codecs, DV/h264-class video)
take a deterministic byte-stat fake with the SAME output schema, so
oracle results are identical either way.

Scale notes: blobs ride the normal columnar path (parquet binary
columns); mapInPandas streams Arrow batches so a 100 MB image batch
never materializes per-row Python objects. Keep blob columns OUT of
shuffle keys; repartition by the metadata key, never by payload.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),   # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

_PIL_UNSET = object()
_PIL = _PIL_UNSET


def _pil():
    """Runtime decode seam: the PIL ``Image`` module if importable, else
    ``None``. Resolved lazily ONCE per Python worker (mapInPandas runs
    this on executors, where the import set can differ from the driver).
    In this container PIL is absent, so every operator takes the
    deterministic stub path; installing Pillow activates real decode
    with no code change — the skip-marked tests in
    ``test_multimodal.py`` exercise that path when it exists."""
    global _PIL
    if _PIL is _PIL_UNSET:
        try:
            from PIL import Image  # noqa: PLC0415 - runtime capability probe

            _PIL = Image
        except ImportError:
            _PIL = None
    return _PIL


def attach_blob(df: DataFrame, text_col: str = "text", media_type: str = "image") -> DataFrame:
    """Synthesize a deterministic binary payload column (utf-8 bytes of
    the text) + typed metadata — the ingestion shape for media tables."""
    return df.withColumn("blob", F.encode(F.col(text_col), "utf-8")).withColumn(
        "blob_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def blob_stats(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Cheap JVM-side blob facts (no decode): byte length + md5."""
    return df.withColumn("blob_len", F.length(F.col(blob_col))).withColumn(
        "blob_md5", F.md5(F.col(blob_col))
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode: byte-level stats standing in for pixel
    decoding — the fallback when PIL is absent or the payload is not a
    decodable image."""
    n = len(payload)
    s = sum(payload) if n else 0
    return {
        "n_bytes": n,
        "mean_byte": (s / n) if n else 0.0,
        "max_byte": max(payload) if n else 0,
    }


def _pil_canonical(img):
    """Canonicalize a PIL image to the raster contract the pure codec
    emits, so the two decode paths see the SAME pixels whatever is
    installed: L/LA/RGB/RGBA pass through; a palette image expands
    (RGBA when it carries a transparency table, else RGB — matching
    imagecodec's PLTE expansion, where ``tobytes()`` on mode P would
    return palette INDICES); any other mode (CMYK, 1-bit, I;16...)
    becomes RGB."""
    if img.mode in ("L", "LA", "RGB", "RGBA"):
        return img
    if img.mode == "P":
        return img.convert(
            "RGBA" if "transparency" in img.info else "RGB"
        )
    return img.convert("RGB")


def _codec_canonical(payload: bytes, dec: tuple) -> tuple:
    """Canonicalize a pure-codec decode toward Pillow's: a 32-bit BMP
    whose 4th bytes are ALL zero is plain padding (BITMAPINFOHEADER
    'reserved'), which Pillow drops — strip it so byte stats and
    resizes agree across the two paths. A nonzero 4th channel is kept
    as real alpha."""
    w, h, ch, raster = dec
    if ch == 4 and payload[:2] == b"BM" and not any(raster[3::4]):
        raster = bytes(v for i, v in enumerate(raster) if i % 4 != 3)
        ch = 3
    return w, h, ch, raster


def _decode_auto(payload: bytes) -> dict:
    """Real decode when possible, stub otherwise, SAME output schema:
    a payload that parses as an image yields PIXEL-level stats
    (mean/max over the decoded raster). Pillow decodes when installed
    (C-speed, every format); without it the pure-Python codec
    (operators/imagecodec.py) REALLY decodes PNG, BMP, GIF, and JPEG
    (baseline AND progressive) — so the operator decodes actual
    pixels in this container too. Anything undecodable — video
    containers, exotic JPEG variants, and every synthetic utf-8 blob
    the oracle gates use (no image magic bytes) — falls through to
    the deterministic byte stub, so gate results are identical
    across all three paths."""
    img_mod = _pil()
    if img_mod is not None:
        import io  # noqa: PLC0415 - worker-side

        try:
            with img_mod.open(io.BytesIO(payload)) as img:
                raw = _pil_canonical(img).tobytes()
            n = len(raw)
            return {
                "n_bytes": len(payload),
                "mean_byte": (sum(raw) / n) if n else 0.0,
                "max_byte": max(raw) if n else 0,
            }
        except Exception:  # noqa: BLE001 - not an image → stub path
            pass
    else:
        from hindex_spark.operators import imagecodec  # noqa: PLC0415

        dec = imagecodec.decode_image(payload)
        if dec is not None:
            _, _, _, raster = _codec_canonical(payload, dec)
            n = len(raster)
            return {
                "n_bytes": len(payload),
                "mean_byte": (sum(raster) / n) if n else 0.0,
                "max_byte": max(raster) if n else 0,
            }
    return _decode_stub(payload)


FEATURE_SCHEMA = "doc_id long, n_bytes long, mean_byte double, max_byte int"


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    decode: str = "auto",
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches — the pattern
    for decode / resize / frame-sample operators.

    ``decode="auto"`` (default) uses real PIL pixel decoding per blob
    when Pillow is importable on the executors, falling back to the
    byte-stat stub per blob otherwise; ``decode="stub"`` forces the
    deterministic stub (what the DuckDB oracles model)."""
    fn = _decode_stub if decode == "stub" else _decode_auto

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[blob_col].map(lambda b: fn(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "mean_byte": feats.map(lambda d: d["mean_byte"]),
                    "max_byte": feats.map(lambda d: d["max_byte"]),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", every: int = 16) -> DataFrame:
    """Frame-sampling plumbing: explode each blob into every-Nth 'frame'
    (byte chunk stand-in). Pure JVM — ``sequence`` + ``explode`` +
    ``substring`` run inside whole-stage codegen, so blobs never cross an
    Arrow boundary (at video scale that is the difference between a JVM
    scan and serializing every payload into Python). A real video decoder
    slots in downstream as a mapInPandas over the emitted
    (doc_id, frame_no, frame) chunks; the chunker itself is arithmetic."""
    every = int(every)
    b = F.col(blob_col)
    last_frame = F.floor((F.length(b) - F.lit(1)) / F.lit(every)).cast("int")
    # explode(when(...)) drops empty blobs (null array), matching the old
    # behavior of emitting no rows for a zero-length payload
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        b.alias("__b"),
        F.explode(
            F.when(F.length(b) > 0, F.sequence(F.lit(0), last_frame))
        ).alias("frame_no"),
    ).select(
        "doc_id",
        "frame_no",
        F.expr(f"substring(__b, frame_no * {every} + 1, {every})").alias("frame"),
    )


def resize_blobs(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    target_bytes: int = 64,
    target_size: "tuple[int, int] | None" = None,
) -> DataFrame:
    """Image-resize plumbing: transform each blob to a fixed-size payload
    with updated metadata — the Arrow-batched shape of a real resize.
    The default stand-in picks ``target_bytes`` evenly-strided bytes
    (deterministic, oracle-checkable).

    Passing ``target_size=(w, h)`` opts into the REAL path: blobs that
    decode as images — via PIL when installed, else the pure-Python
    codec (PNG/BMP/JPEG/GIF) — are nearest-resampled to (w, h) and
    re-encoded as PNG; genuinely undecodable blobs keep the
    byte-sampler, so the output schema and the oracle gates are
    unchanged either way."""

    import numpy as np

    def _resize_one(payload: bytes) -> bytes:
        if target_size is not None:
            img_mod = _pil()
            if img_mod is not None:
                import io  # noqa: PLC0415 - worker-side

                try:
                    with img_mod.open(io.BytesIO(payload)) as img:
                        out = io.BytesIO()
                        # explicit NEAREST so the Pillow path and the
                        # pure-codec path below resample identically
                        # (Resampling namespace is Pillow>=9.1; older
                        # exposes the constants on the module); mode
                        # canonicalized FIRST so a palette image
                        # resamples expanded pixels, not indices
                        nearest = getattr(
                            img_mod, "Resampling", img_mod
                        ).NEAREST
                        _pil_canonical(img).resize(
                            target_size, nearest
                        ).save(out, format="PNG")
                        return out.getvalue()
                except Exception:  # noqa: BLE001 - not an image → stub path
                    pass
            else:
                from hindex_spark.operators import imagecodec  # noqa: PLC0415

                dec = imagecodec.decode_image(payload)
                if dec is not None:
                    w, h, ch, raster = _codec_canonical(payload, dec)
                    tw, th = target_size
                    return imagecodec.encode_png(
                        imagecodec.resize_nearest(raster, w, h, ch, tw, th),
                        tw, th, ch,
                    )
        n = len(payload)
        if n <= target_bytes:
            return payload
        arr = np.frombuffer(payload, dtype=np.uint8)
        # int(i * stride) truncation, matching the DuckDB oracle's FLOOR
        idx = (np.arange(target_bytes) * (n / target_bytes)).astype(np.int64)
        return arr[idx].tobytes()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col].map(bytes)
            resized = blobs.map(_resize_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "blob": resized,
                    "out_bytes": resized.map(len),
                    "in_bytes": blobs.map(len),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        op, schema="doc_id long, blob binary, out_bytes int, in_bytes int"
    )


# ---------------------------------------------------------------------------
# audio: real WAV decode (operators/audiocodec.py), mirroring the image
# operators above — mapInPandas Arrow batches, deterministic formula
# payloads for the oracle gates, stub fall-through for undecodable blobs
# ---------------------------------------------------------------------------

#: Deterministic PCM16 sample generator shared by attach_audio_blob and
#: the DuckDB audio oracles: doc `d` carries ``32 + d % 33`` mono frames
#: with sample ``i`` = ``((d*2654435761 + i*40503) % 65536) - 32768``
#: (Knuth multiplicative constant; exact in int64 for any realistic id).
AUDIO_BLOB_RATE = 8000


def _audio_formula_samples(doc_id: int):
    import numpy as np  # noqa: PLC0415 - worker-side

    n = 32 + doc_id % 33
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 2654435761 + i * 40503) % 65536) - 32768


def attach_audio_blob(
    df: DataFrame, id_col: str = "doc_id", sample_rate: int = AUDIO_BLOB_RATE
) -> DataFrame:
    """Synthesize a deterministic mono PCM16 WAV payload per row — the
    audio analog of ``attach_blob``. The sample values follow the
    module-level formula, so DuckDB oracles recompute every decoded
    stat from ``generate_series`` without being able to parse WAV: the
    gates then hash-check the REAL decode path end to end."""
    from hindex_spark.operators import audiocodec  # noqa: PLC0415

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "blob": [
                        audiocodec.encode_wav(
                            _audio_formula_samples(int(d)), sample_rate, bits=16
                        )
                        for d in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(op, schema="doc_id long, blob binary")


def attach_audio_blob_g711(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize deterministic G.711 telephony WAVs: doc ``d`` carries
    ``256 + 2*(d % 64)`` companded bytes ``(d*31 + i*7) % 256`` at
    8 kHz mono — mu-law (format 7) on even ids, A-law (format 6) on
    odd — so one gate drives BOTH expansion tables through the real
    container walk while the DuckDB oracle recomputes the G.711
    expansion formulas from ``generate_series``."""
    import numpy as np  # noqa: PLC0415 - worker-side

    from hindex_spark.operators import audiocodec  # noqa: PLC0415

    def _blob(d: int) -> bytes:
        n = 256 + 2 * (d % 64)
        b = ((d * 31 + np.arange(n, dtype=np.int64) * 7) % 256).astype(np.uint8)
        fmt = (audiocodec.WAVE_FORMAT_MULAW if d % 2 == 0
               else audiocodec.WAVE_FORMAT_ALAW)
        return audiocodec.encode_wav_raw(b.tobytes(), 8000, fmt)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "blob": [_blob(int(d)) for d in ids]}
            )

    return df.select(id_col).mapInPandas(op, schema="doc_id long, blob binary")


AUDIO_STATS_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate int, channels int, bits int, "
    "n_frames long, duration_ms long, rms double, peak double"
)


def audio_stats(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Per-blob audio facts through the REAL pure-Python WAV decoder:
    rate/channels/width/frames/duration plus RMS and absolute peak over
    the container's native sample values (all channels). Undecodable
    payloads (not RIFF, compressed codec) keep the row with byte count
    and NULL audio fields — same total-function contract as the image
    decode seam. RMS sums of squares stay below 2^53 for any bounded
    batch of PCM frames, so the float64 mean is order-independent and
    the DuckDB oracle reproduces it bit-exactly before the shared
    6-decimal round (applied by the gate, JVM-side)."""
    from hindex_spark.operators import audiocodec  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    def _one(doc_id, payload: bytes) -> dict:
        dec = audiocodec.decode_wav(payload)
        row = {"doc_id": doc_id, "n_bytes": len(payload)}
        if dec is None:
            row.update(
                sample_rate=None, channels=None, bits=None, n_frames=None,
                duration_ms=None, rms=None, peak=None,
            )
            return row
        native = dec["samples_native"].astype(np.float64)
        n = dec["n_frames"]
        row.update(
            sample_rate=dec["sample_rate"],
            channels=dec["channels"],
            bits=dec["bits"],
            n_frames=n,
            duration_ms=(n * 1000) // dec["sample_rate"],
            rms=float(np.sqrt(np.mean(native * native))) if n else 0.0,
            peak=float(np.max(np.abs(native))) if n else 0.0,
        )
        return row

    cols = ("doc_id", "n_bytes", "sample_rate", "channels", "bits",
            "n_frames", "duration_ms", "rms", "peak")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # dict-of-lists (audio_windows's shape) so an EMPTY Arrow
            # batch still carries every column — a zero-column frame
            # fails mapInPandas schema matching
            rows = [_one(int(d), bytes(b))
                    for d, b in zip(pdf[id_col], pdf[blob_col])]
            yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})

    return df.select(id_col, blob_col).mapInPandas(op, schema=AUDIO_STATS_SCHEMA)


AUDIO_WINDOWS_SCHEMA = (
    "doc_id long, win_no int, n_in_win long, rms double, zcr long"
)


def audio_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    window: int = 16,
) -> DataFrame:
    """Windowed DSP features over channel 0: each consecutive block of
    ``window`` frames becomes one row with its RMS and zero-crossing
    count (strict sign products ``v[i] * v[i-1] < 0`` WITHIN the
    window — boundary pairs belong to no window, zeros never cross).
    Real per-sample analysis through the real decoder; undecodable
    blobs emit no rows (they have no frames). The numpy loop touches
    each frame once per blob — O(frames), vectorized."""
    from hindex_spark.operators import audiocodec  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    window = int(window)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "win_no": [], "n_in_win": [], "rms": [], "zcr": []}
            for d, b in zip(pdf[id_col], pdf[blob_col]):
                dec = audiocodec.decode_wav(bytes(b))
                if dec is None or dec["n_frames"] == 0:
                    continue
                v = dec["samples_native"][:, 0].astype(np.float64)
                n = v.shape[0]
                for w in range((n + window - 1) // window):
                    seg = v[w * window : (w + 1) * window]
                    cross = int(np.sum(seg[1:] * seg[:-1] < 0))
                    out["doc_id"].append(int(d))
                    out["win_no"].append(w)
                    out["n_in_win"].append(seg.shape[0])
                    out["rms"].append(float(np.sqrt(np.mean(seg * seg))))
                    out["zcr"].append(cross)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(op, schema=AUDIO_WINDOWS_SCHEMA)


def audio_resample(
    df: DataFrame,
    dst_rate: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Blob -> blob linear resample: decode, interpolate to ``dst_rate``
    (audiocodec.resample_linear — output position ``j*src/dst``, float64),
    round half-up (``floor(y + 0.5)``, mirrored by the oracle's
    ``FLOOR(y + 0.5)`` — ties cannot hit an exact .5 only by accident,
    so BOTH engines use the same total convention instead of relying on
    that), re-encode mono-or-multi PCM16. 16-bit input interpolates
    native values directly (no scale round-trip); other widths go
    through the normalized [-1,1) domain scaled to 16-bit. Undecodable
    payloads pass through unchanged with NULL frame counts."""
    from hindex_spark.operators import audiocodec  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    dst_rate = int(dst_rate)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "blob": [], "src_rate": [],
                "dst_rate": [], "in_frames": [], "out_frames": [],
            }
            for d, b in zip(pdf[id_col], pdf[blob_col]):
                payload = bytes(b)
                dec = audiocodec.decode_wav(payload)
                rows["doc_id"].append(int(d))
                rows["dst_rate"].append(dst_rate)
                if dec is None:
                    rows["blob"].append(payload)
                    rows["src_rate"].append(None)
                    rows["in_frames"].append(None)
                    rows["out_frames"].append(None)
                    continue
                base = (
                    dec["samples_native"].astype(np.float64)
                    if dec["bits"] == 16 and dec["audio_format"] == 1
                    else dec["samples"] * 32768.0
                )
                y = audiocodec.resample_linear(
                    base, dec["sample_rate"], dst_rate
                )
                ints = np.clip(
                    np.floor(y + 0.5), -32768, 32767
                ).astype(np.int64)
                rows["blob"].append(
                    audiocodec.encode_wav(ints, dst_rate, bits=16)
                )
                rows["src_rate"].append(dec["sample_rate"])
                rows["in_frames"].append(dec["n_frames"])
                rows["out_frames"].append(ints.shape[0])
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(
        op,
        schema=(
            "doc_id long, blob binary, src_rate int, dst_rate int, "
            "in_frames long, out_frames long"
        ),
    )


# ---------------------------------------------------------------------------
# video: real AVI decode (operators/videocodec.py) — uncompressed DIB
# frames and MJPEG (via the pure-Python JPEG decoder); frame access is
# per-frame on demand, so sampling never decodes unsampled frames
# ---------------------------------------------------------------------------

#: Deterministic video generator shared with the DuckDB video oracles:
#: doc `d` carries ``4 + d % 5`` frames of 3x2 RGB with pixel byte
#: ``(d*7919 + f*991 + y*173 + x*31 + c*7) % 256`` — and the canonical
#: 24-bit DIB AVI container for that geometry is exactly
#: ``224 + 32 * n_frames`` bytes (asserted in tests), so the oracle
#: checks container size too.
VIDEO_W, VIDEO_H = 3, 2
VIDEO_FPS = 10


def _video_formula_frames(doc_id: int):
    import numpy as np  # noqa: PLC0415 - worker-side

    n = 4 + doc_id % 5
    f, y, x, c = np.meshgrid(
        np.arange(n, dtype=np.int64),
        np.arange(VIDEO_H, dtype=np.int64),
        np.arange(VIDEO_W, dtype=np.int64),
        np.arange(3, dtype=np.int64),
        indexing="ij",
    )
    px = (doc_id * 7919 + f * 991 + y * 173 + x * 31 + c * 7) % 256
    return [px[i].astype(np.uint8) for i in range(n)]


def attach_video_blob(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a deterministic uncompressed-DIB AVI per row — the
    video analog of ``attach_audio_blob``: closed-form pixels let the
    DuckDB oracles verify the REAL container+frame decode without ever
    parsing AVI bytes."""
    from hindex_spark.operators import videocodec  # noqa: PLC0415

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "blob": [
                        videocodec.encode_avi(
                            _video_formula_frames(int(d)),
                            fps_rate=VIDEO_FPS, fps_scale=1,
                        )
                        for d in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(op, schema="doc_id long, blob binary")


VIDEO_STATS_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, fps double, "
    "n_frames long, duration_ms long, mean_px double, max_px int"
)


def video_stats(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Per-blob video facts through the real container parsers — AVI
    and, since round 12, animated GIF (geometry from the logical
    screen, duration/fps from the graphic-control delays, pixel stats
    over the composited RGB canvases): geometry, frame rate, frame
    count, duration, plus mean/max over every decoded RGB raster byte.
    Undecodable payloads (unsupported codec, corrupt container) keep
    the row with NULL video fields — the codec-seam contract shared by
    the image and audio operators. Pixel sums stay integer-exact in
    float64 for any real corpus (8-bit values), so the DuckDB formula
    oracle matches before the gate's shared 6-decimal round."""
    from hindex_spark.operators import imagecodec, videocodec  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    def _one_gif(row: dict, payload: bytes) -> dict:
        try:
            info = imagecodec.gif_info(payload)
            pxsum = 0.0
            pxmax = 0
            count = 0
            for _fno, _w, _h, _ch, raster in imagecodec.gif_frames(payload):
                px = np.frombuffer(raster, dtype=np.uint8).reshape(-1, 4)[:, :3]
                pxsum += float(px.sum(dtype=np.int64))
                pxmax = max(pxmax, int(px.max()))
                count += px.size
            total_cs = sum(info["delays_cs"])
            row.update(
                width=info["width"], height=info["height"],
                fps=(100.0 * info["n_frames"] / total_cs)
                if total_cs > 0 else None,
                n_frames=info["n_frames"],
                duration_ms=total_cs * 10,
                mean_px=pxsum / count,
                max_px=pxmax,
            )
        except Exception:  # total-function seam: NULL fields, no crash
            row.update(width=None, height=None, fps=None, n_frames=None,
                       duration_ms=None, mean_px=None, max_px=None)
        return row

    def _one(doc_id, payload: bytes) -> dict:
        row = {"doc_id": doc_id, "n_bytes": len(payload)}
        if imagecodec.sniff(payload) == "gif":
            return _one_gif(row, payload)
        # total-function seam (decode_image's contract): a crafted or
        # corrupt container must yield NULL fields, never a crash
        rasters = []
        try:
            dec = videocodec.decode_avi(payload)
            if dec is not None:
                rasters = [
                    r for r in (
                        videocodec.frame_raster(dec, i)
                        for i in range(len(dec["frames"]))
                    ) if r is not None
                ]
        except Exception:
            dec = None
        if dec is None or not rasters or dec["rate"] <= 0:
            # rate <= 0 is a corrupt strh (fps/duration undefined):
            # total-function contract says NULL fields, never a crash
            row.update(width=None, height=None, fps=None, n_frames=None,
                       duration_ms=None, mean_px=None, max_px=None)
            return row
        allpx = np.concatenate(
            [np.frombuffer(r[3], dtype=np.uint8) for r in rasters]
        ).astype(np.float64)
        n = len(rasters)
        row.update(
            width=dec["width"], height=dec["height"],
            fps=dec["rate"] / dec["scale"],
            n_frames=n,
            duration_ms=(n * 1000 * dec["scale"]) // dec["rate"],
            mean_px=float(allpx.mean()),
            max_px=int(allpx.max()),
        )
        return row

    cols = ("doc_id", "n_bytes", "width", "height", "fps",
            "n_frames", "duration_ms", "mean_px", "max_px")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # dict-of-lists (audio_windows's shape) so an EMPTY Arrow
            # batch still carries every column — a zero-column frame
            # fails mapInPandas schema matching
            rows = [_one(int(d), bytes(b))
                    for d, b in zip(pdf[id_col], pdf[blob_col])]
            yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})

    return df.select(id_col, blob_col).mapInPandas(op, schema=VIDEO_STATS_SCHEMA)


VIDEO_FRAME_SCHEMA = "doc_id long, frame_no int, mean_px double, max_px int"


def video_frame_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    every: int = 2,
) -> DataFrame:
    """Sample every Nth frame — per-frame pixel stats rows over AVI
    *and animated GIF* blobs (dispatch by container magic). For AVI
    this is the 100 TB shape: frame decode cost scales with frames
    SAMPLED (the codec keeps frame chunks as raw bytes until
    ``frame_raster`` is called). GIF frames are inherently sequential
    (each canvas composites onto the last), so every frame is decoded
    and only every Nth EMITTED — the cheapest sampling the format
    allows; stats are over the composited RGB canvas (alpha excluded).
    Payloads never leave the Arrow batch; undecodable blobs emit no
    rows."""
    from hindex_spark.operators import imagecodec, videocodec  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    every = int(every)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "mean_px": [], "max_px": []}
            for d, b in zip(pdf[id_col], pdf[blob_col]):
                bb = bytes(b)
                if imagecodec.sniff(bb) == "gif":
                    try:  # total-function seam: corrupt blobs -> no rows
                        for fno, _w, _h, _ch, raster in imagecodec.gif_frames(bb):
                            if fno % every:
                                continue
                            px = (
                                np.frombuffer(raster, dtype=np.uint8)
                                .reshape(-1, 4)[:, :3]
                                .reshape(-1)
                                .astype(np.float64)
                            )
                            out["doc_id"].append(int(d))
                            out["frame_no"].append(fno)
                            out["mean_px"].append(float(px.mean()))
                            out["max_px"].append(int(px.max()))
                    except Exception:
                        pass
                    continue
                try:
                    dec = videocodec.decode_avi(bb)
                except Exception:
                    dec = None
                if dec is None:
                    continue
                for i in range(0, len(dec["frames"]), every):
                    try:
                        r = videocodec.frame_raster(dec, i)
                    except Exception:
                        r = None
                    if r is None:
                        continue
                    px = np.frombuffer(r[3], dtype=np.uint8).astype(np.float64)
                    out["doc_id"].append(int(d))
                    out["frame_no"].append(i)
                    out["mean_px"].append(float(px.mean()))
                    out["max_px"].append(int(px.max()))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(op, schema=VIDEO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# animated GIF: real multi-frame decode with disposal compositing
# (operators/imagecodec.py gif_frames) through the same frame-features
# seam as AVI — a crawl corpus's animations are GIFs, not AVIs
# ---------------------------------------------------------------------------

#: Deterministic animated-GIF generator shared with the DuckDB GIF
#: oracles: doc ``d`` carries ``3 + d % 4`` full-screen frames of
#: GIF_W x GIF_H with grayscale palette index (= pixel byte on every
#: RGB channel) ``(d*7919 + f*991 + y*173 + x*31) % 256``.
GIF_W, GIF_H = 4, 3

#: 256-entry grayscale palette: index i -> (i, i, i), so composited RGB
#: bytes ARE the formula values and the closed-form oracle needs no
#: palette arithmetic
_GIF_GRAY_PAL = [(i, i, i) for i in range(256)]


def _gif_formula_frames(doc_id: int):
    import numpy as np  # noqa: PLC0415 - worker-side

    n = 3 + doc_id % 4
    f, y, x = np.meshgrid(
        np.arange(n, dtype=np.int64),
        np.arange(GIF_H, dtype=np.int64),
        np.arange(GIF_W, dtype=np.int64),
        indexing="ij",
    )
    px = (doc_id * 7919 + f * 991 + y * 173 + x * 31) % 256
    return [px[i].astype(np.uint8) for i in range(n)]


def attach_gif_blob(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a deterministic ANIMATED GIF89a per row (real LZW,
    per-frame graphic-control blocks) — ``attach_video_blob``'s GIF
    analog: closed-form pixels let the DuckDB oracles verify the real
    multi-frame decode without parsing GIF bytes."""
    from hindex_spark.operators import imagecodec  # noqa: PLC0415

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "blob": [
                        imagecodec.encode_gif(
                            _gif_formula_frames(int(d)),
                            _GIF_GRAY_PAL, GIF_W, GIF_H,
                        )
                        for d in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(op, schema="doc_id long, blob binary")
