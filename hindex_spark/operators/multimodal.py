"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched Pandas operators.

The Spark-side plumbing (schema, partition-sized batch iteration, UDF
signatures) is real and tested; the actual media decode is stubbed
behind ``NotImplementedError`` (decode libs are not in this container)
with a deterministic fake used by tests — swap ``_decode_stub`` for a
PIL/ffmpeg call and nothing else changes.

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

REAL_DECODE = False  # flip when decode libs are available


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
    decoding. A real build replaces this body with PIL/ffmpeg."""
    if REAL_DECODE:
        raise NotImplementedError("media decode libs not present in this container")
    n = len(payload)
    s = sum(payload) if n else 0
    return {
        "n_bytes": n,
        "mean_byte": (s / n) if n else 0.0,
        "max_byte": max(payload) if n else 0,
    }


FEATURE_SCHEMA = "doc_id long, n_bytes long, mean_byte double, max_byte int"


def extract_features(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """mapInPandas feature extraction over Arrow batches — the pattern
    for decode / resize / frame-sample operators."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[blob_col].map(lambda b: _decode_stub(bytes(b)))
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
) -> DataFrame:
    """Image-resize plumbing: transform each blob to a fixed-size payload
    with updated metadata — the Arrow-batched shape of a real resize
    (PIL's ``Image.resize`` replaces the byte-sampler only). The stand-in
    picks ``target_bytes`` evenly-strided bytes (deterministic, oracle-
    checkable); width/height metadata update rides the same pass, so the
    downstream schema is exactly what a real decoder would produce."""

    import numpy as np

    def _resize_one(payload: bytes) -> bytes:
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
