"""Streaming exact dedup: the same content arriving in later batches is
dropped via fingerprint state."""

import time

from pyspark.sql import functions as F

from hindex_spark.operators.text import fingerprint
from hindex_spark.streaming.stateful import streaming_exact_dedup


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs_stream")
    # batch 1: two distinct docs + an in-batch dup
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id long, text string",
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .withColumn("fingerprint", fingerprint(F.col("text")))
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()

    got = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert got == {1, 2}  # 3 is an in-batch dup of 1

    # batch 2: a re-sent dup of doc 1 + one genuinely new doc
    spark.createDataFrame(
        [(4, "alpha beta"), (5, "epsilon zeta")], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got2 = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert got2 == {1, 2, 5}  # 4 deduped against state from batch 1
