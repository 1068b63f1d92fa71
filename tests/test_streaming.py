"""Structured Streaming ingest tests (foreachBatch mutation fold with
same-batch index maintenance, WALPlayer replay, windowed aggregation)."""

from pyspark.sql import functions as F

from hindex_spark.index.spec import IndexSpecification
from hindex_spark.streaming.ingest import StreamingIngest, windowed_event_counts
from hindex_spark.table import Table


def test_stream_ingest_put_delete_with_index(spark, tmp_path):
    base = spark.createDataFrame(
        [("r1", 10), ("r2", 20), ("r3", 30)], ["rowkey", "v"]
    )
    t = Table(base, "rowkey", "t")
    t.create_index(IndexSpecification("idx_v").add_column("v", "Int"))

    changelog = str(tmp_path / "changelog")
    spark.createDataFrame(
        [("put", "r1", 11), ("put", "r9", 99), ("delete", "r2", None)],
        "op string, rowkey string, v int",
    ).write.parquet(changelog)

    ingest = StreamingIngest(t)
    stream = spark.readStream.schema("op string, rowkey string, v int").parquet(changelog)
    q = ingest.start(stream)
    q.awaitTermination()

    got = {r["rowkey"]: r["v"] for r in ingest.table.df.collect()}
    assert got == {"r1": 11, "r3": 30, "r9": 99}
    # index updated in the same batch
    idx = ingest.table.index_tables["idx_v"]
    assert {(r["v"], r["rowkey"]) for r in idx.collect()} == {(11, "r1"), (30, "r3"), (99, "r9")}
    assert ingest.batches_applied == 1


def test_windowed_event_counts_streaming(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_dir")  # file stream source needs a dir
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    # events.ts is epoch-nanos long (nanosAsLong); convert to timestamp
    stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM win_out")
    # batch equivalent for cross-check
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
    batch = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .count()
    )
    # append mode emits only windows below the watermark; at least most
    # windows must have been finalized
    assert out.count() > 0
    assert out.count() <= batch
