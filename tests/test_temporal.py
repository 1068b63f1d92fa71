"""Temporal operators: as-of join, sessionization, stateful streaming."""

from pyspark.sql import functions as F

from hindex_spark.operators.temporal import as_of_join, session_stats, sessionize


def test_as_of_join_basic(spark):
    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 20, "t2"), ("B", 15, "t3")],
        ["sym", "ts", "trade"],
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 15, 101.0), ("A", 20, 102.0), ("B", 99, 55.0)],
        ["sym", "qts", "px"],
    )
    out = as_of_join(trades, quotes, key="sym", left_ts="ts", right_ts="qts")
    got = {r["trade"]: r["px"] for r in out.collect()}
    assert got["t1"] == 100.0      # latest quote at ts<=10 is 5
    assert got["t2"] == 102.0      # equal-ts quote included
    assert got["t3"] is None       # no prior quote for B


def test_as_of_join_carries_multiple_columns(spark):
    left = spark.createDataFrame([("k", 10)], ["key", "ts"])
    right = spark.createDataFrame([("k", 8, 1.5, "x")], ["key", "rts", "v", "tag"])
    row = as_of_join(left, right, "key", "ts", "rts").collect()[0]
    assert row["v"] == 1.5 and row["tag"] == "x"


def test_sessionize_gap_semantics(spark):
    ev = spark.createDataFrame(
        [("u", 0), ("u", 10), ("u", 200), ("u", 205), ("v", 0)],
        ["user", "t"],
    )
    out = sessionize(ev, "user", "t", gap=50).collect()
    sess = {(r["user"], r["t"]): r["session_id"] for r in out}
    assert sess[("u", 0)] == 0 and sess[("u", 10)] == 0
    assert sess[("u", 200)] == 1 and sess[("u", 205)] == 1
    assert sess[("v", 0)] == 0
    stats = session_stats(ev, "user", "t", gap=50).collect()
    s_u1 = next(r for r in stats if r["user"] == "u" and r["session_id"] == 1)
    assert s_u1["n_events"] == 2 and s_u1["duration"] == 5


def test_stateful_running_totals_across_batches(spark, tmp_path):
    from hindex_spark.streaming.stateful import running_totals

    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double"
    ).write.parquet(src)

    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    out = running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["user_id"]: r for r in spark.sql("SELECT * FROM totals").collect()}
    assert rows[1]["total_events"] == 2 and rows[1]["total_value"] == 15.0
    assert rows[2]["total_events"] == 1


def test_ts_micros_magnitude_and_quoting(spark, sf_dir):
    from hindex_spark.timeutil import ts_micros, ts_timestamp

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi = (
        events.select(
            F.min(ts_micros(events)).alias("lo"), F.max(ts_micros(events)).alias("hi")
        ).first()
    )
    # Magnitude sanity for the epoch-NANOS-bigint assumption: converted
    # values must be plausible epoch-MICROS (years 2000..2100). A
    # testdata generation that stored plain INT64 micros would land 1000x
    # low (~1970) and fail here.
    assert 946_684_800_000_000 <= lo <= hi <= 4_102_444_800_000_000
    # identifiers needing backtick-quoting must still resolve
    odd = events.select(F.col("ts").alias("event ts.col"))
    vals = odd.select(ts_micros(odd, "event ts.col").alias("t")).limit(5).collect()
    assert all(r["t"] >= 946_684_800_000_000 for r in vals)
    # ts_timestamp round-trips through timestamp_micros
    t = events.select(ts_timestamp(events).alias("t")).limit(1).first()["t"]
    assert t.year >= 2000


def test_ts_micros_unsupported_type_fails_loud(spark):
    import pytest

    from hindex_spark.timeutil import ts_micros

    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unsupported timestamp"):
        ts_micros(df)
    with pytest.raises(KeyError):
        ts_micros(df, "nope")


def test_ts_micros_quoting_on_timestamp_branch(spark):
    from hindex_spark.timeutil import ts_micros

    df = spark.sql("SELECT TIMESTAMP '2020-01-02 03:04:05' AS `odd ts.name`")
    v = df.select(ts_micros(df, "odd ts.name").alias("t")).first()["t"]
    assert v == 1577934245000000
