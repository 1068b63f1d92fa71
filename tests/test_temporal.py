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


# ---------------------------------------------------------------- range join

def _brute_range(points, intervals, key=None):
    """Reference: all (point, interval) pairs with start <= ts < end."""
    out = []
    for p in points:
        for iv in intervals:
            if key is not None and p[0] != iv[0]:
                continue
            ts = p[-1]
            s, e = iv[-2], iv[-1]
            if s <= ts < e:
                out.append((p, iv))
    return out


def test_range_join_keyed_matches_brute_force(spark):
    from hindex_spark.operators.temporal import range_join

    pts = [("a", 1, 5), ("a", 2, 17), ("a", 3, 30), ("b", 4, 5),
           ("a", 5, -13), ("b", 6, 0), ("a", 7, 10)]
    ivs = [("a", "w1", 0, 10), ("a", "w2", 10, 11), ("a", "w3", -20, -5),
           ("b", "w4", 5, 6), ("a", "w5", 17, 17),  # degenerate: empty
           ("b", "w6", -100, 100)]
    p = spark.createDataFrame(pts, ["k", "pid", "ts"])
    i = spark.createDataFrame(ivs, ["k", "wid", "s", "e"])
    # width deliberately NOT dividing the bounds evenly
    got = {(r["pid"], r["wid"])
           for r in range_join(p, i, "ts", "s", "e", key="k",
                               bucket_width=7).collect()}
    want = {(pp[1], ii[1]) for pp, ii in
            _brute_range([(x[0], x[1], x[2]) for x in pts],
                         [(x[0], x[1], x[2], x[3]) for x in ivs], key="k")}
    assert got == want and ("pid", "wid") != ()
    assert ("1", "w5") not in got  # degenerate interval matches nothing


def test_range_join_keyless_and_exactly_once(spark):
    from hindex_spark.operators.temporal import range_join

    # long interval spanning many buckets: each inside point appears ONCE
    p = spark.createDataFrame([(i, i * 3) for i in range(40)], ["pid", "ts"])
    i = spark.createDataFrame([("big", 5, 100), ("lo", -50, 2)],
                              ["wid", "s", "e"])
    rows = range_join(p, i, "ts", "s", "e", bucket_width=4).collect()
    from collections import Counter
    c = Counter((r["pid"], r["wid"]) for r in rows)
    assert max(c.values()) == 1
    assert sum(1 for (_, w) in c if w == "big") == len(
        [t for t in range(0, 120, 3) if 5 <= t < 100])
    assert {pid for (pid, w) in c if w == "lo"} == {0}  # ts=0 only


def test_range_join_rejects_collisions_and_bad_width(spark):
    import pytest
    from hindex_spark.operators.temporal import range_join

    p = spark.createDataFrame([(1, 2)], ["ts", "x"])
    i = spark.createDataFrame([(0, 5, 9)], ["s", "e", "x"])
    with pytest.raises(ValueError, match="collision"):
        range_join(p, i, "ts", "s", "e")
    i2 = spark.createDataFrame([(0, 5)], ["s", "e"])
    with pytest.raises(ValueError, match="positive"):
        range_join(p, i2, "ts", "s", "e", bucket_width=0)


def test_interval_overlap_join_matches_brute_force(spark):
    from hindex_spark.operators.temporal import interval_overlap_join

    A = [("k", "a1", 0, 10), ("k", "a2", 5, 50), ("k", "a3", -30, -10),
         ("j", "a4", 0, 100), ("k", "a5", 7, 7)]
    B = [("k", "b1", 9, 12), ("k", "b2", 49, 60), ("k", "b3", -11, 0),
         ("j", "b4", 99, 200), ("k", "b5", 1000, 2000)]
    a = spark.createDataFrame(A, ["k", "aid", "as_", "ae"])
    b = spark.createDataFrame(B, ["k", "bid", "bs", "be"])
    got = {(r["aid"], r["bid"])
           for r in interval_overlap_join(
               a, b, "as_", "ae", "bs", "be", key="k",
               bucket_width=7).collect()}
    want = set()
    for (ka, aid, s1, e1) in A:
        for (kb, bid, s2, e2) in B:
            if ka == kb and s1 < e2 and s2 < e1 and e1 > s1 and e2 > s2:
                want.add((aid, bid))
    assert got == want
    # a2 x b1 share multiple buckets -> must still appear exactly once
    assert ("a2", "b1") in got


def test_overlap_join_pair_exactly_once_across_many_buckets(spark):
    from collections import Counter

    from hindex_spark.operators.temporal import interval_overlap_join

    a = spark.createDataFrame([("x", 0, 1000)], ["aid", "as_", "ae"])
    b = spark.createDataFrame([("y", -500, 999)], ["bid", "bs", "be"])
    rows = interval_overlap_join(a, b, "as_", "ae", "bs", "be",
                                 bucket_width=10).collect()
    assert Counter((r["aid"], r["bid"]) for r in rows) == {("x", "y"): 1}


def test_range_join_plan_is_equi_join_not_bnl(spark):
    """The point of bucketization: the physical plan must be a real
    equi-join (SortMerge/ShuffledHash/BroadcastHash), never a
    BroadcastNestedLoop or Cartesian — that is the 100 TB property."""
    from hindex_spark.operators.temporal import (
        interval_overlap_join,
        range_join,
    )

    p = spark.range(100).select(F.col("id").alias("pid"),
                                (F.col("id") * 7).alias("ts"))
    i = spark.range(10).select(F.col("id").alias("wid"),
                               (F.col("id") * 50).alias("s"),
                               (F.col("id") * 50 + 80).alias("e"))
    plan = range_join(p, i, "ts", "s", "e",
                      bucket_width=64)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    a = i.select("wid", "s", "e")
    b = i.select(F.col("wid").alias("w2"), F.col("s").alias("s2"),
                 F.col("e").alias("e2"))
    plan2 = interval_overlap_join(
        a, b, "s", "e", "s2", "e2",
        bucket_width=64)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan2 and "Cartesian" not in plan2


def test_as_of_join_tolerance(spark):
    trades = spark.createDataFrame(
        [("A", 100, "t1"), ("A", 200, "t2"), ("B", 50, "t3")],
        ["sym", "ts", "trade"],
    )
    quotes = spark.createDataFrame(
        [("A", 95, 1.0), ("A", 120, 2.0), ("B", 10, 3.0)],
        ["sym", "qts", "px"],
    )
    # tolerance 30: t1 matches qts=95 (staleness 5); t2's latest quote
    # is qts=120 (staleness 80 > 30) -> NULL, NOT the older 95 either;
    # t3's quote is 40 stale -> NULL
    out = as_of_join(trades, quotes, "sym", "ts", "qts",
                     right_cols=["qts", "px"], tolerance=30)
    got = {r["trade"]: (r["qts"], r["px"]) for r in out.collect()}
    assert got["t1"] == (95, 1.0)
    assert got["t2"] == (None, None)
    assert got["t3"] == (None, None)
    # no tolerance: unchanged semantics
    base = as_of_join(trades, quotes, "sym", "ts", "qts",
                      right_cols=["qts", "px"])
    got0 = {r["trade"]: (r["qts"], r["px"]) for r in base.collect()}
    assert got0["t2"] == (120, 2.0) and got0["t3"] == (10, 3.0)
    # tolerance 0: only equal-timestamp matches survive
    eq = spark.createDataFrame([("A", 100, 9.9)], ["sym", "qts", "px"])
    out0 = as_of_join(trades, eq, "sym", "ts", "qts",
                      right_cols=["px"], tolerance=0)
    got_eq = {r["trade"]: r["px"] for r in out0.collect()}
    assert got_eq == {"t1": 9.9, "t2": None, "t3": None}


# ------------------------------------------------------------------- funnel

def test_funnel_earliest_completion_and_break(spark):
    from hindex_spark.operators.temporal import funnel

    ev = spark.createDataFrame(
        [("u", 10, "signup"), ("u", 5, "click"),   # click BEFORE signup: no
         ("u", 20, "click"), ("u", 30, "purchase"),
         ("v", 1, "signup"), ("v", 2, "purchase"),  # no click: chain breaks
         ("w", 7, "click")],                        # never signed up
        ["user", "t", "step"],
    )
    out = {r["user"]: (r["s1_ts"], r["s2_ts"], r["s3_ts"],
                       r["steps_completed"])
           for r in funnel(ev, "user", "t", "step",
                           ["signup", "click", "purchase"]).collect()}
    assert out["u"] == (10, 20, 30, 3)
    assert out["v"] == (1, None, None, 1)   # purchase w/o click doesn't count
    assert out["w"] == (None, None, None, 0)


def test_funnel_within_window(spark):
    from hindex_spark.operators.temporal import funnel

    ev = spark.createDataFrame(
        [("u", 0, "signup"), ("u", 5, "click"), ("u", 100, "purchase"),
         ("x", 0, "signup"), ("x", 99, "click"), ("x", 100, "purchase")],
        ["user", "t", "step"],
    )
    out = {r["user"]: (r["s3_ts"], r["steps_completed"])
           for r in funnel(ev, "user", "t", "step",
                           ["signup", "click", "purchase"],
                           within=50).collect()}
    assert out["u"] == (None, 2)   # purchase outside the 50-unit window
    assert out["x"] == (None, 1)   # click already outside it


def test_funnel_same_instant_and_strict(spark):
    from hindex_spark.operators.temporal import funnel

    ev = spark.createDataFrame(
        [("u", 10, "a"), ("u", 10, "b"),     # same-instant distinct steps
         ("r", 10, "a"), ("r", 20, "a")],    # repeated step
        ["user", "t", "step"],
    )
    lax = {r["user"]: (r["s1_ts"], r["s2_ts"])
           for r in funnel(ev, "user", "t", "step", ["a", "b"]).collect()}
    assert lax["u"] == (10, 10)  # at-or-after admits the same instant
    strict = {r["user"]: (r["s1_ts"], r["s2_ts"])
              for r in funnel(ev, "user", "t", "step", ["a", "b"],
                              strict=True).collect()}
    assert strict["u"] == (10, None)
    rep = {r["user"]: (r["s1_ts"], r["s2_ts"])
           for r in funnel(ev, "user", "t", "step", ["a", "a"],
                           strict=True).collect()}
    assert rep["r"] == (10, 20)  # strict: a second distinct event needed


def test_funnel_single_exchange_plan(spark):
    from hindex_spark.operators.temporal import funnel

    ev = spark.createDataFrame([("u", 1, "a")], ["user", "t", "step"])
    plan = funnel(ev, "user", "t", "step", ["a", "b", "c"]
                  )._jdf.queryExecution().executedPlan().toString()
    # one shuffle for the window partition; the final groupBy reuses it
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan


def test_funnel_report(spark):
    from hindex_spark.operators.temporal import funnel_report

    ev = spark.createDataFrame(
        [("u", 1, "a"), ("u", 2, "b"), ("u", 3, "c"),
         ("v", 1, "a"), ("v", 2, "b"),
         ("w", 1, "a"),
         ("x", 9, "b")],   # never did step a: counts nowhere
        ["user", "t", "step"],
    )
    out = {r["step"]: (r["step_name"], r["n_reached"], r["step_conversion"],
                       r["overall_conversion"])
           for r in funnel_report(ev, "user", "t", "step",
                                  ["a", "b", "c"]).collect()}
    assert out[1] == ("a", 3, None, "1.0000")
    assert out[2] == ("b", 2, "0.6667", "0.6667")
    assert out[3] == ("c", 1, "0.5000", "0.3333")
    # zero keys reach step 1: rates stay NULL instead of dividing by 0
    none = spark.createDataFrame([("u", 1, "zzz")], ["user", "t", "step"])
    rows = {r["step"]: (r["n_reached"], r["overall_conversion"])
            for r in funnel_report(none, "user", "t", "step",
                                   ["a", "b"]).collect()}
    assert rows[1] == (0, None) and rows[2] == (0, None)
