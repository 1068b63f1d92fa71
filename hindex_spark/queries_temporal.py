"""Temporal query surface: sessionization, as-of join, and bucketized
range / interval-overlap joins over the events stream table,
oracle-checked (DuckDB windows / ASOF JOIN / plain non-equi joins).

The range-join gates pin the bucketization rewrite (equi-join on
time buckets + residual filter — `operators/temporal.py`) against
DuckDB's direct non-equi join: same rows, same values, while the Spark
plan stays a shuffle-hash/sort-merge join (never BroadcastNestedLoop —
asserted in test_temporal.py), which is the property that matters at
100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from hindex_spark.operators.temporal import (
    as_of_join,
    funnel,
    interval_overlap_join,
    range_join,
    session_stats,
    sessionize,
)
from hindex_spark.queries import query
from hindex_spark.timeutil import ts_micros

GAP_US = 3_600_000_000  # 1 hour
HOUR_US = 3_600_000_000


@query(
    "events_sessionize",
    f"""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        x AS (SELECT user_id, t,
                CASE WHEN lag(t) OVER w IS NULL
                       OR t - lag(t) OVER w > {GAP_US} THEN 1 ELSE 0 END AS nw
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        s AS (SELECT user_id, t,
                SUM(nw) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) - 1 AS session_id
              FROM x)
        SELECT user_id, session_id,
               MIN(t) AS session_start, MAX(t) AS session_end,
               MAX(t) - MIN(t) AS duration, COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_id""",
)
def q_sessionize(spark, sf_dir):
    ev0 = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev0.select("user_id", ts_micros(ev0).alias("t"))
    return session_stats(ev, "user_id", "t", GAP_US)


@query(
    "events_asof_join",
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
       err AS (SELECT user_id, epoch_us(ts) AS rt, printf('%.2f', value) AS err_value
               FROM events WHERE event_type = 'error')
       SELECT e.event_id, e.user_id, err.rt AS prior_err_ts, err.err_value
       FROM e ASOF LEFT JOIN err
         ON e.user_id = err.user_id AND e.t >= err.rt""",
)
def q_asof(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.select("event_id", "user_id", ts_micros(ev).alias("t"))
    right = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        ts_micros(ev).alias("rt"),
        F.format_string("%.2f", "value").alias("err_value"),
    )
    out = as_of_join(left, right, key="user_id", left_ts="t", right_ts="rt",
                     right_cols=["rt", "err_value"])
    return out.select(
        "event_id", "user_id", F.col("rt").alias("prior_err_ts"), "err_value"
    )


@query(
    "events_attribution_window",
    f"""WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pt
                   FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, epoch_us(ts) AS t,
                         CAST(CAST(ROUND(value, 6) AS DECIMAL(18,6)) * 1000000
                              AS BIGINT) AS v_micro
                  FROM events WHERE event_type = 'click')
        SELECT p.purchase_id,
               CAST(count(c.t) AS BIGINT) AS n_clicks,
               MAX(c.v_micro) AS max_click_micro
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.t >= p.pt - {HOUR_US} AND c.t < p.pt
        GROUP BY p.purchase_id""",
)
def q_attribution_window(spark, sf_dir):
    """Click-to-purchase attribution: for every purchase, the count and
    max value of the same user's clicks in the preceding hour — a
    point-in-interval join. The oracle runs DuckDB's direct non-equi
    join; the Spark side is the bucketized `range_join` (equi-join on
    (user_id, hour bucket) + residual — no nested-loop), then a
    left-complete aggregate so zero-click purchases keep n_clicks=0.
    Click values ride as exact BIGINT micro-units (the repo's integer
    hash-surface convention for DOUBLE aggregates)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        ts_micros(ev).alias("t"),
        (F.round(F.col("value"), 6).cast("decimal(18,6)") * 1000000)
        .cast("long").alias("v_micro"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (ts_micros(ev) - HOUR_US).alias("ws"),
        ts_micros(ev).alias("we"),
    )
    hits = range_join(
        clicks, purchases, point_ts="t", start_col="ws", end_col="we",
        key="user_id", bucket_width=HOUR_US,
    ).groupBy("purchase_id").agg(
        F.count("t").alias("n_clicks"),
        F.max("v_micro").alias("max_click_micro"),
    )
    return (
        purchases.select("purchase_id")
        .join(hits, on="purchase_id", how="left")
        .select(
            "purchase_id",
            F.coalesce(F.col("n_clicks"), F.lit(0)).cast("long")
            .alias("n_clicks"),
            F.col("max_click_micro").cast("long").alias("max_click_micro"),
        )
    )


@query(
    "events_range_join_global",
    """WITH w AS (SELECT event_type AS win_type,
                         min(epoch_us(ts)) AS ws,
                         min(epoch_us(ts)) + 129600000000 AS we
                  FROM events GROUP BY event_type),
            e AS (SELECT epoch_us(ts) AS t FROM events)
       SELECT w.win_type, w.ws AS win_start,
              CAST(count(*) AS BIGINT) AS n_events
       FROM w JOIN e ON e.t >= w.ws AND e.t < w.we
       GROUP BY w.win_type, w.ws""",
)
def q_range_join_global(spark, sf_dir):
    """KEYLESS range join: five 36-hour windows (each event type's
    first occurrence) against ALL events — no equi key at all, the case
    Spark would otherwise plan as BroadcastNestedLoopJoin. Bucketized
    on the hour, it is a plain equi-join on the bucket column."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(ts_micros(ev).alias("t"))
    wins = (
        ev.groupBy(F.col("event_type").alias("win_type"))
        .agg(F.min(ts_micros(ev)).alias("ws"))
        .withColumn("we", F.col("ws") + F.lit(36 * HOUR_US))
    )
    return (
        range_join(pts, wins, point_ts="t", start_col="ws", end_col="we",
                   key=None, bucket_width=HOUR_US)
        .groupBy("win_type", F.col("ws").alias("win_start"))
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "events_session_overlap",
    f"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
                   WHERE event_type IN ('click', 'error')),
        x AS (SELECT user_id, event_type, t,
                CASE WHEN lag(t) OVER w IS NULL
                       OR t - lag(t) OVER w > {GAP_US} THEN 1 ELSE 0 END AS nw
              FROM e WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t)),
        s AS (SELECT user_id, event_type, t,
                SUM(nw) OVER (PARTITION BY user_id, event_type ORDER BY t
                              ROWS UNBOUNDED PRECEDING) - 1 AS sid
              FROM x),
        g AS (SELECT user_id, event_type, sid,
                     MIN(t) AS ss, MAX(t) AS se
              FROM s GROUP BY user_id, event_type, sid),
        a AS (SELECT user_id, sid AS click_sid, ss AS cs, se AS ce FROM g
              WHERE event_type = 'click'),
        b AS (SELECT user_id, sid AS error_sid, ss AS es, se AS ee FROM g
              WHERE event_type = 'error')
        SELECT a.user_id, a.click_sid, b.error_sid,
               GREATEST(a.cs, b.es) AS overlap_start,
               LEAST(a.ce, b.ee) AS overlap_end
        FROM a JOIN b
          ON a.user_id = b.user_id AND a.cs <= b.ee AND b.es <= a.ce""",
)
def q_session_overlap(spark, sf_dir):
    """Interval-overlap join: each user's click sessions vs error
    sessions (1-hour gap sessionization on both sides), emitting every
    overlapping pair once with its overlap span. Sessions are CLOSED
    intervals [min_t, max_t]; the half-open overlap operator receives
    end+1 so single-event (zero-length) sessions still participate.
    Oracle sessionizes identically via DuckDB windows and joins on the
    direct inclusive-overlap predicate."""
    ev0 = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev0.filter(F.col("event_type").isin("click", "error")).select(
        "user_id", "event_type", ts_micros(ev0).alias("t")
    )

    def sessions(etype, sid_name, s_name, e_name):
        st = session_stats(
            ev.filter(F.col("event_type") == etype), "user_id", "t", GAP_US
        )
        return st.select(
            "user_id",
            F.col("session_id").alias(sid_name),
            F.col("session_start").alias(s_name),
            # half-open upper bound: closed max_t  ->  max_t + 1
            (F.col("session_end") + 1).alias(e_name),
        )

    a = sessions("click", "click_sid", "cs", "ce1")
    b = sessions("error", "error_sid", "es", "ee1")
    out = interval_overlap_join(
        a, b, "cs", "ce1", "es", "ee1", key="user_id",
        bucket_width=GAP_US,
    )
    return out.select(
        "user_id", "click_sid", "error_sid",
        F.greatest("cs", "es").alias("overlap_start"),
        (F.least(F.col("ce1"), F.col("ee1")) - 1).alias("overlap_end"),
    )


@query(
    "events_asof_tolerance",
    f"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
       err AS (SELECT user_id, epoch_us(ts) AS rt,
                      printf('%.2f', value) AS err_value
               FROM events WHERE event_type = 'error')
       SELECT e.event_id, e.user_id,
              CASE WHEN e.t - err.rt <= {GAP_US} THEN err.rt END
                AS prior_err_ts,
              CASE WHEN e.t - err.rt <= {GAP_US} THEN err.err_value END
                AS err_value
       FROM e ASOF LEFT JOIN err
         ON e.user_id = err.user_id AND e.t >= err.rt""",
)
def q_asof_tolerance(spark, sf_dir):
    """As-of join with a staleness bound (pandas merge_asof
    ``tolerance`` / kdb wj semantics): the latest prior error is
    surfaced only if it happened within the last hour — older matches
    are NULL, and the bound must not resurrect an even older row (the
    oracle applies the same CASE to DuckDB's ASOF match)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.select("event_id", "user_id", ts_micros(ev).alias("t"))
    right = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        ts_micros(ev).alias("rt"),
        F.format_string("%.2f", "value").alias("err_value"),
    )
    out = as_of_join(left, right, key="user_id", left_ts="t",
                     right_ts="rt", right_cols=["rt", "err_value"],
                     tolerance=GAP_US)
    return out.select(
        "event_id", "user_id", F.col("rt").alias("prior_err_ts"), "err_value"
    )


_FUNNEL_WITHIN = 48 * 3_600_000_000  # 48h conversion window


@query(
    "events_funnel",
    f"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
       w1 AS (SELECT user_id, event_type, t,
                min(CASE WHEN event_type = 'signup' THEN t END)
                  OVER (PARTITION BY user_id) AS s1_ts
              FROM e),
       w2 AS (SELECT *, min(CASE WHEN event_type = 'click'
                                  AND s1_ts IS NOT NULL AND t >= s1_ts
                                  AND t - s1_ts <= {_FUNNEL_WITHIN}
                                 THEN t END)
                  OVER (PARTITION BY user_id) AS s2_ts
              FROM w1),
       w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                                  AND s2_ts IS NOT NULL AND t >= s2_ts
                                  AND t - s1_ts <= {_FUNNEL_WITHIN}
                                 THEN t END)
                  OVER (PARTITION BY user_id) AS s3_ts
              FROM w2)
       SELECT user_id,
              MIN(s1_ts) AS s1_ts, MIN(s2_ts) AS s2_ts, MIN(s3_ts) AS s3_ts,
              CAST((CASE WHEN MIN(s1_ts) IS NOT NULL THEN 1 ELSE 0 END)
                 + (CASE WHEN MIN(s2_ts) IS NOT NULL THEN 1 ELSE 0 END)
                 + (CASE WHEN MIN(s3_ts) IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS steps_completed
       FROM w3 GROUP BY user_id""",
)
def q_funnel(spark, sf_dir):
    """Earliest-completion funnel (operators/temporal.py:funnel):
    signup -> click -> purchase per user inside a 48-hour conversion
    window — sequential event-pattern matching as chained conditional
    window-mins over ONE per-user partition (no self-joins, no per-key
    loop). The oracle runs the identical chain through DuckDB window
    functions."""
    ev0 = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev0.select("user_id", "event_type", ts_micros(ev0).alias("t"))
    return funnel(ev, "user_id", "t", "event_type",
                  ["signup", "click", "purchase"], within=_FUNNEL_WITHIN)


@query(
    "events_funnel_report",
    f"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
       w1 AS (SELECT user_id, event_type, t,
                min(CASE WHEN event_type = 'signup' THEN t END)
                  OVER (PARTITION BY user_id) AS s1_ts
              FROM e),
       w2 AS (SELECT *, min(CASE WHEN event_type = 'click'
                                  AND s1_ts IS NOT NULL AND t >= s1_ts
                                  AND t - s1_ts <= {_FUNNEL_WITHIN}
                                 THEN t END)
                  OVER (PARTITION BY user_id) AS s2_ts
              FROM w1),
       w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                                  AND s2_ts IS NOT NULL AND t >= s2_ts
                                  AND t - s1_ts <= {_FUNNEL_WITHIN}
                                 THEN t END)
                  OVER (PARTITION BY user_id) AS s3_ts
              FROM w2),
       f AS (SELECT user_id, MIN(s1_ts) AS s1, MIN(s2_ts) AS s2,
                    MIN(s3_ts) AS s3
             FROM w3 GROUP BY user_id),
       t AS (SELECT count(s1) AS n1, count(s2) AS n2, count(s3) AS n3
             FROM f)
       SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
              CAST(n1 AS BIGINT) AS n_reached FROM t
       UNION ALL
       SELECT 2, 'click', CAST(n2 AS BIGINT) FROM t
       UNION ALL
       SELECT 3, 'purchase', CAST(n3 AS BIGINT) FROM t""",
)
def q_funnel_report(spark, sf_dir):
    """Per-step funnel report (operators/temporal.py:funnel_report):
    keys reaching each step of signup -> click -> purchase inside the
    48h window. The gate hashes on the exact integer step counts; the
    formatted conversion-rate strings are pure functions of those
    counts (pinned in unit tests) and are excluded because a
    printf('%.4f') of an exact .00005 tie is the one place Java
    (HALF_UP) and C (half-even) double formatting can diverge."""
    from hindex_spark.operators.temporal import funnel_report

    ev0 = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev0.select("user_id", "event_type", ts_micros(ev0).alias("t"))
    return funnel_report(
        ev, "user_id", "t", "event_type",
        ["signup", "click", "purchase"], within=_FUNNEL_WITHIN,
    ).select("step", "step_name", "n_reached")
