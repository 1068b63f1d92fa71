"""Temporal query surface: sessionization and as-of join over the
events stream table, oracle-checked (DuckDB windows / ASOF JOIN)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hindex_spark.operators.temporal import as_of_join, session_stats
from hindex_spark.queries import query
from hindex_spark.timeutil import ts_micros

GAP_US = 3_600_000_000  # 1 hour


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
