"""Temporal operators Spark lacks natively: as-of join and
sessionization — standard time-series/pipeline patterns, built from
shuffle-friendly primitives (no Python in the hot path).

As-of join: for each left row, the most recent right row at or before
its timestamp (per key). Implemented with the union+window technique:
tag both sides, union, per-key window ordered by (ts, side-tag), carry
the last right value forward — ONE shuffle on (key), no range
explosion, no merge_asof Python loop. This is the scalable plan: cost
is a single sort-within-key regardless of time-range density.

Sessionization: gap-based session ids per key via lag + cumulative sum
— two window passes over the same (key, ts) sort, one shuffle.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Optional[List[str]] = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right_ts <= left_ts (per key). Right columns are NULL when no prior
    right row exists. Output: all left columns + requested right cols.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    lhs = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        "*",
    )
    # carry the right row as ONE struct so a NULL field in the matched
    # row is not back-filled from an older row (per-column last() would
    # stitch together columns from different right rows)
    rhs = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__r"),
    )
    for c in left.columns:
        rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rtypes = dict(right.dtypes)
    struct_type = ", ".join(f"`{c}`: {rtypes[c]}" for c in right_cols)
    lhs = lhs.withColumn("__r", F.lit(None).cast(f"struct<{struct_type}>"))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *left.columns,
        F.col("__side"),
        F.last("__r", ignorenulls=True).over(w).alias("__rv"),
    )
    out = carried.filter(F.col("__side") == 1)
    for c in right_cols:
        out = out.withColumn(c, F.col("__rv").getField(c))
    return out.drop("__side", "__rv")


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the key's previous event exceeds ``gap`` (same units as
    ts_col). Adds ``session_id`` (0-based per key, by time order)."""
    w = Window.partitionBy(key).orderBy(ts_col)
    return (
        df.withColumn("__prev", F.lag(ts_col).over(w))
        .withColumn(
            "__new",
            (F.col("__prev").isNull() | ((F.col(ts_col) - F.col("__prev")) > gap)).cast("long"),
        )
        .withColumn(
            "session_id",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
        )
        .drop("__prev", "__new")
    )


def session_stats(
    df: DataFrame, key: str, ts_col: str, gap: int
) -> DataFrame:
    """Sessions with start/end/duration/event count per (key, session)."""
    s = sessionize(df, key, ts_col, gap)
    return s.groupBy(key, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
        F.count("*").alias("n_events"),
    )
