"""Temporal operators Spark lacks natively: as-of join, bucketized
range/interval joins, and sessionization — standard time-series and
pipeline patterns, built from shuffle-friendly primitives (no Python in
the hot path).

As-of join: for each left row, the most recent right row at or before
its timestamp (per key). Implemented with the union+window technique:
tag both sides, union, per-key window ordered by (ts, side-tag), carry
the last right value forward — ONE shuffle on (key), no range
explosion, no merge_asof Python loop. This is the scalable plan: cost
is a single sort-within-key regardless of time-range density.

Range join (point-in-interval) and interval-overlap join: Spark plans a
bare non-equi condition as BroadcastNestedLoopJoin (or worse, a
cartesian) — quadratic and undistributable at 100 TB. The scalable
rewrite is BUCKETIZATION (the same idea behind Databricks' range-join
optimization and interval trees flattened to a grid): chunk time into
fixed-width buckets, explode each interval over the buckets it covers,
tag each point with its single bucket, EQUI-join on (key, bucket), then
apply the exact predicate as a residual filter. Cost is a plain
shuffle-hash join whose size is |points| + |intervals| x (avg interval
length / bucket width): pick ``bucket_width`` near the typical interval
length and the blow-up is ~2x. The overlap join dedupes pairs that
share several buckets with the standard first-overlap-bucket trick (a
pure filter — no distinct, no extra shuffle).

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
    tolerance: Optional[int] = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right_ts <= left_ts (per key). Right columns are NULL when no prior
    right row exists. Output: all left columns + requested right cols.

    ``tolerance`` (same units as the timestamps) bounds the match's
    staleness — pandas merge_asof / kdb wj semantics: a prior right row
    older than ``left_ts - tolerance`` yields NULLs, same as no match.
    Applied as a post-carry filter on the matched row's OWN timestamp
    (carried inside the struct), so it stays one shuffle and cannot
    resurrect an older row.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    carry = list(right_cols)
    if tolerance is not None and "__rts" not in carry:
        carry.append("__rts")  # the matched row's own ts, for staleness
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
        F.struct(*[
            (F.col(right_ts) if c == "__rts" else F.col(c)).alias(c)
            for c in carry
        ]).alias("__r"),
    )
    for c in left.columns:
        rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rtypes = dict(right.dtypes)
    struct_type = ", ".join(
        f"`{c}`: {rtypes[right_ts] if c == '__rts' else rtypes[c]}"
        for c in carry
    )
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
        F.col("__ts").alias("__lts"),
        F.last("__r", ignorenulls=True).over(w).alias("__rv"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        fresh = (
            F.col("__lts") - F.col("__rv").getField("__rts")
        ) <= F.lit(int(tolerance))
        out = out.withColumn(
            "__rv", F.when(fresh, F.col("__rv"))  # stale -> all-NULL
        )
    for c in right_cols:
        out = out.withColumn(c, F.col("__rv").getField(c))
    return out.drop("__side", "__rv", "__lts")


def _floor_div(col: Column, width: int) -> Column:
    """Floor division of a LONG column by a positive int, correct for
    negatives (plain ``div`` truncates toward zero; floor must round
    toward -inf). The numerator is made exactly divisible via pmod, so
    the one double division is exact while |value| < 2**53 — epoch
    micros through year ~2255; far beyond any event data."""
    q = col.cast("long")
    d = F.lit(int(width)).cast("long")
    return ((q - F.pmod(q, d)) / d).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    key: Optional[str] = None,
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """Inner join of points to the half-open intervals containing them:
    ``start <= ts < end`` (and ``points.key == intervals.key`` when a
    key is given). Timestamps/bounds are int64 (epoch micros by
    convention — adapt with :func:`hindex_spark.timeutil.ts_micros`).

    Output: all point columns + all interval columns (names must not
    collide). Each matching (point, interval) pair appears EXACTLY once:
    a point has one bucket, and an exploded interval covers that bucket
    at most once — no dedup pass needed.

    ``bucket_width`` (same units as the timestamps) trades explosion
    factor against join selectivity; choose it near the typical interval
    length. Degenerate intervals (``end <= start``) match nothing and
    are dropped before the explode (a reversed ``sequence`` would
    descend, not return empty).
    """
    dup = set(points.columns) & set(intervals.columns) - ({key} if key else set())
    if dup:
        raise ValueError(f"column name collision between sides: {sorted(dup)}")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                _floor_div(F.col(start_col), w),
                _floor_div(F.col(end_col) - F.lit(1), w),
            )
        ),
    )
    pt = points.withColumn("__bkt", _floor_div(F.col(point_ts), w))
    on = ["__bkt"] + ([key] if key else [])
    return (
        pt.join(iv, on=on, how="inner")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__bkt")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    key: Optional[str] = None,
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """Inner join of two half-open interval sets on overlap:
    ``l.start < r.end AND r.start < l.end`` (plus the equi key when
    given). Bounds are int64. Output: all left + all right columns.

    Both sides explode over the buckets they cover and equi-join on
    (key, bucket); a pair sharing several buckets would then appear
    several times, so the residual keeps only the FIRST bucket of the
    overlap region — ``bucket == floor(max(l.start, r.start) / width)``
    — which every overlapping pair has exactly once. Dedup is therefore
    a filter, not a distinct: no extra shuffle.
    """
    dup = set(left.columns) & set(right.columns) - ({key} if key else set())
    if dup:
        raise ValueError(f"column name collision between sides: {sorted(dup)}")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.filter(F.col(e) > F.col(s)).withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    _floor_div(F.col(s), w),
                    _floor_div(F.col(e) - F.lit(1), w),
                )
            ),
        )

    on = ["__bkt"] + ([key] if key else [])
    first_overlap_bkt = _floor_div(
        F.greatest(F.col(left_start), F.col(right_start)), w
    )
    return (
        bucketed(left, left_start, left_end)
        .join(bucketed(right, right_start, right_end), on=on, how="inner")
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (F.col("__bkt") == first_overlap_bkt)
        )
        .drop("__bkt")
    )


def funnel(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_col: str,
    steps: List[str],
    within: Optional[int] = None,
    strict: bool = False,
) -> DataFrame:
    """Earliest-completion funnel per key — the sequential
    event-pattern query (signup -> click -> purchase): step i's
    timestamp is the MINIMUM ``ts`` of a ``steps[i]`` event at or after
    step i-1's timestamp (NULL once the chain breaks); ``within``
    additionally requires every step to land within that many time
    units of step 1 (the conversion-window form). Output: one row per
    key with ``s1_ts..sN_ts`` and ``steps_completed``.

    Plan shape: ONE shuffle (the per-key partition); each step is a
    conditional window-min over the same partitioning, so Catalyst
    chains N Window stages without further exchanges — no self-joins,
    no per-key loop, no UDF. Earliest-completion (greedy minimum) is
    the standard funnel semantics: taking the earliest valid event for
    each step never prevents a later step that some other choice would
    have allowed.

    ``strict=True`` requires each step STRICTLY after its predecessor —
    the right setting when a step repeats (with the default at-or-after
    semantics, [click, click] would complete on a single event at one
    instant)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(key)
    out = df.select(key, F.col(ts_col).alias("__ts"),
                    F.col(step_col).alias("__step"))
    prev = None
    names = []
    for i, s in enumerate(steps):
        name = f"s{i + 1}_ts"
        cond = F.col("__step") == s
        if prev is not None:
            after = (F.col("__ts") > F.col(prev)) if strict \
                else (F.col("__ts") >= F.col(prev))
            cond = cond & F.col(prev).isNotNull() & after
            if within is not None:
                cond = cond & (F.col("__ts") - F.col("s1_ts") <= int(within))
        out = out.withColumn(
            name, F.min(F.when(cond, F.col("__ts"))).over(w))
        prev = name
        names.append(name)
    agg = out.groupBy(key).agg(
        *[F.min(n).alias(n) for n in names])
    done = sum(F.when(F.col(n).isNotNull(), 1).otherwise(0) for n in names)
    return agg.withColumn("steps_completed", done.cast("long"))


def funnel_report(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_col: str,
    steps: List[str],
    within: Optional[int] = None,
    strict: bool = False,
) -> DataFrame:
    """The funnel as a report: one row per step with the number of keys
    reaching it, conversion from the previous step, and conversion from
    step 1 — the shape an analytics user actually reads. Rates are
    fixed 4dp strings (deterministic across engines; NULL for step 1's
    step_conversion). Built on :func:`funnel`, so it inherits the
    one-shuffle chained-window plan plus one tiny aggregate."""
    f = funnel(df, key, ts_col, step_col, steps, within, strict)
    aggs = [
        F.count(F.when(F.col(f"s{i + 1}_ts").isNotNull(), 1))
        .alias(f"__n{i + 1}")
        for i in range(len(steps))
    ]
    totals = f.agg(*aggs)
    rows = []
    for i, s in enumerate(steps):
        n = F.col(f"__n{i + 1}")
        prev = F.col(f"__n{i}") if i > 0 else None
        step_conv = (
            F.when(prev > 0, F.format_string("%.4f", n / prev))
            if i > 0 else F.lit(None).cast("string")
        )
        rows.append(F.struct(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(s).alias("step_name"),
            n.cast("long").alias("n_reached"),
            step_conv.alias("step_conversion"),
            F.when(F.col("__n1") > 0,
                   F.format_string("%.4f", n / F.col("__n1")))
            .alias("overall_conversion"),
        ))
    return totals.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.step", "r.step_name", "r.n_reached",
             "r.step_conversion", "r.overall_conversion")


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
