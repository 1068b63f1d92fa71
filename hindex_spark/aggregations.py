"""AggregationClient analog — server-side partial + client final merge.

Reference: hbase-client/.../client/coprocessor/AggregationClient.java
(max:101 min:196 rowCount:276 sum:350 avg:525 std:640 median:728-760) and
the per-region endpoint AggregateImplementation.java (522 LoC). The
partial-per-region/final-merge dataflow is exactly Spark's partial+final
hash aggregate, so every verb is one ``agg`` call — Catalyst plans the
map-side combine automatically (verify: HashAggregate(partial) ->
Exchange -> HashAggregate(final) in .explain()).

``median`` is exact, matching the reference's two-phase exact median
(AggregateImplementation.getMedian:414): a sketch pass locates a narrow
value bracket, a second fused pass ranks it and collects only the
bracket — never the whole column.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scoped(table, column: str, scan=None) -> DataFrame:
    df = table.scan(scan) if scan is not None else table.df
    return df


def agg_max(table, column: str, scan=None) -> Any:
    return _scoped(table, column, scan).agg(F.max(column).alias("v")).collect()[0]["v"]


def agg_min(table, column: str, scan=None) -> Any:
    return _scoped(table, column, scan).agg(F.min(column).alias("v")).collect()[0]["v"]


def agg_sum(table, column: str, scan=None) -> Any:
    return _scoped(table, column, scan).agg(F.sum(column).alias("v")).collect()[0]["v"]


def row_count(table, scan=None) -> int:
    # FirstKeyOnlyFilter fast-count analog: count rowkeys only (column-
    # pruned scan reads a single column's pages).
    df = table.scan(scan) if scan is not None else table.df
    return df.select(table.rowkey_col).count()


def agg_avg(table, column: str, scan=None) -> float:
    return _scoped(table, column, scan).agg(F.avg(column).alias("v")).collect()[0]["v"]


def agg_std(table, column: str, scan=None) -> float:
    # Reference computes population std from (sum, sumsq, count) partials
    # (AggregationClient.java:640).
    return _scoped(table, column, scan).agg(F.stddev_pop(column).alias("v")).collect()[0]["v"]


def agg_median(table, column: str, scan=None) -> Any:
    """Exact median via the reference's two-phase shape
    (AggregationClient.java:728-760 / getMedian:414): phase 1 locates the
    median's neighborhood (here: approx_percentile sketch instead of
    per-region weight sums), phase 2 re-scans only that value window and
    finishes exactly. Avoids buffering every value in one object
    aggregate — each phase is a plain parallel scan."""
    return exact_median_twophase(_scoped(table, column, scan), column)


#: max values a single driver-side/aggregate buffer may hold — the bound
#: that makes the median safe at any n (65536 doubles = 512 KiB).
MEDIAN_ROW_BUDGET = 65536

_SKETCH_ACC = 10000  # approx_percentile accuracy -> rank error ~1e-4 * n


def exact_median_twophase(df: DataFrame, column: str, row_budget: int = MEDIAN_ROW_BUDGET) -> Any:
    """Exact median whose every aggregate buffer is bounded by
    ``row_budget``, independent of n.

    Shape mirrors the reference's two-phase median
    (AggregationClient.java:728-760): a locator pass finds the median's
    neighborhood, a second pass resolves exactly within it. Here the
    locator is an approx_percentile sketch (rank error ~1e-4*n at
    accuracy 10000), bracketed at 0.5 +/- 4e-4 (4x the error bound), and
    the bracket is ITERATED — narrowed by re-sketching inside it, or
    widened if a pathological sketch miss is detected — until it holds
    <= row_budget rows (sorted-collect finisher) or <= row_budget/2
    distinct values (per-value-count finisher, which is what resolves
    duplicate-heavy columns). There is no percentile(0.5) fallback: that
    buffers the entire column in one object aggregate, the exact shape
    that cannot survive 100 TB.
    """
    c = F.col(column)
    first = df.agg(
        F.count(c).alias("n"),
        F.expr(
            f"approx_percentile({column}, array(0.4996, 0.5004), {_SKETCH_ACC})"
        ).alias("b"),
    ).collect()[0]
    n = first["n"]
    if n == 0:
        return None
    rank = 0.5 * (n - 1)
    i0 = int(rank)
    i1 = min(i0 + 1, n - 1)
    frac = rank - i0
    lo, hi = first["b"][0], first["b"][1]
    lo_inc = hi_inc = True
    margin = 4e-4

    # Fast path (the common case): the OPEN interval (lo, hi) holds at
    # most ~(bracket width + 2*sketch error)*n rows — endpoint duplicate
    # mass is exactly what that bound excludes, and it is counted, not
    # collected. When the bound fits the budget, ONE fused job resolves
    # the median: same 2-job profile as a naive implementation, but with
    # a provably bounded aggregate buffer.
    if int(n * (2 * margin + 2.0 / _SKETCH_ACC)) + 2 <= row_budget:
        mid_w = (c > lo) & (c < hi)
        stats = df.agg(
            F.sum((c < lo).cast("long")).alias("below"),
            F.sum((c == lo).cast("long")).alias("at_lo"),
            F.sum(((c == hi) & F.lit(hi != lo)).cast("long")).alias("at_hi"),
            F.sort_array(F.collect_list(F.when(mid_w, c))).alias("mid"),
        ).collect()[0]
        below = stats["below"] or 0
        at_lo = stats["at_lo"] or 0
        at_hi = stats["at_hi"] or 0
        mid = stats["mid"] or []

        def _fast_val(t):
            if t < below:
                return None  # sketch exceeded its nominal error bound
            t -= below
            if t < at_lo:
                return lo
            t -= at_lo
            if t < len(mid):
                return mid[t]
            t -= len(mid)
            if t < at_hi:
                return hi
            return None

        v0, v1 = _fast_val(i0), _fast_val(i1)
        if v0 is not None and v1 is not None:
            return v0 + (v1 - v0) * frac
        # sketch miss: fall through to the self-correcting loop.

    def _win(lo, lo_inc, hi, hi_inc):
        return ((c >= lo) if lo_inc else (c > lo)) & ((c <= hi) if hi_inc else (c < hi))

    for _ in range(48):
        w = _win(lo, lo_inc, hi, hi_inc)
        below_c = (c < lo) if lo_inc else (c <= lo)
        stats = df.agg(
            F.sum(below_c.cast("long")).alias("below"),
            F.sum(w.cast("long")).alias("inside"),
            F.sum((w & (c == lo)).cast("long")).alias("at_lo"),
            F.sum((w & (c == hi)).cast("long")).alias("at_hi"),
            F.approx_count_distinct(F.when(w, c)).alias("adist"),
        ).collect()[0]
        below = stats["below"] or 0
        inside = stats["inside"] or 0
        if not (below <= i0 and i1 < below + inside):
            # the sketch bracket missed a target rank (possible only when
            # the sketch's error exceeded its nominal bound): widen
            # geometrically and re-locate. Terminates: margin reaches 0.5
            # and the bracket becomes the full value range.
            margin = min(0.5, margin * 8)
            b = df.agg(
                F.expr(
                    f"approx_percentile({column}, array("
                    f"{max(0.0, 0.5 - margin)}, {min(1.0, 0.5 + margin)}), {_SKETCH_ACC})"
                )
            ).collect()[0][0]
            lo, hi, lo_inc, hi_inc = b[0], b[1], True, True
            continue
        if inside <= row_budget:
            # finisher A: the window fits the budget — one bounded sorted
            # collect, index the target ranks directly.
            window = df.agg(
                F.sort_array(F.collect_list(F.when(w, c)))
            ).collect()[0][0]
            v0, v1 = window[i0 - below], window[i1 - below]
            return v0 + (v1 - v0) * frac
        if (stats["adist"] or 0) <= row_budget // 2:
            # finisher B: many rows but few distinct values (duplicate
            # mass) — exact per-value counts, bounded by the distinct
            # count, rank-walked on the driver.
            vals = sorted(
                df.filter(w).select(c.alias("v")).groupBy("v")
                .agg(F.count("*").alias("cnt")).collect(),
                key=lambda r: r["v"],
            )
            found = []
            for target in (i0, i1):
                r = below
                for rec in vals:
                    if target < r + rec["cnt"]:
                        found.append(rec["v"])
                        break
                    r += rec["cnt"]
            v0, v1 = found
            return v0 + (v1 - v0) * frac
        # window too big on both measures: re-sketch INSIDE it around the
        # median's relative rank — each round shrinks the window ~1000x
        # (2*4e-4 bracket + 2*1e-4 sketch error).
        q_mid = (i0 - below + 0.5) / inside
        m2 = max(4e-4, 8.0 / inside)
        b = (
            df.filter(w)
            .agg(
                F.expr(
                    f"approx_percentile({column}, array("
                    f"{max(0.0, q_mid - m2)}, {min(1.0, q_mid + m2)}), {_SKETCH_ACC})"
                )
            )
            .collect()[0][0]
        )
        nlo, nhi = b[0], b[1]
        if (nlo, nhi) != (lo, hi):
            lo, hi, lo_inc, hi_inc = nlo, nhi, True, True
            continue
        # no progress: the endpoint values own nearly all the window's
        # mass. Resolve each target against the exact endpoint counts;
        # anything left lives in the OPEN interval, which excludes that
        # dominating mass.
        at_lo = stats["at_lo"] or 0
        at_hi = stats["at_hi"] or 0
        lo_end = below + at_lo           # first rank after lo's mass
        hi_start = below + inside - at_hi  # first rank of hi's mass

        def _resolve(t):
            if t < lo_end:
                return lo
            if t >= hi_start:
                return hi
            return None

        r0, r1 = _resolve(i0), _resolve(i1)
        mid = _win(lo, False, hi, False)
        if r0 is not None and r1 is not None:
            return r0 + (r1 - r0) * frac
        if r0 is not None:  # i1 is the first element of the open middle
            v1 = df.filter(mid).agg(F.min(c)).collect()[0][0]
            return r0 + (v1 - r0) * frac
        if r1 is not None:  # i0 is the last element of the open middle
            v0 = df.filter(mid).agg(F.max(c)).collect()[0][0]
            return v0 + (r1 - v0) * frac
        lo_inc = hi_inc = False  # both targets in the open middle: recurse
    raise RuntimeError(
        f"exact_median_twophase failed to converge on column {column!r}"
    )


def summary(table, column: str, scan=None) -> DataFrame:
    """All streaming aggregates in one partial+final pass; the median is
    attached from the two-phase exact job rather than percentile(0.5),
    which buffers every value of the group in a single object aggregate
    — the one shape that cannot survive 100 TB."""
    df = _scoped(table, column, scan)
    med = exact_median_twophase(df, column)
    return df.agg(
        F.min(column).alias("min_v"),
        F.max(column).alias("max_v"),
        F.sum(column).alias("sum_v"),
        F.count(column).alias("count_v"),
        F.avg(column).alias("avg_v"),
        F.stddev_pop(column).alias("std_v"),
    ).withColumn("median_v", F.lit(med).cast("double"))
