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


def exact_median_twophase(df: DataFrame, column: str) -> Any:
    c = F.col(column)
    # Phase 1: count + a sketch bracket around the median. accuracy=10000
    # bounds the sketch's rank error at ~1e-4 of n, so the 0.495-0.505
    # bracket (50x margin) always captures the true median neighbors
    # outside of pathological duplicate mass — which the guard below
    # catches and resolves with an exact fallback.
    row = df.agg(
        F.count(c).alias("n"),
        F.expr(f"approx_percentile({column}, array(0.495, 0.505), 10000)").alias("b"),
    ).collect()[0]
    n, bounds = row["n"], row["b"]
    if n == 0:
        return None
    if bounds is None or bounds[0] is None:
        return df.agg(F.expr(f"percentile({column}, 0.5)")).collect()[0][0]
    lo, hi = bounds[0], bounds[1]
    # Phase 2 (one job, fused): rank of the window start AND the sorted
    # window values — ~1% of rows around the median, single aggregate.
    stats = df.agg(
        F.sum((c < lo).cast("long")).alias("below"),
        F.sort_array(F.collect_list(F.when((c >= lo) & (c <= hi), c))).alias("win"),
    ).collect()[0]
    below, window = stats["below"] or 0, stats["win"]
    inside = len(window)
    rank = 0.5 * (n - 1)
    i0, i1 = int(rank), min(int(rank) + 1, n - 1)
    # both neighbors must be inside the sketch window, else fall back
    if not (below <= i0 and i1 < below + inside):
        return df.agg(F.expr(f"percentile({column}, 0.5)")).collect()[0][0]
    v0, v1 = window[i0 - below], window[i1 - below]
    frac = rank - i0
    return v0 + (v1 - v0) * frac


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
