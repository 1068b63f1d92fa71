"""Property-based bucketized range-join invariants vs brute force:

* range_join == the direct O(n*m) predicate scan, for ANY points /
  intervals / bucket width (including widths far from the interval
  scale, negative timestamps, degenerate and single-point intervals).
* interval_overlap_join == the direct overlap scan, each pair EXACTLY
  once (the first-overlap-bucket dedup must neither drop nor repeat).

One Spark round-trip per example; HX_PROP_EXAMPLES deepens the run.
"""

import os
from collections import Counter

from hypothesis import HealthCheck, example, given, settings, strategies as st

from hindex_spark.operators.temporal import interval_overlap_join, range_join

ts_st = st.integers(min_value=-50, max_value=50)
points_st = st.lists(ts_st, min_size=0, max_size=12)
iv_st = st.lists(st.tuples(ts_st, ts_st), min_size=0, max_size=8)
width_st = st.integers(min_value=1, max_value=40)

_SETTINGS = dict(
    max_examples=int(os.environ.get("HX_PROP_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(points_st, iv_st, width_st)
def test_range_join_matches_brute_force(spark, pts, ivs, width):
    p = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pts)], "pid int, ts long")
    i = spark.createDataFrame(
        [(j, min(a, b), max(a, b)) for j, (a, b) in enumerate(ivs)],
        "wid int, s long, e long")
    got = Counter(
        (r["pid"], r["wid"])
        for r in range_join(p, i, "ts", "s", "e",
                            bucket_width=width).collect())
    want = Counter(
        (pi, j)
        for pi, t in enumerate(pts)
        for j, (a, b) in enumerate(ivs)
        if min(a, b) <= t < max(a, b))
    assert got == want


@settings(**_SETTINGS)
@given(iv_st, iv_st, width_st)
# the round-10 falsifying example: a zero-length interval satisfies the
# bare s1<e2 AND s2<e1 predicate against a neighbor but overlaps
# nothing — the MODEL needed the per-side non-emptiness the operator
# already enforces
@example(A=[(0, -2)], B=[(-1, -1)], width=1)
def test_overlap_join_matches_brute_force(spark, A, B, width):
    a = spark.createDataFrame(
        [(j, min(x, y), max(x, y)) for j, (x, y) in enumerate(A)],
        "aid int, as_ long, ae long")
    b = spark.createDataFrame(
        [(j, min(x, y), max(x, y)) for j, (x, y) in enumerate(B)],
        "bid int, bs long, be long")
    got = Counter(
        (r["aid"], r["bid"])
        for r in interval_overlap_join(
            a, b, "as_", "ae", "bs", "be", bucket_width=width).collect())
    # an EMPTY interval (s == e) overlaps nothing: the bare
    # s1 < e2 AND s2 < e1 predicate is only equivalent to
    # max(starts) < min(ends) when both sides are non-empty
    want = Counter(
        (i, j)
        for i, (x1, y1) in enumerate(A)
        for j, (x2, y2) in enumerate(B)
        if (lambda s1, e1, s2, e2:
            s1 < e1 and s2 < e2 and s1 < e2 and s2 < e1)(
            min(x1, y1), max(x1, y1), min(x2, y2), max(x2, y2)))
    assert got == want
    assert all(v == 1 for v in got.values())  # exactly-once, never dup
