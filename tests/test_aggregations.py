"""Aggregation verbs incl. the two-phase exact median vs percentile()."""

import pytest
from pyspark.sql import functions as F

from hindex_spark import aggregations as agg
from hindex_spark.table import Scan, Table


def test_verbs_match_sql(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/lineitem.parquet", "l_orderkey", "li")
    ref = t.df.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"), F.sum("l_extendedprice"),
        F.avg("l_extendedprice"), F.stddev_pop("l_extendedprice"),
    ).collect()[0]
    assert agg.agg_min(t, "l_extendedprice") == ref[0]
    assert agg.agg_max(t, "l_extendedprice") == ref[1]
    assert agg.agg_sum(t, "l_extendedprice") == ref[2]
    assert agg.agg_avg(t, "l_extendedprice") == ref[3]
    assert abs(agg.agg_std(t, "l_extendedprice") - ref[4]) < 1e-9
    assert agg.row_count(t) == t.df.count()


@pytest.mark.parametrize("col", ["l_extendedprice", "l_quantity", "l_discount"])
def test_two_phase_median_exact(spark, sf_dir, col):
    t = Table.from_parquet(spark, f"{sf_dir}/lineitem.parquet", "l_orderkey", "li")
    exact = t.df.agg(F.expr(f"percentile({col}, 0.5)")).collect()[0][0]
    assert agg.agg_median(t, col) == pytest.approx(exact, abs=1e-12)


def test_two_phase_median_tiny_and_empty(spark):
    t = Table(spark.createDataFrame([(1, 5.0)], ["rowkey", "v"]), "rowkey")
    assert agg.agg_median(t, "v") == 5.0
    t2 = Table(spark.createDataFrame([(1, 1.0), (2, 2.0)], ["rowkey", "v"]), "rowkey")
    assert agg.agg_median(t2, "v") == 1.5
    t0 = Table(spark.createDataFrame([], "rowkey long, v double"), "rowkey")
    assert agg.agg_median(t0, "v") is None


def test_median_scoped_by_scan(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    scan = Scan(start_row=0, stop_row=500)
    exact = (
        t.df.filter((F.col("o_orderkey") >= 0) & (F.col("o_orderkey") < 500))
        .agg(F.expr("percentile(o_totalprice, 0.5)"))
        .collect()[0][0]
    )
    assert agg.agg_median(t, "o_totalprice", scan) == pytest.approx(exact, abs=1e-9)


def _exact(df, col="v"):
    return df.agg(F.expr(f"percentile({col}, 0.5)")).collect()[0][0]


def test_median_duplicate_mass_pathological(spark):
    # 99.9% of the column is one value: the sketch bracket degenerates to
    # [7,7] and the iterate loop must resolve via endpoint mass, never via
    # a whole-column buffer. row_budget=64 forces every bounded path.
    rows = [(i, 7.0) for i in range(20000)] + [(20000 + i, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["rowkey", "v"])
    got = agg.exact_median_twophase(df, "v", row_budget=64)
    assert got == pytest.approx(_exact(df), abs=1e-12)


def test_median_two_value_split(spark):
    # exactly half 1.0 / half 2.0 -> median interpolates between the two
    # masses; with a tiny budget the no-progress endpoint path must fire.
    rows = [(i, 1.0) for i in range(5000)] + [(5000 + i, 2.0) for i in range(5000)]
    df = spark.createDataFrame(rows, ["rowkey", "v"])
    got = agg.exact_median_twophase(df, "v", row_budget=16)
    assert got == pytest.approx(1.5, abs=1e-12)


def test_median_all_distinct_tiny_budget(spark):
    # all-distinct uniform column with a budget far below n: loop must
    # narrow via in-window re-sketch until the window fits the budget.
    df = spark.createDataFrame([(i, float(i) * 0.5) for i in range(30001)], ["rowkey", "v"])
    got = agg.exact_median_twophase(df, "v", row_budget=128)
    assert got == pytest.approx(_exact(df), abs=1e-12)


def test_median_duplicate_heavy_sides(spark):
    # big duplicate masses on BOTH sides of the median with distinct
    # middle: exercises finisher B (per-value counts) under tiny budget.
    rows = (
        [(i, 1.0) for i in range(4000)]
        + [(4000 + i, 2.0 + i * 1e-6) for i in range(200)]
        + [(4200 + i, 9.0) for i in range(4000)]
    )
    df = spark.createDataFrame(rows, ["rowkey", "v"])
    got = agg.exact_median_twophase(df, "v", row_budget=32)
    assert got == pytest.approx(_exact(df), abs=1e-12)


def test_summary_one_pass(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/lineitem.parquet", "l_orderkey", "li")
    row = agg.summary(t, "l_quantity").collect()[0]
    assert row["count_v"] == t.df.count()
    assert row["min_v"] <= row["median_v"] <= row["max_v"]


def test_median_property_random_distributions(spark):
    # hypothesis: for ANY value multiset and tiny budget, the bounded
    # two-phase median equals the interpolated exact median.
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(
                st.integers(min_value=-50, max_value=50).map(float),
                st.sampled_from([7.0, 7.0, 7.0, -3.5]),  # duplicate mass
            ),
            min_size=1,
            max_size=300,
        ),
        budget=st.sampled_from([4, 16, 64]),
    )
    def check(vals, budget):
        s = sorted(vals)
        n = len(s)
        rank = 0.5 * (n - 1)
        i0 = int(rank)
        i1 = min(i0 + 1, n - 1)
        expect = s[i0] + (s[i1] - s[i0]) * (rank - i0)
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["rowkey", "v"])
        got = agg.exact_median_twophase(df, "v", row_budget=budget)
        assert got == pytest.approx(expect, abs=1e-9)

    check()
