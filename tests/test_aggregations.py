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


def test_summary_one_pass(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/lineitem.parquet", "l_orderkey", "li")
    row = agg.summary(t, "l_quantity").collect()[0]
    assert row["count_v"] == t.df.count()
    assert row["min_v"] <= row["median_v"] <= row["max_v"]
