"""End-to-end smoke: M1 slice — scan + projection + range + filter."""

from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.table import Scan, Table


def test_scan_range_filter_projection(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    scan = Scan(
        start_row=100,
        stop_row=200,
        columns=["o_custkey", "o_totalprice"],
        filter=fl.SingleColumnValueFilter(
            "o_totalprice", fl.GREATER, 100000.0, filter_if_missing=True
        ),
    )
    rows = t.scan(scan).collect()
    assert rows
    for r in rows:
        assert 100 <= r["o_orderkey"] < 200
        assert r["o_totalprice"] > 100000.0
    assert set(rows[0].asDict().keys()) == {"o_orderkey", "o_custkey", "o_totalprice"}


def test_get_and_floor(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    assert t.get(42).count() == 1
    row = t.get_row_or_before(41).collect()[0]
    assert row["o_orderkey"] <= 41


def test_pushdown_reaches_parquet(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    plan = t.get(42)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan
