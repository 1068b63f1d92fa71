"""explain_scan spy output, salted join, CellTable.as_table bridge."""

from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.index.spec import IndexSpecification
from hindex_spark.operators.skew import salted_join, top_keys
from hindex_spark.table import CellTable, Scan, Table


def test_explain_scan_reports_index_decision(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    t.create_index(IndexSpecification("idx_cust").add_column("o_custkey", "Long"))
    f = fl.SingleColumnValueFilter("o_custkey", fl.EQUAL, 85, filter_if_missing=True)
    report = t.explain_scan(Scan(filter=f))
    assert "index: idx_cust" in report
    assert "IndexScan[idx_cust](o_custkey=85)" in report
    assert "spark physical plan" in report

    rep2 = t.explain_scan(Scan(filter=fl.RowFilter(fl.LESS, 100)))
    assert "index: none" in rep2

    f3 = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("o_custkey", fl.GREATER, 10, filter_if_missing=True),
            fl.SingleColumnValueFilter("o_custkey", fl.LESS, 5, filter_if_missing=True),
        ],
    )
    assert "CONTRADICTION" in t.explain_scan(Scan(filter=f3))


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    salted = salted_join(li, orders, "l_orderkey", salt=8).agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_top_keys_diagnostic(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tk = top_keys(ev, "event_type", n=3).collect()
    assert len(tk) == 3
    assert tk[0]["rows"] >= tk[1]["rows"] >= tk[2]["rows"]
    assert 0 < tk[0]["share"] <= 1


def test_celltable_as_table_scans_with_filters(spark):
    ct = CellTable(spark).put_cells(
        [
            ("r1", "cf1", "c1", 1, "5"),
            ("r1", "cf1", "c1", 2, "9"),  # newer version wins
            ("r2", "cf1", "c1", 1, "3"),
            ("r2", "cf1", "c2", 1, "x"),
        ]
    )
    t = ct.as_table([("cf1", "c1"), ("cf1", "c2")])
    out = t.scan(
        Scan(filter=fl.SingleColumnValueFilter("cf1_c1", fl.GREATER_OR_EQUAL, "5", filter_if_missing=True))
    )
    rows = out.collect()
    assert [r["rowkey"] for r in rows] == ["r1"]
    assert rows[0]["cf1_c1"] == "9"
