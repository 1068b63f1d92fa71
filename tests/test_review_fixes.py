"""Regression tests for the code-review findings (each was a real,
silently-wrong behavior)."""

import pytest
from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.index.planner import ScanFilterEvaluator
from hindex_spark.index.spec import IndexSpecification, SeparatorPartition
from hindex_spark.parse_filter import parse_filter
from hindex_spark.table import Scan, Table


def test_planner_does_not_serve_raw_column_from_partition_index(spark):
    # predicate on c_sep must NOT be served by an index on split(c_sep)[2]
    df = spark.createDataFrame([("r1", "A--B--C")], ["rowkey", "c_sep"])
    t = Table(df, "rowkey")
    t.create_index(
        IndexSpecification("idx_sep").add_column(
            "c_sep", "String", value_partition=SeparatorPartition("--", 2)
        )
    )
    f = fl.SingleColumnValueFilter("c_sep", fl.EQUAL, "A--B--C", filter_if_missing=True)
    out = t.scan(Scan(filter=f))
    assert not t.last_index_plan.uses_index  # would have returned 0 rows
    assert out.count() == 1


def test_increment_does_not_zero_untouched_nulls(spark):
    df = spark.createDataFrame(
        [("r1", None), ("r2", 5)], "rowkey string, c_cnt int"
    )
    t = Table(df, "rowkey").increment(
        spark.createDataFrame([("r2", 1)], ["rowkey", "c_cnt"])
    )
    rows = {r["rowkey"]: r["c_cnt"] for r in t.df.collect()}
    assert rows["r1"] is None  # was silently becoming 0
    assert rows["r2"] == 6


def test_append_does_not_blank_untouched_nulls(spark):
    df = spark.createDataFrame(
        [("r1", None), ("r2", "x")], "rowkey string, c_app string"
    )
    t = Table(df, "rowkey").append(
        spark.createDataFrame([("r2", "y")], ["rowkey", "c_app"])
    )
    rows = {r["rowkey"]: r["c_app"] for r in t.df.collect()}
    assert rows["r1"] is None  # was silently becoming ''
    assert rows["r2"] == "xy"


def test_dsl_false_word_is_false(spark):
    df = spark.createDataFrame([("r1", None), ("r2", 9)], "rowkey string, v int")
    t = Table(df, "rowkey")
    f = parse_filter("SingleColumnValueFilter('v', >, 'binary:5', 'false')")
    got = {r["rowkey"] for r in t.scan(Scan(filter=f)).collect()}
    assert got == {"r1", "r2"}  # NULL row kept: filter_if_missing=False
    with pytest.raises(ValueError):
        parse_filter("SingleColumnValueFilter('v', >, 'binary:5', 'maybe')")


def test_check_and_put_null_check_creates_absent_row(spark):
    # the conditional-insert idiom: checkAndPut(row, col, NULL, put)
    # succeeds when the row does not exist at all
    df = spark.createDataFrame([("r1", "taken")], ["rowkey", "c"])
    t = Table(df, "rowkey")
    puts = spark.createDataFrame([("r9", "mine"), ("r1", "stolen")], ["rowkey", "c"])
    t2 = t.check_and_put("c", fl.EQUAL, None, puts)
    rows = {r["rowkey"]: r["c"] for r in t2.df.collect()}
    assert rows["r9"] == "mine"       # absent row -> insert succeeded
    assert rows["r1"] == "taken"      # occupied cell -> put rejected


def test_nested_page_filter_inside_and_applies_limit(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/part.parquet", "p_partkey", "part")
    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("p_size", fl.GREATER, 0, filter_if_missing=True),
            fl.FilterList(
                "AND",
                [
                    fl.SingleColumnValueFilter(
                        "p_size", fl.GREATER, 1, filter_if_missing=True
                    ),
                    fl.PageFilter(10),
                ],
            ),
        ],
    )
    assert t.scan(Scan(filter=f)).count() <= 10  # limit was being dropped


def test_asof_join_null_field_not_backfilled(spark):
    left = spark.createDataFrame([("k", 3)], ["key", "ts"])
    right = spark.createDataFrame(
        [("k", 1, 5.0, "x"), ("k", 2, 7.0, None)],
        "key string, rts long, price double, note string",
    )
    from hindex_spark.operators.temporal import as_of_join

    row = as_of_join(left, right, "key", "ts", "rts").collect()[0]
    assert row["price"] == 7.0
    assert row["note"] is None  # was fabricating note='x' from the rt=1 row


def test_salted_join_rejects_outer_modes(spark):
    from hindex_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_scan_rejects_cell_layer_knobs(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/part.parquet", "p_partkey", "part")
    with pytest.raises(NotImplementedError):
        t.scan(Scan(time_range=(0, 10)))
    with pytest.raises(NotImplementedError):
        t.scan(Scan(max_versions=3))


def test_streaming_ingest_delete_then_reinsert(spark, tmp_path):
    from hindex_spark.streaming.ingest import StreamingIngest

    base = spark.createDataFrame([("r1", 1), ("r2", 2)], ["rowkey", "v"])
    t = Table(base, "rowkey")
    changelog = str(tmp_path / "cl")
    spark.createDataFrame(
        [(1, "delete", "r1", None), (2, "put", "r1", 99)],
        "seq long, op string, rowkey string, v int",
    ).write.parquet(changelog)
    ingest = StreamingIngest(t, seq_col="seq")
    stream = spark.readStream.schema("seq long, op string, rowkey string, v int").parquet(
        changelog
    )
    q = ingest.start(stream)
    q.awaitTermination()
    rows = {r["rowkey"]: r["v"] for r in ingest.table.df.collect()}
    assert rows == {"r1": 99, "r2": 2}  # delete-then-reinsert preserved


def test_streaming_ingest_put_then_delete_with_seq(spark, tmp_path):
    from hindex_spark.streaming.ingest import StreamingIngest

    base = spark.createDataFrame([("r1", 1)], ["rowkey", "v"])
    t = Table(base, "rowkey")
    changelog = str(tmp_path / "cl2")
    spark.createDataFrame(
        [(1, "put", "r1", 50), (2, "delete", "r1", None)],
        "seq long, op string, rowkey string, v int",
    ).write.parquet(changelog)
    ingest = StreamingIngest(t, seq_col="seq")
    stream = spark.readStream.schema("seq long, op string, rowkey string, v int").parquet(
        changelog
    )
    q = ingest.start(stream)
    q.awaitTermination()
    assert ingest.table.df.filter(F.col("rowkey") == "r1").count() == 0


def test_increment_append_reject_unknown_columns(spark):
    import pytest
    from hindex_spark.table import Table

    df = spark.createDataFrame([("r1", 1, "a")], ["rowkey", "c_cnt", "c_app"])
    t = Table(df, "rowkey")
    with pytest.raises(ValueError, match="increment columns not in table"):
        t.increment(spark.createDataFrame([("r1", 5)], ["rowkey", "c_cnt_typo"]))
    with pytest.raises(ValueError, match="append columns not in table"):
        t.append(spark.createDataFrame([("r1", "x")], ["rowkey", "c_app_typo"]))


def test_random_row_filter_same_rows_both_shapes(spark, sf_dir):
    # standalone apply() vs predicate() inside an OR FilterList must
    # select identical row sets (one Bernoulli mechanism)
    from hindex_spark import filters as fl
    from hindex_spark.table import Scan, Table

    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    rrf = fl.RandomRowFilter(0.1, seed=7)
    alone = {r["o_orderkey"] for r in t.scan(Scan(filter=rrf)).select("o_orderkey").collect()}
    never = fl.SingleColumnValueFilter("o_custkey", fl.LESS, -1, filter_if_missing=True)
    ored = {
        r["o_orderkey"]
        for r in t.scan(Scan(filter=fl.FilterList("OR", [rrf, never])))
        .select("o_orderkey")
        .collect()
    }
    assert alone == ored and len(alone) > 0
