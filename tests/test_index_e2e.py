"""End-to-end index tests: index-accelerated scans return exactly the
same rows as plain filtered scans (TestMultipleIndicesInScan model),
and index maintenance tracks mutations (TestIndexRegionObserver model)."""

from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.index.spec import IndexSpecification, SeparatorPartition, SpatialPartition
from hindex_spark.table import Scan, Table


def _orders(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    t.create_index(IndexSpecification("idx_cust").add_column("o_custkey", "Long"))
    t.create_index(
        IndexSpecification("idx_status_date")
        .add_column("o_orderstatus", "String")
        .add_column("o_orderdate", "String")
    )
    return t


def _sorted_keys(df, key="o_orderkey"):
    return sorted(r[key] for r in df.select(key).collect())


def test_index_semijoin_matches_plain_filter(spark, sf_dir):
    t = _orders(spark, sf_dir)
    f = fl.SingleColumnValueFilter("o_custkey", fl.EQUAL, 85, filter_if_missing=True)
    via_index = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["idx_cust"]
    plain = t.df.filter(F.col("o_custkey") == 85)
    assert _sorted_keys(via_index) == _sorted_keys(plain)
    assert via_index.count() > 0


def test_multicol_index_equals_prefix_plus_range(spark, sf_dir):
    t = _orders(spark, sf_dir)
    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("o_orderstatus", fl.EQUAL, "F", filter_if_missing=True),
            fl.SingleColumnValueFilter(
                "o_orderdate", fl.GREATER_OR_EQUAL, "1996-01-01", filter_if_missing=True
            ),
        ],
    )
    via_index = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["idx_status_date"]
    plain = t.df.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderdate") >= "1996-01-01")
    )
    assert _sorted_keys(via_index) == _sorted_keys(plain)


def test_or_union_of_indexes(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/customer.parquet", "c_custkey", "customer")
    t.create_index(IndexSpecification("idx_nation").add_column("c_nationkey", "Int"))
    f = fl.FilterList(
        "OR",
        [
            fl.SingleColumnValueFilter("c_nationkey", fl.EQUAL, 1, filter_if_missing=True),
            fl.SingleColumnValueFilter("c_nationkey", fl.EQUAL, 2, filter_if_missing=True),
        ],
    )
    via_index = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["idx_nation"]
    plain = t.df.filter(F.col("c_nationkey").isin(1, 2))
    assert _sorted_keys(via_index, "c_custkey") == _sorted_keys(plain, "c_custkey")


def test_contradiction_returns_empty(spark, sf_dir):
    t = _orders(spark, sf_dir)
    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("o_custkey", fl.GREATER, 100, filter_if_missing=True),
            fl.SingleColumnValueFilter("o_custkey", fl.LESS, 50, filter_if_missing=True),
        ],
    )
    assert t.scan(Scan(filter=f)).count() == 0
    assert t.last_index_plan.is_empty


def test_no_index_hint_skips_index(spark, sf_dir):
    from hindex_spark.index.planner import NoIndexExpression

    t = _orders(spark, sf_dir)
    f = fl.SingleColumnValueFilter("o_custkey", fl.EQUAL, 85, filter_if_missing=True)
    out = t.scan(Scan(filter=f, index_hint=NoIndexExpression()))
    assert not t.last_index_plan.uses_index
    assert out.count() == t.df.filter(F.col("o_custkey") == 85).count()


def test_value_partition_separator_index(spark):
    df = spark.createDataFrame(
        [("r1", "A--B--C"), ("r2", "A--X--C"), ("r3", "Z--B--Q")], ["rowkey", "c_sep"]
    )
    t = Table(df, "rowkey", "parttab")
    t.create_index(
        IndexSpecification("idx_sep").add_column(
            "c_sep", "String", value_partition=SeparatorPartition("--", 2)
        )
    )
    # query on the partition expression via the index's indexed_name
    f = fl.SingleColumnValueFilter("c_sep__sep2", fl.EQUAL, "B", filter_if_missing=True)
    tree = f.index_tree(t)
    from hindex_spark.index.planner import ScanFilterEvaluator

    plan = ScanFilterEvaluator(t.indices.indices, "rowkey").evaluate(tree)
    assert plan.used_indexes == ["idx_sep"]
    keys = plan.rowkeys(t.index_tables)
    assert sorted(r["rowkey"] for r in keys.collect()) == ["r1", "r3"]


def test_value_partition_spatial_index(spark):
    df = spark.createDataFrame(
        [("r1", "xxABCyy"), ("r2", "xxZZZyy"), ("r3", "xxABCzz")], ["rowkey", "c_spatial"]
    )
    t = Table(df, "rowkey", "parttab")
    t.create_index(
        IndexSpecification("idx_sub").add_column(
            "c_spatial", "String", value_partition=SpatialPartition(2, 3)
        )
    )
    from hindex_spark.index.planner import ScanFilterEvaluator

    f = fl.SingleColumnValueFilter("c_spatial__sub2_3", fl.EQUAL, "ABC", filter_if_missing=True)
    plan = ScanFilterEvaluator(t.indices.indices, "rowkey").evaluate(f.index_tree(t))
    keys = plan.rowkeys(t.index_tables)
    assert sorted(r["rowkey"] for r in keys.collect()) == ["r1", "r3"]


# --- TestValuePartitionInScan analogs: the user-facing Table.scan path --


def _sep_table(spark):
    # testSeparatorPartition (TestValuePartitionInScan.java:102): "_"-split,
    # piece 3 indexed; 2 of 3 rows match "huawei"
    df = spark.createDataFrame(
        [
            ("row", "2ndFloor_solitaire_huawei_bangalore_karnataka"),
            ("row2", "7thFloor_solitaire_huawei_bangalore_karnataka"),
            ("row3", "rrr_sss_hhh_bangalore_karnataka"),
        ],
        ["rowkey", "cq"],
    )
    t = Table(df, "rowkey", "septab")
    t.create_index(
        IndexSpecification("idx1").add_column(
            "cq", "String", value_partition=SeparatorPartition("_", 3)
        )
    )
    return t


def test_scan_with_partition_filter_named(spark):
    t = _sep_table(spark)
    f = fl.SingleColumnValuePartitionFilter(
        "cq", fl.EQUAL, "huawei", filter_if_missing=True,
        value_partition=SeparatorPartition("_", 3),
    )
    out = t.scan(Scan(filter=f))
    assert sorted(r["rowkey"] for r in out.collect()) == ["row", "row2"]
    assert t.last_index_plan.used_indexes == ["idx1"]


def test_scan_with_derived_name_scvf(spark):
    # same query expressed as SCVF on the derived name — resolve_column
    # materializes the partition expression for the residual filter
    t = _sep_table(spark)
    f = fl.SingleColumnValueFilter("cq__sep3", fl.EQUAL, "huawei", filter_if_missing=True)
    out = t.scan(Scan(filter=f))
    assert sorted(r["rowkey"] for r in out.collect()) == ["row", "row2"]
    assert t.last_index_plan.used_indexes == ["idx1"]


def test_scan_two_spatial_indices_same_column(spark):
    # testSpatialPartitionIfMulitplePartsOfValueAreIndexedByDifferentIndicesOnSameColumn
    # (TestValuePartitionInScan.java:198): AND of two partition filters on
    # the same physical column, each served by its own expression index
    df = spark.createDataFrame(
        [("row", "helloworldmultiple"), ("row2", "spatialmultiple"), ("row3", "partitionmultiple")],
        ["rowkey", "cq"],
    )
    t = Table(df, "rowkey", "spatab")
    t.create_index(
        IndexSpecification("idx1").add_column(
            "cq", "String", value_partition=SpatialPartition(2, 3)
        )
    )
    t.create_index(
        IndexSpecification("idx2").add_column(
            "cq", "String", value_partition=SpatialPartition(5, 2)
        )
    )
    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValuePartitionFilter(
                "cq", fl.EQUAL, "rti", filter_if_missing=True,
                value_partition=SpatialPartition(2, 3),
            ),
            fl.SingleColumnValuePartitionFilter(
                "cq", fl.GREATER_OR_EQUAL, "ti", filter_if_missing=True,
                value_partition=SpatialPartition(5, 2),
            ),
        ],
    )
    out = t.scan(Scan(filter=f))
    assert sorted(r["rowkey"] for r in out.collect()) == ["row3"]
    assert sorted(t.last_index_plan.used_indexes) == ["idx1", "idx2"]


def test_scan_partition_filter_and_scvf_combination(spark):
    # testCombinationOfPartitionFiltersWithSCVF (:359): partition filter
    # AND a plain SCVF on another column
    df = spark.createDataFrame(
        [
            ("row", "a_huawei_x", 5),
            ("row2", "b_huawei_y", 9),
            ("row3", "c_other_z", 5),
        ],
        ["rowkey", "cq", "n"],
    )
    t = Table(df, "rowkey", "combtab")
    t.create_index(
        IndexSpecification("idx_p").add_column(
            "cq", "String", value_partition=SeparatorPartition("_", 2)
        )
    )
    t.create_index(IndexSpecification("idx_n").add_column("n", "Int"))
    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValuePartitionFilter(
                "cq", fl.EQUAL, "huawei", filter_if_missing=True,
                value_partition=SeparatorPartition("_", 2),
            ),
            fl.SingleColumnValueFilter("n", fl.EQUAL, 5, filter_if_missing=True),
        ],
    )
    out = t.scan(Scan(filter=f))
    assert sorted(r["rowkey"] for r in out.collect()) == ["row"]
    assert len(t.last_index_plan.used_indexes) >= 1


def test_index_maintenance_on_put_and_delete(spark, sf_dir):
    t = _orders(spark, sf_dir)
    # move order 0 to customer 999, delete order 1
    puts = spark.createDataFrame([(0, 999)], ["o_orderkey", "o_custkey"])
    t2 = t.put(puts)
    dels = spark.createDataFrame([(1,)], ["o_orderkey"])
    t3 = t2.delete(dels)

    idx = t3.index_tables["idx_cust"]
    assert idx.filter((F.col("o_custkey") == 999) & (F.col("o_orderkey") == 0)).count() == 1
    assert idx.filter(F.col("o_orderkey") == 1).count() == 0
    # index row count == table rows with non-null custkey
    assert idx.count() == t3.df.filter(F.col("o_custkey").isNotNull()).count()

    # and queries through the index see the new state
    f = fl.SingleColumnValueFilter("o_custkey", fl.EQUAL, 999, filter_if_missing=True)
    assert _sorted_keys(t3.scan(Scan(filter=f))) == [0]


def test_mixed_or_of_and_branches(spark, sf_dir):
    # (status='F' AND date>=X) OR custkey=85 — OR of a multi-col-index AND
    # branch and a single-col leaf; both indexable -> union plan
    t = _orders(spark, sf_dir)  # has idx_cust(o_custkey) + idx_status_date
    f = fl.FilterList(
        "OR",
        [
            fl.FilterList(
                "AND",
                [
                    fl.SingleColumnValueFilter(
                        "o_orderstatus", fl.EQUAL, "F", filter_if_missing=True
                    ),
                    fl.SingleColumnValueFilter(
                        "o_orderdate", fl.GREATER_OR_EQUAL, "1997-06-01", filter_if_missing=True
                    ),
                ],
            ),
            fl.SingleColumnValueFilter("o_custkey", fl.EQUAL, 85, filter_if_missing=True),
        ],
    )
    out = t.scan(Scan(filter=f))
    assert set(t.last_index_plan.used_indexes) == {"idx_status_date", "idx_cust"}
    plain = t.df.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_orderdate") >= "1997-06-01"))
        | (F.col("o_custkey") == 85)
    )
    assert _sorted_keys(out) == _sorted_keys(plain)


def test_typed_index_negative_range(spark):
    # F2 fixture: sign-boundary ranges on typed columns
    rows = [(f"r{i}", i) for i in range(-10, 11)]
    df = spark.createDataFrame(rows, ["rowkey", "c_int"])
    t = Table(df, "rowkey", "typedtab")
    t.create_index(IndexSpecification("idx_int").add_column("c_int", "Int"))
    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("c_int", fl.GREATER_OR_EQUAL, -5, filter_if_missing=True),
            fl.SingleColumnValueFilter("c_int", fl.LESS_OR_EQUAL, 5, filter_if_missing=True),
        ],
    )
    out = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["idx_int"]
    vals = sorted(r["c_int"] for r in out.collect())
    assert vals == list(range(-5, 6))


def test_round4_idxtab_combination_gates(spark):
    """The 13 TestMultipleIndicesInScan ports each assert their chosen
    index inside the query body — running them IS the planner
    regression (rows are oracle-checked separately by the gate)."""
    from hindex_spark.queries import QUERIES
    import hindex_spark.queries_idxtab  # noqa: F401 - registers gates

    for name in [
        "idxtab_and_or_combination", "idxtab_equal_range_combination",
        "idxtab_or_all_range", "idxtab_or_poisoned_branch",
        "idxtab_and_with_poisoned_or", "idxtab_range_not_last",
        "idxtab_multilevel_or", "idxtab_similar_value_pattern",
        "idxtab_negative_int_eq", "idxtab_negative_int_range",
        "idxtab_negative_float_range", "idxtab_negative_double_le",
        "idxtab_complex_range_or",
    ]:
        assert QUERIES[name](spark, "unused").count() >= 0


def test_index_put_value_longer_than_max_length_fails(spark):
    """TestIndexRegionObserver.testIndexPutWithValueGreaterThanLength:590
    / testPutWithValueLengthMoreThanMaxValueLength:1091 — a String value
    longer than the column's max_value_length must FAIL the index write
    (IOException in IndexUtils.prepareIndexPut), both at batch build and
    on put-time maintenance; values at the limit pass."""
    import pytest

    from hindex_spark.index.spec import ColumnQualifier, IndexSpecification
    from hindex_spark.table import Table

    df = spark.createDataFrame(
        [("r1", "short"), ("r2", "exactly_10")], "rowkey string, v string"
    )
    spec = IndexSpecification(
        "idx_v", [ColumnQualifier("v", "String", max_value_length=10)]
    )
    t = Table(df, "rowkey", "lim").create_index(spec)
    assert t.index_tables["idx_v"].count() == 2  # at-limit value passes
    # batch build over an over-length value fails the job
    bad = spark.createDataFrame(
        [("r3", "testvalue11")], "rowkey string, v string"
    )
    t_bad = Table(df.unionByName(bad), "rowkey", "lim2")
    with pytest.raises(Exception, match="max_value_length"):
        t_bad.create_index(
            IndexSpecification(
                "idx_v2", [ColumnQualifier("v", "String", max_value_length=10)]
            )
        ).index_tables["idx_v2"].count()
    # put-time maintenance fails too
    with pytest.raises(Exception, match="max_value_length"):
        t.put(bad).index_tables["idx_v"].count()


def test_spatial_partition_value_smaller_than_offset(spark):
    # TestExtendedPutOps.testIndexPutWithOffsetAndLengthWhenPutIsSmallerThanOffset:292
    # — SpatialPartition(20, 2): a 17-char value yields an empty part, a
    # 21-char value yields the single char 'I'. (The reference pads the
    # byte[] index key with zeros; typed columns need no padding — the
    # derived value is '' / 'I' and the index path must agree with the
    # plain residual-filter path on both.)
    df = spark.createDataFrame(
        [
            ("row1", "AB---CD---EF---GH---IJ---KL---MN---OP---"),  # full: "IJ"
            ("row2", "AB---CD---EF---GH"),                          # short: ""
            ("row3", "AB---CD---EF---GH---I"),                      # 21 chars: "I"
        ],
        ["rowkey", "col_ql1"],
    )
    t = Table(df, "rowkey", "spatialtab")
    t.create_index(
        IndexSpecification("index").add_column(
            "col_ql1", "String", value_partition=SpatialPartition(20, 2)
        )
    )
    derived = "col_ql1__sub20_2"
    for probe, expect in (("IJ", ["row1"]), ("I", ["row3"]), ("", ["row2"])):
        f = fl.SingleColumnValueFilter(derived, fl.EQUAL, probe, filter_if_missing=True)
        got = t.scan(Scan(filter=f))
        assert sorted(r["rowkey"] for r in got.collect()) == expect, probe


def test_separator_partition_empty_and_missing_piece(spark):
    # TestExtendedPutOps.testPutWithOneUnitLengthSeparatorWithoutValue:155 —
    # SeparatorPartition('_', 4) on "2ndFloor_solitaire_huawei__karnataka":
    # the 4th piece is EMPTY (double separator) and must index/scan as ''.
    # A value with fewer than 3 separators has NO 4th piece: the reference
    # zero-pads it identically to '' at the byte layer; the typed engine
    # derives NULL (no index entry) — deviation documented here; what is
    # pinned is that the index path and the plain filter path AGREE.
    df = spark.createDataFrame(
        [
            ("row1", "2ndFloor_solitaire_huawei__karnataka"),  # 4th piece ''
            ("row2", "a_b_c_dd_e"),                            # 4th piece 'dd'
            ("row3", "too_few_seps"),                          # no 4th piece
        ],
        ["rowkey", "col_ql1"],
    )
    t = Table(df, "rowkey", "septab")
    t.create_index(
        IndexSpecification("index").add_column(
            "col_ql1", "String", value_partition=SeparatorPartition("_", 4)
        )
    )
    derived = "col_ql1__sep4"
    f_empty = fl.SingleColumnValueFilter(derived, fl.EQUAL, "", filter_if_missing=True)
    got = t.scan(Scan(filter=f_empty))
    assert sorted(r["rowkey"] for r in got.collect()) == ["row1"]
    assert t.last_index_plan.used_indexes == ["index"]
    f_dd = fl.SingleColumnValueFilter(derived, fl.EQUAL, "dd", filter_if_missing=True)
    assert [r["rowkey"] for r in t.scan(Scan(filter=f_dd)).collect()] == ["row2"]
    # index path agrees with the forced-residual (NoIndexExpression) path
    from hindex_spark.index.planner import NoIndexExpression

    for probe in ("", "dd", "karnataka"):
        f = fl.SingleColumnValueFilter(derived, fl.EQUAL, probe, filter_if_missing=True)
        a = sorted(r["rowkey"] for r in t.scan(Scan(filter=f)).collect())
        b = sorted(
            r["rowkey"]
            for r in t.scan(Scan(filter=f, index_hint=NoIndexExpression())).collect()
        )
        assert a == b, probe


def test_scan_pipeline_range_index_reversed_limit_compose(spark):
    # TestIndexRegionObserverForScan shape: one Scan carrying a rowkey
    # range AND an indexable filter AND reversal AND a limit — every
    # stage of the read pipeline (range prune -> index semi-join ->
    # residual filter -> order -> limit) composes on one plan.
    df = spark.createDataFrame([("r%02d" % i, i % 5) for i in range(30)], ["rowkey", "v"])
    t = Table(df, "rowkey").create_index(IndexSpecification("idx_v").add_column("v", "Int"))
    got = t.scan(
        Scan(
            start_row="r05",
            stop_row="r20",
            filter=fl.SingleColumnValueFilter("v", fl.EQUAL, 2, filter_if_missing=True),
            reversed=True,
            limit=2,
        )
    )
    assert [r["rowkey"] for r in got.collect()] == ["r17", "r12"]
    assert t.last_index_plan.used_indexes == ["idx_v"]
