"""Round-5 fidelity ports from the reference index suites that weren't
yet covered: stale-index phantom rows, overlapping bulk puts, checkAnd*
index maintenance, TTL-expired rows under an index, Short/Byte/Char
typed columns, separator+datatype partitions, and partial-cover AND
planning (reference files cited per test)."""

from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.index.spec import IndexSpecification, SeparatorPartition
from hindex_spark.table import Scan, Table


def _keys(df, key="rowkey"):
    return sorted(r[key] for r in df.select(key).collect())


def test_stale_index_entry_produces_no_phantom_rows(spark):
    """hbase-secondaryindex/src/test/.../TestIndexRegionObserverForScan.java:486
    (testScanShouldNotRetreiveRowsIfRowsArePresentOnlyInIndexedTableAndNotInMainTable):
    an index entry with no backing main-table row must contribute ZERO
    rows — the main scan re-verifies every seek point. The indexed flow
    must still be used (the reference asserts getIndexedFlowUsed())."""
    rows = (
        [(f"row{i}", "cat") for i in range(1, 101)]
        + [(f"row{i}", "dog") for i in range(101, 201)]
        + [(f"row{i}", "pup") for i in range(201, 301)]
    )
    t = Table(spark.createDataFrame(rows, ["rowkey", "col_ql"]), "rowkey", "phantom")
    t.create_index(IndexSpecification("ScanIndex").add_column("col_ql", "String"))
    # poison the index table directly: an entry for a value and rowkey
    # that do not exist in the main table (the reference writes straight
    # into the _idx HTable)
    bogus = spark.createDataFrame([("idxCat", "rowNOPE")], ["col_ql", "rowkey"])
    t.index_tables["ScanIndex"] = t.index_tables["ScanIndex"].unionByName(bogus)

    f = fl.SingleColumnValueFilter("col_ql", fl.EQUAL, "idxCat", filter_if_missing=True)
    out = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["ScanIndex"]
    assert out.count() == 0

    # a stale entry pointing at an EXISTING row with a non-matching value
    # is likewise rejected by the residual filter re-check
    stale = spark.createDataFrame([("idxCat", "row1")], ["col_ql", "rowkey"])
    t.index_tables["ScanIndex"] = t.index_tables["ScanIndex"].unionByName(stale)
    out2 = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["ScanIndex"]
    assert out2.count() == 0


def test_overlapping_bulk_puts_row_and_index_counts(spark):
    """TestIndexRegionObserver.java:448 (testBulkPutWithRepeatedRows):
    two concurrent 5-row batches overlapping on row3/row4 leave 8 rows
    in the main table AND 8 entries in the index table."""
    batch1 = [(f"row{i}", "myValue") for i in (1, 2, 3, 4, 5)]
    batch2 = [(f"row{i}", "myValue") for i in (6, 7, 3, 4, 10)]
    empty = spark.createDataFrame([], "rowkey string, col1_ql1 string")
    t = Table(empty, "rowkey", "bulktab")
    t.create_index(IndexSpecification("Index1").add_column("col1_ql1", "String", 10))
    t = t.put(spark.createDataFrame(batch1, ["rowkey", "col1_ql1"]))
    t = t.put(spark.createDataFrame(batch2, ["rowkey", "col1_ql1"]))
    assert t.df.count() == 8
    idx = t.index_tables["Index1"]
    assert idx.count() == 8
    assert _keys(idx) == _keys(t.df)


def test_check_and_put_replaces_index_entry(spark):
    """TestIndexRegionObserver.java:1263
    (testCheckAndPutFor1PutShouldHav2PutsInIndexTableAndShouldReplaceWithNewValue):
    a successful checkAndPut must retire the OLD value's index entry and
    serve scans through the NEW one."""
    t = Table(
        spark.createDataFrame([("row1", "cat"), ("row2", "dog")], ["rowkey", "col_ql"]),
        "rowkey",
        "captab",
    )
    t.create_index(IndexSpecification("idx").add_column("col_ql", "String"))
    # passes: row1's current value is 'cat'
    t2 = t.check_and_put(
        "col_ql", fl.EQUAL, "cat",
        spark.createDataFrame([("row1", "dogs")], ["rowkey", "col_ql"]),
    )
    idx = t2.index_tables["idx"]
    assert sorted((r["col_ql"], r["rowkey"]) for r in idx.collect()) == [
        ("dog", "row2"),
        ("dogs", "row1"),
    ]
    f_new = fl.SingleColumnValueFilter("col_ql", fl.EQUAL, "dogs", filter_if_missing=True)
    assert _keys(t2.scan(Scan(filter=f_new))) == ["row1"]
    assert t2.last_index_plan.used_indexes == ["idx"]
    f_old = fl.SingleColumnValueFilter("col_ql", fl.EQUAL, "cat", filter_if_missing=True)
    assert t2.scan(Scan(filter=f_old)).count() == 0
    # failing check mutates nothing (value no longer 'cat')
    t3 = t2.check_and_put(
        "col_ql", fl.EQUAL, "cat",
        spark.createDataFrame([("row1", "never")], ["rowkey", "col_ql"]),
    )
    assert t3.df.filter(F.col("col_ql") == "never").count() == 0
    assert t3.index_tables["idx"].filter(F.col("col_ql") == "never").count() == 0


def test_check_and_delete_removes_row_and_index_entry(spark):
    """TestIndexRegionObserver.java:1355
    (testCheckAndDeleteShudDeleteTheRowSuccessfullyInBothIndexAndMainTable)."""
    t = Table(
        spark.createDataFrame([("row1", "cat"), ("row2", "dog")], ["rowkey", "col_ql"]),
        "rowkey",
        "cadtab",
    )
    t.create_index(IndexSpecification("idx").add_column("col_ql", "String"))
    dels = spark.createDataFrame([("row1",)], ["rowkey"])
    t2 = t.check_and_delete("col_ql", fl.EQUAL, "cat", dels)
    assert _keys(t2.df) == ["row2"]
    assert _keys(t2.index_tables["idx"]) == ["row2"]
    # failed check (wrong expected value) deletes nothing
    t3 = t2.check_and_delete(
        "col_ql", fl.EQUAL, "cat", spark.createDataFrame([("row2",)], ["rowkey"])
    )
    assert _keys(t3.df) == ["row2"]
    assert _keys(t3.index_tables["idx"]) == ["row2"]


def test_ttl_expired_rows_invisible_via_index(spark):
    """TestScanWhenTTLExpired.java /
    TestIndexRegionObserver.java:1814 (testIndexDataDeletionOnTTLExpiry):
    rows past the family TTL vanish from indexed scans. Here TTL
    resolution is a cell-layer compaction; the derived wide table and a
    rebuilt index agree — an index-accelerated scan sees only live rows."""
    from hindex_spark.table import CellTable

    now, ttl = 1000, 100  # ttl shares the ts unit (resolve: ts >= now-ttl)
    cells = [
        # (rowkey, cf, qualifier, ts, value) — 'old' written before
        # now-ttl, rows 'a'/'b' fresh
        ("old", "col", "ql", now - 500, "cat"),
        ("a", "col", "ql", now - 10, "cat"),
        ("b", "col", "ql", now - 20, "dog"),
    ]
    ct = CellTable(spark).put_cells(cells)
    compacted = ct.compact(max_versions=1, ttl=ttl, now=now)
    t = compacted.as_table([("col", "ql")])
    t.create_index(IndexSpecification("idx").add_column("col_ql", "String"))
    f = fl.SingleColumnValueFilter("col_ql", fl.EQUAL, "cat", filter_if_missing=True)
    out = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["idx"]
    assert _keys(out) == ["a"]  # 'old' expired, 'b' is dog
    assert t.index_tables["idx"].count() == 2  # only live rows indexed


def test_short_byte_typed_index_negative_ranges(spark):
    """TestExtendedPutOps.java:485,509
    (testIndexPutWithShortDataTypes / testIndexPutWithByteDataTypes):
    Short/Byte indexed columns order correctly across the sign boundary
    (the reference flips the sign bit for memcmp order; typed columns
    give the same ordering natively)."""
    rows = [("r1", -32700, -128), ("r2", -5, -1), ("r3", 0, 0), ("r4", 7, 1), ("r5", 32700, 127)]
    df = spark.createDataFrame(rows, "rowkey string, s short, b tinyint")
    t = Table(df, "rowkey", "shorttab")
    t.create_index(IndexSpecification("idx_s").add_column("s", "Short"))
    t.create_index(IndexSpecification("idx_b").add_column("b", "Byte"))

    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("s", fl.GREATER_OR_EQUAL, -32700, filter_if_missing=True),
            fl.SingleColumnValueFilter("s", fl.LESS, 7, filter_if_missing=True),
        ],
    )
    out = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["idx_s"]
    assert _keys(out) == ["r1", "r2", "r3"]

    fb = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("b", fl.GREATER, -128, filter_if_missing=True),
            fl.SingleColumnValueFilter("b", fl.LESS_OR_EQUAL, 1, filter_if_missing=True),
        ],
    )
    outb = t.scan(Scan(filter=fb))
    assert t.last_index_plan.used_indexes == ["idx_b"]
    assert _keys(outb) == ["r2", "r3", "r4"]


def test_char_typed_index_equality(spark):
    """TestExtendedPutOps.java:533 (testIndexPutWithCharDataTypes)."""
    df = spark.createDataFrame(
        [("r1", "A"), ("r2", "B"), ("r3", "A")], ["rowkey", "c"]
    )
    t = Table(df, "rowkey", "chartab")
    t.create_index(IndexSpecification("idx_c").add_column("c", "Char", 1))
    f = fl.SingleColumnValueFilter("c", fl.EQUAL, "A", filter_if_missing=True)
    out = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["idx_c"]
    assert _keys(out) == ["r1", "r3"]


def test_separator_partition_with_int_datatype(spark):
    """TestExtendedPutOps.java:763 (testIndexPutWithSeparatorAndDataType):
    a SeparatorPartition piece indexed as Int must order numerically
    (the reference sign-flips the parsed int for memcmp order) — so a
    typed RANGE over the piece works, not just equality."""
    rows = [("r1", "AB---CD---EF---100000"), ("r2", "AB---CD---EF----5"),
            ("r3", "AB---CD---EF---99"), ("r4", "no-separator-here")]
    t = Table(spark.createDataFrame(rows, ["rowkey", "col_ql1"]), "rowkey", "septab")
    t.create_index(
        IndexSpecification("index").add_column(
            "col_ql1", "Int", 4, value_partition=SeparatorPartition("---", 4)
        )
    )
    idx = t.index_tables["index"]
    # r4 has no 4th piece -> no index entry (prepareIndexPut skips it);
    # the piece is typed int, so it sorts numerically: -5 < 99 < 100000
    assert [r["rowkey"] for r in idx.orderBy("col_ql1__sep4").collect()] == ["r2", "r3", "r1"]
    f = fl.SingleColumnValueFilter(
        "col_ql1__sep4", fl.GREATER_OR_EQUAL, 99, filter_if_missing=True
    )
    from hindex_spark.index.planner import ScanFilterEvaluator

    plan = ScanFilterEvaluator(t.indices.indices, "rowkey").evaluate(f.index_tree(t))
    assert plan.used_indexes == ["index"]
    assert _keys(plan.rowkeys(t.index_tables)) == ["r1", "r3"]


def _mul_idx_table(spark):
    """putMulIndex fixture of TestIndexRegionObserverForScan.java:661-716:
    two single-column indexes on col1_ql and col2_ql, 5 rows matching
    (col1=cat AND col2=dog)."""
    rows = [
        ("row1", "cat", "dog"), ("row2", "dog", "cat"), ("row3", "cat", "dog"),
        ("row4", "dog", "dog"), ("row5", "cat", "dog"), ("row6", "cat", "cat"),
        ("row7", "cat", "dog"), ("row9", "cat", "dog"),
    ]
    t = Table(spark.createDataFrame(rows, ["rowkey", "col1_ql", "col2_ql"]), "rowkey", "mul")
    t.create_index(IndexSpecification("idx1").add_column("col1_ql", "String", 10))
    t.create_index(IndexSpecification("idx2").add_column("col2_ql", "String", 10))
    return t


def test_filters_in_reverse_order_of_index_columns(spark):
    """TestIndexRegionObserverForScan.java:717
    (testScanWithIndexOn2ColumnsAndFiltersOn2ColumnsInReverseWayShouldBeSuccessful):
    filter order (col2 first, col1 second) must not matter — the AND
    planner matches columns to indexes regardless of list position."""
    t = _mul_idx_table(spark)
    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("col2_ql", fl.EQUAL, "dog", filter_if_missing=True),
            fl.SingleColumnValueFilter("col1_ql", fl.EQUAL, "cat", filter_if_missing=True),
        ],
    )
    out = t.scan(Scan(filter=f))
    assert t.last_index_plan.uses_index
    assert out.count() == 5


def test_and_with_unindexed_column_still_uses_partial_index(spark):
    """TestIndexRegionObserverForScan.java:750
    (testScanMultipleIdxWithDifferentColumnsInFiltersShouldBeSuccessful...):
    AND(col1=cat, col3=dog) where only col1 is indexed: the reference
    STILL drives the scan through the col1 index and re-checks col3 on
    the main rows (getIndexedFlowUsed() is asserted true) — 1 match,
    and a non-matching col3 value yields 0 but still uses the index."""
    rows = [
        ("row1", "cat", "dog", None), ("row2", "dog", "cat", None),
        ("row3", "cat", "dog", None), ("row4", "dog", "dog", None),
        ("row5", "cat", "dog", None), ("row6", "cat", "cat", None),
        ("row7", "cat", "dog", None), ("row8", "cat", None, "dog"),
        ("row9", "cat", "dog", None),
    ]
    t = Table(
        spark.createDataFrame(rows, "rowkey string, col1_ql string, col2_ql string, col3_ql string"),
        "rowkey",
        "partial",
    )
    t.create_index(
        IndexSpecification("ScanMulIndex")
        .add_column("col1_ql", "String", 10)
        .add_column("col2_ql", "String", 10)
    )
    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("col1_ql", fl.EQUAL, "cat", filter_if_missing=True),
            fl.SingleColumnValueFilter("col3_ql", fl.EQUAL, "dog", filter_if_missing=True),
        ],
    )
    out = t.scan(Scan(filter=f))
    assert t.last_index_plan.uses_index, "partial AND cover must still use the index"
    assert _keys(out) == ["row8"]

    f0 = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("col1_ql", fl.EQUAL, "cat", filter_if_missing=True),
            fl.SingleColumnValueFilter("col3_ql", fl.EQUAL, "dog1", filter_if_missing=True),
        ],
    )
    out0 = t.scan(Scan(filter=f0))
    assert t.last_index_plan.uses_index
    assert out0.count() == 0


def test_multi_idx_same_family_different_qualifiers(spark):
    """TestIndexRegionObserverForScan.java:559
    (testScanMultipleIdxWithSameColFamilyAndDifferentQualifierShouldBeSuccessful):
    one index over two qualifiers of the SAME family; AND of equality on
    both uses it as an equals-prefix pair."""
    rows = [("row1", "cat", "dog"), ("row2", "dog", "cat"), ("row3", "cat", "dog")]
    t = Table(spark.createDataFrame(rows, ["rowkey", "col1_ql", "col1_q2"]), "rowkey", "samefam")
    t.create_index(
        IndexSpecification("ScanMulIndex")
        .add_column("col1_ql", "String", 10)
        .add_column("col1_q2", "String", 10)
    )
    f = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("col1_ql", fl.EQUAL, "cat", filter_if_missing=True),
            fl.SingleColumnValueFilter("col1_q2", fl.EQUAL, "dog", filter_if_missing=True),
        ],
    )
    out = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["ScanMulIndex"]
    assert _keys(out) == ["row1", "row3"]
