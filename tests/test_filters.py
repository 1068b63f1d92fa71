"""Filter algebra golden tests (SURVEY §2.3)."""

from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.table import CellTable, Scan, Table


def _part(spark, sf_dir):
    return Table.from_parquet(spark, f"{sf_dir}/part.parquet", "p_partkey", "part")


def test_row_filter_and_prefix(spark, sf_dir):
    t = _part(spark, sf_dir)
    out = t.scan(Scan(filter=fl.RowFilter(fl.LESS, 10)))
    assert out.count() == 10
    t2 = Table(
        t.df.withColumn("p_partkey_s", F.format_string("p%04d", "p_partkey")),
        "p_partkey_s",
    )
    assert t2.scan(Scan(filter=fl.PrefixFilter("p000"))).count() == 10


def test_scvf_missing_semantics(spark):
    df = spark.createDataFrame(
        [("r1", 5), ("r2", None), ("r3", 50)], ["rowkey", "v"]
    )
    t = Table(df, "rowkey")
    keep_nulls = fl.SingleColumnValueFilter("v", fl.GREATER, 10, filter_if_missing=False)
    drop_nulls = fl.SingleColumnValueFilter("v", fl.GREATER, 10, filter_if_missing=True)
    assert {r["rowkey"] for r in t.scan(Scan(filter=keep_nulls)).collect()} == {"r2", "r3"}
    assert {r["rowkey"] for r in t.scan(Scan(filter=drop_nulls)).collect()} == {"r3"}


def test_scvf_exclude_drops_column(spark, sf_dir):
    t = _part(spark, sf_dir)
    f = fl.SingleColumnValueExcludeFilter("p_size", fl.GREATER, 25, filter_if_missing=True)
    out = t.scan(Scan(filter=f))
    assert "p_size" not in out.columns
    assert out.count() == t.df.filter(F.col("p_size") > 25).count()


def test_comparators(spark, sf_dir):
    t = _part(spark, sf_dir)
    rx = fl.SingleColumnValueFilter(
        "p_type", fl.EQUAL, fl.RegexStringComparator("^ECO.*"), filter_if_missing=True
    )
    assert t.scan(Scan(filter=rx)).count() == t.df.filter(F.col("p_type").rlike("^ECO.*")).count()
    sub = fl.SingleColumnValueFilter(
        "p_name", fl.EQUAL, fl.SubstringComparator("WIDGET"), filter_if_missing=True
    )
    assert t.scan(Scan(filter=sub)).count() == t.df.filter(
        F.lower(F.col("p_name")).contains("widget")
    ).count()
    pfx = fl.SingleColumnValueFilter(
        "p_brand", fl.EQUAL, fl.BinaryPrefixComparator("Brand#1"), filter_if_missing=True
    )
    assert t.scan(Scan(filter=pfx)).count() == t.df.filter(
        F.col("p_brand").startswith("Brand#1")
    ).count()
    nul = fl.SingleColumnValueFilter("p_name", fl.NOT_EQUAL, fl.NullComparator())
    assert t.scan(Scan(filter=nul)).count() == t.df.filter(F.col("p_name").isNotNull()).count()
    bit = fl.SingleColumnValueFilter(
        "p_size", fl.EQUAL, fl.BitComparator(1, "and"), filter_if_missing=True
    )
    assert t.scan(Scan(filter=bit)).count() == t.df.filter(F.col("p_size") % 2 == 1).count()


def test_fuzzy_row_filter(spark, sf_dir):
    t = _part(spark, sf_dir)
    t2 = Table(
        t.df.withColumn("rk", F.format_string("p%04d", "p_partkey")), "rk"
    )
    out = t2.scan(Scan(filter=fl.FuzzyRowFilter("p0?5?")))
    keys = sorted(r["rk"] for r in out.collect())
    import re

    assert all(re.match(r"^p0.5.$", k) for k in keys) and keys
    # prefix range conjunct must not drop legit matches at the range
    # edges, and patterns with no fixed prefix / no wildcards still work
    rows = spark.createDataFrame(
        [("p0a5x",), ("p015z",), ("p0z5a",), ("q0151",), ("p1a5b",), ("p015",)],
        "rk string",
    )
    t3 = Table(rows, "rk")
    got = sorted(
        r["rk"] for r in t3.scan(Scan(filter=fl.FuzzyRowFilter("p0?5?"))).collect()
    )
    assert got == ["p015z", "p0a5x", "p0z5a"]
    assert t3.scan(Scan(filter=fl.FuzzyRowFilter("?015z"))).count() == 1  # no prefix
    assert t3.scan(Scan(filter=fl.FuzzyRowFilter("q0151"))).count() == 1  # no wildcard
    # non-string rowkey: regex-only path, no crash
    t4 = Table(t.df, "p_partkey")
    assert t4.scan(Scan(filter=fl.FuzzyRowFilter("1?"))).count() == t.df.filter(
        F.col("p_partkey").cast("string").rlike("^1.$")
    ).count()


def test_page_filter_and_while_match(spark, sf_dir):
    t = _part(spark, sf_dir)
    assert t.scan(Scan(filter=fl.PageFilter(7))).count() == 7
    # WhileMatch: stop at first p_partkey >= 5 in key order
    wm = fl.WhileMatchFilter(fl.RowFilter(fl.LESS, 5))
    out = t.scan(Scan(filter=wm))
    assert sorted(r["p_partkey"] for r in out.collect()) == [0, 1, 2, 3, 4]


def test_while_match_stops_at_first_failure_not_predicate(spark):
    # rows matching pred after a gap must NOT appear (unlike plain filter)
    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 0), ("d", 1)], ["rowkey", "ok"]
    )
    t = Table(df, "rowkey")
    wm = fl.WhileMatchFilter(fl.SingleColumnValueFilter("ok", fl.EQUAL, 1, filter_if_missing=True))
    assert sorted(r["rowkey"] for r in t.scan(Scan(filter=wm)).collect()) == ["a", "b"]


def test_key_only_and_first_key_only(spark, sf_dir):
    t = _part(spark, sf_dir)
    ko = t.scan(Scan(filter=fl.KeyOnlyFilter()))
    assert ko.columns == ["p_partkey"]
    fko = t.scan(Scan(filter=fl.FirstKeyOnlyFilter()))
    assert fko.count() == t.df.count()


def test_timestamps_and_random(spark, sf_dir):
    ev = Table.from_parquet(spark, f"{sf_dir}/events.parquet", "event_id", "events")
    tsf = fl.TimestampsFilter([1, 2, 3], ts_column="user_id")
    assert ev.scan(Scan(filter=tsf)).count() == ev.df.filter(
        F.col("user_id").isin(1, 2, 3)
    ).count()
    n = ev.scan(Scan(filter=fl.RandomRowFilter(0.3, seed=7))).count()
    assert 0 < n < ev.df.count()


def test_filter_list_nested(spark, sf_dir):
    t = _part(spark, sf_dir)
    f = fl.FilterList(
        "OR",
        [
            fl.FilterList(
                "AND",
                [
                    fl.SingleColumnValueFilter("p_size", fl.GREATER, 40, filter_if_missing=True),
                    fl.SingleColumnValueFilter(
                        "p_type", fl.EQUAL, "ECONOMY", filter_if_missing=True
                    ),
                ],
            ),
            fl.SingleColumnValueFilter("p_retailprice", fl.LESS, 905.0, filter_if_missing=True),
        ],
    )
    expect = t.df.filter(
        ((F.col("p_size") > 40) & (F.col("p_type") == "ECONOMY"))
        | (F.col("p_retailprice") < 905.0)
    ).count()
    assert t.scan(Scan(filter=f)).count() == expect


def test_cell_layer_filters(spark):
    ct = CellTable(spark).put_cells(
        [
            ("r1", "cf1", "qa", 1, "1"),
            ("r1", "cf1", "qb", 1, "2"),
            ("r1", "cf1", "qc", 2, "3"),
            ("r1", "cf2", "zz", 2, "4"),
            ("r2", "cf1", "qa", 1, "5"),
        ]
    )
    cells = ct.read(max_versions=10)
    qf = fl.QualifierFilter(fl.GREATER_OR_EQUAL, "qb")
    assert qf.apply(cells, None).count() == 3  # qb qc zz
    cp = fl.ColumnPrefixFilter("q")
    assert cp.apply(cells, None).count() == 4
    mp = fl.MultipleColumnPrefixFilter(["qa", "zz"])
    assert mp.apply(cells, None).count() == 3
    cr = fl.ColumnRangeFilter("qa", True, "qc", False)
    assert cr.apply(cells, None).count() == 3  # qa qb for r1 + qa r2
    fam = fl.FamilyFilter(fl.EQUAL, "cf2")
    assert fam.apply(cells, None).count() == 1
    pag = fl.ColumnPaginationFilter(limit=2, offset=1)
    got = {(r["rowkey"], r["qualifier"]) for r in pag.apply(cells, None).collect()}
    assert got == {("r1", "qb"), ("r1", "qc")}
    cc = fl.ColumnCountGetFilter(1)
    got = {(r["rowkey"], r["qualifier"]) for r in cc.apply(cells, None).collect()}
    assert got == {("r1", "qa"), ("r2", "qa")}
    vf = fl.ValueFilter(fl.GREATER_OR_EQUAL, "4")
    assert vf.apply(cells, None).count() == 2


def test_dependent_column_filter(spark):
    ct = CellTable(spark).put_cells(
        [
            ("r1", "cf1", "ref", 5, "x"),
            ("r1", "cf1", "a", 5, "same-ts"),
            ("r1", "cf1", "b", 6, "other-ts"),
            ("r2", "cf1", "a", 5, "no-ref-row"),
        ]
    )
    cells = ct.read(max_versions=10)
    dep = fl.DependentColumnFilter("cf1", "ref")
    got = {(r["rowkey"], r["qualifier"]) for r in dep.apply(cells, None).collect()}
    assert got == {("r1", "ref"), ("r1", "a")}
    dep2 = fl.DependentColumnFilter("cf1", "ref", drop_dependent_column=True)
    got2 = {(r["rowkey"], r["qualifier"]) for r in dep2.apply(cells, None).collect()}
    assert got2 == {("r1", "a")}


def test_inclusive_stop_and_reversed(spark, sf_dir):
    t = _part(spark, sf_dir)
    out = t.scan(Scan(filter=fl.InclusiveStopFilter(5)))
    assert out.count() == 6
    rev = t.scan(Scan(reversed=True, limit=3))
    assert [r["p_partkey"] for r in rev.collect()] == [199, 198, 197]


def test_first_key_value_matching_qualifiers(spark):
    from hindex_spark.filters import FirstKeyValueMatchingQualifiersFilter
    from hindex_spark.table import Table

    # wide layer: rows where ANY named column is non-null
    df = spark.createDataFrame(
        [("r1", "a", None), ("r2", None, None), ("r3", None, "c")],
        ["rowkey", "q1", "q2"],
    )
    t = Table(df, "rowkey")
    f = FirstKeyValueMatchingQualifiersFilter(["q1", "q2"])
    got = sorted(r["rowkey"] for r in f.apply(df, t).collect())
    assert got == ["r1", "r3"]
    # unknown qualifiers -> no rows (never a crash)
    assert FirstKeyValueMatchingQualifiersFilter(["zz"]).apply(df, t).count() == 0
    # cell layer: distinct rowkeys owning a matching qualifier
    cells = spark.createDataFrame(
        [("r1", "f", "click", 1, "put", "v"), ("r2", "f", "view", 1, "put", "v")],
        ["rowkey", "cf", "qualifier", "ts", "type", "value"],
    )
    got = [r["rowkey"] for r in FirstKeyValueMatchingQualifiersFilter(["click"]).apply(cells, None).collect()]
    assert got == ["r1"]


def test_first_key_matching_qualifiers_predicate_in_filterlist(spark):
    # predicate() path (inside an OR list) must tolerate unknown
    # qualifiers exactly like apply(): absent column = no match, no crash
    from hindex_spark import filters as fl
    from hindex_spark.table import Scan, Table

    df = spark.createDataFrame([("r1", 5), ("r2", None)], "rowkey string, v int")
    t = Table(df, "rowkey")
    f = fl.FilterList(
        "OR",
        [
            fl.FirstKeyValueMatchingQualifiersFilter(["zz", "v"]),
            fl.SingleColumnValueFilter("v", fl.EQUAL, -1, filter_if_missing=True),
        ],
    )
    got = sorted(r["rowkey"] for r in t.scan(Scan(filter=f)).collect())
    assert got == ["r1"]


def test_long_and_bit_comparators_tolerate_unparseable_values(spark):
    # ANSI mode (Spark 4 default) aborts the job on a bad string->long
    # cast; a scan with Long/BitComparator over a dirty column must
    # exclude the bad row, not crash (the reference compares raw bytes
    # and never errors).
    from hindex_spark.table import Table, Scan

    df = spark.createDataFrame(
        [("r1", "5"), ("r2", "abc"), ("r3", "15")], ["rowkey", "v"]
    )
    t = Table(df, "rowkey")
    f = fl.SingleColumnValueFilter(
        "v", fl.GREATER, fl.LongComparator(4), filter_if_missing=True
    )
    assert [r["rowkey"] for r in t.scan(Scan(filter=f)).collect()] == ["r1", "r3"]
    fb = fl.SingleColumnValueFilter(
        "v", fl.EQUAL, fl.BitComparator(0xFF, "and"), filter_if_missing=True
    )
    assert [r["rowkey"] for r in t.scan(Scan(filter=fb)).collect()] == ["r1", "r3"]


def test_filter_list_or_with_page_filter_evaluates(spark):
    """TestFilterList.testOrdering port: MUST_PASS_ONE(match-filter,
    PageFilter) — rows matching the sibling keep passing even after the
    page branch is exhausted, and the page branch admits exactly the
    first N rows of the scan (rowkey order — the deterministic model of
    the reference's scan-order row count)."""
    from hindex_spark.table import Scan, Table

    df = spark.createDataFrame(
        [("r1", 1), ("r2", 2), ("r3", 3), ("r4", 2)], ["rowkey", "v"]
    )
    t = Table(df, "rowkey", "ortab")
    f = fl.FilterList(
        "OR",
        [
            fl.PageFilter(1),
            fl.SingleColumnValueFilter("v", fl.EQUAL, 2, filter_if_missing=True),
        ],
    )
    got = {r["rowkey"] for r in t.scan(Scan(filter=f)).collect()}
    # page branch: first 1 row of the scan (r1); sibling adds v==2 rows
    assert got == {"r1", "r2", "r4"}
    # AND composition still works (sequential apply)
    f_and = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("v", fl.GREATER, 0, filter_if_missing=True),
            fl.PageFilter(2),
        ],
    )
    and_got = {r["rowkey"] for r in t.scan(Scan(filter=f_and)).collect()}
    assert and_got == {"r1", "r2"}  # first 2 rows in scan order


def test_filter_list_or_refuses_unknown_apply_override(spark):
    """_row_faithful is DEFAULT-CLOSED: a filter subclass overriding
    apply() with hidden truncation behavior that is NOT on the
    projection allowlist must get the loud MUST_PASS_ONE refusal — the
    old blocklist silently over-selected (its predicate is lit(True),
    so the OR union returned every row)."""
    import pytest

    from hindex_spark.table import Scan, Table

    class EveryOtherRowFilter(fl.Filter):
        # pathological third-party filter: keeps alternate rows —
        # positional semantics no predicate can express
        def predicate(self, table):
            return F.lit(True)

        def apply(self, df, table):
            from pyspark.sql import Window

            w = Window.orderBy("rowkey")
            return (
                df.withColumn("__n", F.row_number().over(w))
                .filter(F.col("__n") % 2 == 1)
                .drop("__n")
            )

    df = spark.createDataFrame([("r1", 1), ("r2", 2)], ["rowkey", "v"])
    t = Table(df, "rowkey", "dc")
    f = fl.FilterList(
        "OR",
        [
            EveryOtherRowFilter(),
            fl.SingleColumnValueFilter("v", fl.EQUAL, 2, filter_if_missing=True),
        ],
    )
    with pytest.raises(NotImplementedError, match="MUST_PASS_ONE"):
        t.scan(Scan(filter=f)).count()
    # allowlisted projection overrides still union fine
    f_ok = fl.FilterList(
        "OR",
        [
            fl.RandomRowFilter(1.0),
            fl.SingleColumnValueFilter("v", fl.EQUAL, 2, filter_if_missing=True),
        ],
    )
    assert t.scan(Scan(filter=f_ok)).count() == 2


def _cells_or_fixture(spark):
    return CellTable(spark).put_cells(
        [
            ("r1", "cf1", "qa", 5, "1"),
            ("r1", "cf1", "qb", 5, "9"),
            ("r1", "cf1", "qc", 6, "3"),
            ("r1", "cf1", "qd", 5, "8"),
            ("r2", "cf1", "qa", 7, "2"),
            ("r2", "cf1", "qb", 5, "9"),
        ]
    ).read(max_versions=10)


def test_filter_list_or_with_column_pagination(spark):
    """MUST_PASS_ONE with a positional member now EVALUATES instead of
    refusing (FilterList.java:178-200: every OR member sees every cell
    and keeps its own state). Kept-set = union of each member applied
    alone over the full stream."""
    cells = _cells_or_fixture(spark)
    f = fl.FilterList(
        "OR",
        [
            fl.ColumnPaginationFilter(limit=2, offset=1),
            fl.ValueFilter(fl.GREATER_OR_EQUAL, "9"),
        ],
    )
    got = {(r["rowkey"], r["qualifier"]) for r in f.apply(cells, None).collect()}
    pag = {
        (r["rowkey"], r["qualifier"])
        for r in fl.ColumnPaginationFilter(limit=2, offset=1).apply(cells, None).collect()
    }
    val = {
        (r["rowkey"], r["qualifier"])
        for r in fl.ValueFilter(fl.GREATER_OR_EQUAL, "9").apply(cells, None).collect()
    }
    assert got == pag | val
    # and schema is unchanged (helper columns dropped)
    assert f.apply(cells, None).columns == cells.columns


def test_filter_list_or_with_column_count_get(spark):
    cells = _cells_or_fixture(spark)
    f = fl.FilterList(
        "OR",
        [fl.ColumnCountGetFilter(1), fl.ValueFilter(fl.EQUAL, "3")],
    )
    got = {(r["rowkey"], r["qualifier"]) for r in f.apply(cells, None).collect()}
    assert got == {("r1", "qa"), ("r2", "qa"), ("r1", "qc")}


def test_filter_list_or_with_dependent_column(spark):
    """DependentColumnFilter under OR: branch = cells whose ts matches
    the reference column's ts (DependentColumnFilter.java:51), unioned
    with the sibling branch."""
    cells = _cells_or_fixture(spark)
    f = fl.FilterList(
        "OR",
        [
            fl.DependentColumnFilter("cf1", "qc"),
            fl.ValueFilter(fl.EQUAL, "2"),
        ],
    )
    got = {(r["rowkey"], r["qualifier"]) for r in f.apply(cells, None).collect()}
    dep = {
        (r["rowkey"], r["qualifier"])
        for r in fl.DependentColumnFilter("cf1", "qc").apply(cells, None).collect()
    }
    assert got == dep | {("r2", "qa")}


def test_filter_list_or_with_while_match(spark):
    """WhileMatch under OR: branch = take-while prefix in rowkey order,
    unioned with the sibling predicate branch."""
    df = spark.createDataFrame(
        [("r1", 1), ("r2", 2), ("r3", 30), ("r4", 4)], ["rowkey", "v"]
    )
    t = Table(df, "rowkey", "orwm")
    f = fl.FilterList(
        "OR",
        [
            fl.WhileMatchFilter(
                fl.SingleColumnValueFilter("v", fl.LESS, 10, filter_if_missing=True)
            ),
            fl.SingleColumnValueFilter("v", fl.EQUAL, 4, filter_if_missing=True),
        ],
    )
    got = {r["rowkey"] for r in f.apply(t.df, t).collect()}
    # while-match keeps r1, r2 (stops at r3); the OR branch adds r4
    assert got == {"r1", "r2", "r4"}


def test_filter_list_or_nested_and_with_pagination(spark):
    """Nested MUST_PASS_ALL branch containing a positional member under
    OR: the pagination counts only cells that survived its predecessors
    in the AND chain (FilterListWithAND short-circuit — a rejected cell
    is never seen by later members)."""
    cells = _cells_or_fixture(spark)
    inner = fl.FilterList(
        "AND",
        [
            fl.ValueFilter(fl.NOT_EQUAL, "9"),
            fl.ColumnCountGetFilter(1),
        ],
    )
    f = fl.FilterList("OR", [inner, fl.ValueFilter(fl.EQUAL, "8")])
    got = {(r["rowkey"], r["qualifier"]) for r in f.apply(cells, None).collect()}
    # AND branch: first non-"9" cell per row -> (r1,qa), (r2,qa);
    # OR sibling adds value=="8" -> (r1,qd)
    assert got == {("r1", "qa"), ("r2", "qa"), ("r1", "qd")}


def test_filter_list_or_page_filter_on_cells(spark):
    """PageFilter under MUST_PASS_ONE on the CELL layer: the page branch
    counts ROWS (distinct rowkeys, all their cells), not cells —
    PageFilter.java counts at filterRowKey granularity."""
    cells = _cells_or_fixture(spark)
    f = fl.FilterList("OR", [fl.PageFilter(1), fl.ValueFilter(fl.EQUAL, "2")])
    got = {(r["rowkey"], r["qualifier"]) for r in f.apply(cells, None).collect()}
    # first 1 row in scan order = ALL of r1's cells; sibling adds value=='2'
    assert got == {("r1", "qa"), ("r1", "qb"), ("r1", "qc"), ("r1", "qd"), ("r2", "qa")}


def test_reversed_scan_reference_range_convention(spark):
    """Scan.java:578-595: a reversed scan's startRow is the HIGH end
    (inclusive) and stopRow the LOW end (exclusive). A reference-ported
    Scan(reversed, start=high, stop=low) must select that range, not
    zero rows; start <= stop keeps this engine's low/high convention."""
    from hindex_spark.table import Scan, Table

    df = spark.createDataFrame([("r%02d" % i, i) for i in range(10)], ["rowkey", "v"])
    t = Table(df, "rowkey")
    got = [r["rowkey"] for r in t.scan(Scan(start_row="r07", stop_row="r03", reversed=True)).collect()]
    assert got == ["r07", "r06", "r05", "r04"]  # high..low, stop exclusive
    got_inc = [
        r["rowkey"]
        for r in t.scan(
            Scan(start_row="r07", stop_row="r03", stop_inclusive=True, reversed=True)
        ).collect()
    ]
    assert got_inc == ["r07", "r06", "r05", "r04", "r03"]
    # engine convention unchanged: low/high + reversed output order
    got_fwd = [r["rowkey"] for r in t.scan(Scan(start_row="r03", stop_row="r07", reversed=True)).collect()]
    assert got_fwd == ["r06", "r05", "r04", "r03"]
    # SINGLE-BOUND reversed scans are shape-ambiguous: by default the
    # engine's convention wins (lone start_row = LOW bound), and
    # reference_range=True opts into startRow-as-high explicitly
    lone_default = [
        r["rowkey"] for r in t.scan(Scan(start_row="r07", reversed=True)).collect()
    ]
    assert lone_default == ["r09", "r08", "r07"]  # rk >= r07, reversed order
    lone_ref = [
        r["rowkey"]
        for r in t.scan(Scan(start_row="r07", reversed=True, reference_range=True)).collect()
    ]
    assert lone_ref == ["r07", "r06", "r05", "r04", "r03", "r02", "r01", "r00"]
    lone_stop_ref = [
        r["rowkey"]
        for r in t.scan(Scan(stop_row="r07", reversed=True, reference_range=True)).collect()
    ]
    assert lone_stop_ref == ["r09", "r08"]  # stopRow = LOW end, exclusive
    import pytest

    with pytest.raises(ValueError, match="reference_range"):
        t.scan(Scan(start_row="r07", reference_range=True))  # needs reversed


def test_reversed_scan_direction_sensitive_filters(spark):
    """Reversed scans evaluate WhileMatch / InclusiveStop / PageFilter
    against rows in SCAN order (top key downward) — the reference's
    filters see the reversed stream."""
    from hindex_spark.table import Scan, Table

    df = spark.createDataFrame(
        [("r%02d" % i, i) for i in range(10)], ["rowkey", "v"]
    )
    t = Table(df, "rowkey")

    # take-while from the top: v >= 7 holds for r09, r08, r07; fails at r06
    wm = fl.WhileMatchFilter(
        fl.SingleColumnValueFilter("v", fl.GREATER_OR_EQUAL, 7, filter_if_missing=True)
    )
    got = [r["rowkey"] for r in t.scan(Scan(filter=wm, reversed=True)).collect()]
    assert got == ["r09", "r08", "r07"]
    # the caller's tree is untouched (forward semantics preserved)
    assert wm.reverse is False
    fwd = [r["rowkey"] for r in t.scan(Scan(filter=wm)).collect()]
    assert fwd == []  # v>=7 fails at r00 immediately in forward order

    # reversed InclusiveStop: walk down, stop at r06 inclusive
    st = fl.InclusiveStopFilter("r06")
    got = [r["rowkey"] for r in t.scan(Scan(filter=st, reversed=True)).collect()]
    assert got == ["r09", "r08", "r07", "r06"]

    # reversed PageFilter: the first 3 rows of a reversed scan are the
    # 3 highest keys
    pg = fl.PageFilter(3)
    got = [r["rowkey"] for r in t.scan(Scan(filter=pg, reversed=True)).collect()]
    assert got == ["r09", "r08", "r07"]


def test_get_with_filter(spark, sf_dir):
    """Get.setFilter (Get.java:207): the filter evaluates against the
    fetched row — a non-matching Get returns empty, a matching one the
    row; apply()-overriding filters (projection) compose too."""
    t = _part(spark, sf_dir)
    f_match = fl.SingleColumnValueFilter("p_size", fl.GREATER, -1, filter_if_missing=True)
    f_miss = fl.SingleColumnValueFilter("p_size", fl.LESS, -1, filter_if_missing=True)
    assert t.get(10, filter=f_match).count() == 1
    assert t.get(10, filter=f_miss).count() == 0
    out = t.get(10, columns=["p_size"], filter=fl.SingleColumnValueExcludeFilter(
        "p_size", fl.GREATER, -1, filter_if_missing=True))
    assert out.columns == ["p_partkey"]  # excluded column dropped, like scan
