"""ETL jobs + ParseFilter DSL tests."""

import os

import pytest

from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.etl import jobs
from hindex_spark.index.spec import IndexSpecification
from hindex_spark.parse_filter import parse_filter
from hindex_spark.table import Scan, Table


def test_import_tsv_roundtrip(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    tsv = str(tmp_path / "orders_tsv")
    orders.write.option("sep", "\t").mode("overwrite").csv(tsv)
    got = jobs.import_tsv(
        spark,
        tsv,
        ["o_orderkey", "o_custkey", "o_orderstatus"],
        "o_orderkey",
        schema="o_orderkey long, o_custkey long, o_orderstatus string",
    )
    assert got.count() == orders.count()
    assert got.schema["o_orderkey"].dataType.simpleString() == "bigint"


def test_import_tsv_with_index(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    tsv = str(tmp_path / "oi_tsv")
    orders.write.option("sep", "\t").mode("overwrite").csv(tsv)
    table, idx = jobs.import_tsv_with_index(
        spark,
        tsv,
        ["o_orderkey", "o_custkey"],
        "o_orderkey",
        [IndexSpecification("idx_cust").add_column("o_custkey", "Long")],
        schema="o_orderkey long, o_custkey long",
    )
    assert idx["idx_cust"].count() == table.count()


def test_export_import_copy(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/part.parquet")
    dump = str(tmp_path / "dump")
    jobs.export_table(df, dump)
    back = jobs.import_table(spark, dump)
    assert back.count() == df.count()
    copied = jobs.copy_table(
        df, "p_partkey", start_row=10, stop_row=50, predicate=F.col("p_size") > 20
    )
    assert copied.count() == df.filter(
        (F.col("p_partkey") >= 10) & (F.col("p_partkey") < 50) & (F.col("p_size") > 20)
    ).count()


def test_import_json_and_orc(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    jpath, opath = str(tmp_path / "j"), str(tmp_path / "o")
    df.write.json(jpath)
    back_j = jobs.import_json(spark, jpath, "r_regionkey long, r_name string", "r_regionkey")
    assert sorted(r["r_name"] for r in back_j.collect()) == sorted(
        r["r_name"] for r in df.collect()
    )
    jobs.export_orc(df, opath)
    assert jobs.import_orc(spark, opath, "r_regionkey").count() == df.count()


def test_counters(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/part.parquet")
    assert jobs.row_counter(df, "p_partkey").collect()[0]["row_count"] == df.count()
    cc = jobs.cell_counter(df, "p_partkey").collect()[0]
    assert cc["cells_p_name"] == df.filter(F.col("p_name").isNotNull()).count()


def test_bulk_load_appends(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    table_dir = str(tmp_path / "table")
    prep_dir = str(tmp_path / "prep")
    df.write.parquet(table_dir)
    df.write.parquet(prep_dir)
    jobs.bulk_load(spark, prep_dir, table_dir)
    assert spark.read.parquet(table_dir).count() == 2 * df.count()


# --- ParseFilter DSL ---------------------------------------------------------


def test_dsl_scvf_and_page(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey")
    f = parse_filter("SingleColumnValueFilter('o_custkey', =, 'binary:85', 1) AND PageFilter(3)")
    out = t.scan(Scan(filter=f))
    rows = out.collect()
    assert len(rows) <= 3 and all(r["o_custkey"] == 85 for r in rows)


def test_dsl_or_precedence(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/part.parquet", "p_partkey")
    f = parse_filter(
        "SingleColumnValueFilter('p_size', >, 'binary:45', 1) OR "
        "SingleColumnValueFilter('p_size', <, 'binary:3', 1) AND "
        "SingleColumnValueFilter('p_type', =, 'binary:ECONOMY', 1)"
    )
    expect = t.df.filter(
        (F.col("p_size") > 45) | ((F.col("p_size") < 3) & (F.col("p_type") == "ECONOMY"))
    ).count()
    assert t.scan(Scan(filter=f)).count() == expect


def test_dsl_while_and_parens(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/part.parquet", "p_partkey")
    f = parse_filter("WHILE RowFilter(<, 'binary:7')")
    assert t.scan(Scan(filter=f)).count() == 7
    f2 = parse_filter(
        "(SingleColumnValueFilter('p_size', >, 'binary:45', 1) OR "
        "SingleColumnValueFilter('p_size', <, 'binary:3', 1)) AND "
        "SingleColumnValueFilter('p_type', =, 'binary:ECONOMY', 1)"
    )
    expect = t.df.filter(
        ((F.col("p_size") > 45) | (F.col("p_size") < 3)) & (F.col("p_type") == "ECONOMY")
    ).count()
    assert t.scan(Scan(filter=f2)).count() == expect


def test_dsl_comparators_and_skip(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/part.parquet", "p_partkey")
    f = parse_filter("SingleColumnValueFilter('p_type', =, 'regexstring:^ECO', 1)")
    assert t.scan(Scan(filter=f)).count() == t.df.filter(F.col("p_type").rlike("^ECO")).count()
    f2 = parse_filter("SKIP SingleColumnValueFilter('p_name', =, 'substring:widget', 1)")
    assert (
        t.scan(Scan(filter=f2)).count()
        == t.df.filter(F.lower(F.col("p_name")).contains("widget")).count()
    )
    f3 = parse_filter("SingleColumnValueFilter('p_brand', =, 'binaryprefix:Brand#1', 1)")
    assert (
        t.scan(Scan(filter=f3)).count()
        == t.df.filter(F.col("p_brand").startswith("Brand#1")).count()
    )


def test_dsl_index_integration(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey")
    t.create_index(IndexSpecification("idx_cust").add_column("o_custkey", "Long"))
    f = parse_filter("SingleColumnValueFilter('o_custkey', =, 'binary:85', 1)")
    out = t.scan(Scan(filter=f))
    assert t.last_index_plan.used_indexes == ["idx_cust"]
    assert out.count() == t.df.filter(F.col("o_custkey") == 85).count()


def test_verify_replication_counters_and_detail(spark, sf_dir):
    """VerifyReplication.java:80-133 analog: GOODROWS/BADROWS counters
    plus the per-cause breakdown and detail rows; null-vs-empty values
    must digest differently; xxhash64 production digest agrees."""
    src = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    n = src.count()
    peer = src.filter(F.col("n_nationkey") != 3).withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 7, F.lit(None).cast("string")).otherwise(
            F.col("n_name")
        ),
    )
    for fn in ("md5", "xxhash64"):
        c = jobs.verify_replication(src, peer, "n_nationkey", hash_fn=fn).collect()[0]
        assert c["goodrows"] == n - 2 and c["badrows"] == 2, c
        assert c["only_in_source"] == 1 and c["only_in_peer"] == 0
        assert c["content_different"] == 1
    det = {
        r["n_nationkey"]: r["status"]
        for r in jobs.verify_replication(src, peer, "n_nationkey", detail=True).collect()
    }
    assert det == {3: "ONLY_IN_SOURCE", 7: "CONTENT_DIFFERENT"}
    # column-scoped compare (the --families analog) ignores the tamper
    scoped = jobs.verify_replication(
        src, peer, "n_nationkey", columns=["n_regionkey"]
    ).collect()[0]
    assert scoped["content_different"] == 0 and scoped["only_in_source"] == 1
    # null value != empty string under the digest
    a = spark.createDataFrame([(1, "")], "k long, v string")
    b = spark.createDataFrame([(1, None)], "k long, v string")
    assert jobs.verify_replication(a, b, "k").collect()[0]["content_different"] == 1


def test_compact_table_files(spark, sf_dir, tmp_path):
    """Store.compact analog: many tiny appended files -> few sorted
    files, content-preserving, atomic swap leaves no staging dir."""
    import os

    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    table_dir = str(tmp_path / "t")
    src.write.parquet(table_dir)
    for _ in range(6):
        src.write.mode("append").parquet(table_dir)
    # materialize the pre-compaction content: lazy plans over the old
    # file listing are invalid after the swap (readers re-list, as the
    # docstring says — old listing or new, never a mix)
    before_rows = sorted(map(tuple, spark.read.parquet(table_dir).collect()))
    n_before = len([f for f in os.listdir(table_dir) if f.endswith(".parquet")])
    jobs.compact_table_files(spark, table_dir, "r_regionkey")
    after = spark.read.parquet(table_dir)
    n_after = len([f for f in os.listdir(table_dir) if f.endswith(".parquet")])
    assert n_after < n_before
    assert after.count() == 7 * src.count()
    assert sorted(map(tuple, after.collect())) == before_rows
    assert not os.path.exists(table_dir + ".compact_staging")
    assert not os.path.exists(table_dir + ".old")


def test_import_tsv_bad_lines_modes(spark, tmp_path):
    # importtsv.skip.bad.lines analog (ImportTsv.java:87): 'skip' drops
    # the malformed line, 'permissive' keeps it with NULLed bad fields,
    # 'fail' aborts the job.
    import pytest

    p = str(tmp_path / "in.tsv")
    with open(p, "w") as fh:
        fh.write("r1\t10\nr2\tnot_a_number\nr3\t30\n")
    schema = "k string, v int"

    ok = jobs.import_tsv(spark, p, ["k", "v"], "k", schema=schema, bad_lines="skip")
    assert sorted((r["k"], r["v"]) for r in ok.collect()) == [("r1", 10), ("r3", 30)]

    perm = jobs.import_tsv(spark, p, ["k", "v"], "k", schema=schema)
    rows = {r["k"]: r["v"] for r in perm.collect()}
    assert rows == {"r1": 10, "r2": None, "r3": 30}

    with pytest.raises(Exception):
        jobs.import_tsv(
            spark, p, ["k", "v"], "k", schema=schema, bad_lines="fail"
        ).collect()
    with pytest.raises(ValueError, match="requires an explicit schema"):
        jobs.import_tsv(spark, p, ["k", "v"], "k", bad_lines="skip")


def test_import_tsv_cells_with_ts_key(spark, tmp_path):
    # TsvParser spec syntax (TestIndexImportTsv testTsvParser*): a
    # HBASE_TS_KEY field becomes the cell timestamp of every cell on
    # its line; bad lines (no rowkey / unparseable ts) drop under
    # 'skip'; a missing value field emits no cell.
    p = str(tmp_path / "cells.tsv")
    with open(p, "w") as fh:
        fh.write("r1\t100\talice\t7\n")       # full line
        fh.write("r2\t200\tbob\t\n")          # missing d:n cell
        fh.write("\t300\teve\t1\n")           # no rowkey -> bad
        fh.write("r4\tnot_ts\tmallory\t2\n")  # bad timestamp -> bad
    cells = jobs.import_tsv_cells(
        spark, p, ["HBASE_ROW_KEY", "HBASE_TS_KEY", "d:name", "d:n"]
    )
    got = sorted(
        (r["rowkey"], r["cf"], r["qualifier"], r["ts"], r["value"])
        for r in cells.collect()
    )
    assert got == [
        ("r1", "d", "n", 100, "7"),
        ("r1", "d", "name", 100, "alice"),
        ("r2", "d", "name", 200, "bob"),
    ]
    # permissive keeps the bad-ts line with ts NULL for triage
    perm = jobs.import_tsv_cells(
        spark, p, ["HBASE_ROW_KEY", "HBASE_TS_KEY", "d:name", "d:n"],
        bad_lines="permissive",
    )
    assert perm.filter(F.col("ts").isNull()).count() == 2  # mallory line, 2 cells
    # versioned semantics end to end: two imports of the same rowkey at
    # different ts resolve latest-wins through the cell layer
    from hindex_spark.cells import resolve

    p2 = str(tmp_path / "v2.tsv")
    with open(p2, "w") as fh:
        fh.write("r1\t150\talice2\t9\n")
    both = cells.unionByName(
        jobs.import_tsv_cells(spark, p2, ["HBASE_ROW_KEY", "HBASE_TS_KEY", "d:name", "d:n"])
    )
    latest = resolve(both, max_versions=1)
    name = [r["value"] for r in latest.filter(
        (F.col("rowkey") == "r1") & (F.col("qualifier") == "name")).collect()]
    assert name == ["alice2"]


def test_import_tsv_cells_spec_validation(spark, tmp_path):
    import pytest

    p = str(tmp_path / "x.tsv")
    open(p, "w").write("a\tb\n")
    with pytest.raises(ValueError, match="HBASE_ROW_KEY exactly once"):
        jobs.import_tsv_cells(spark, p, ["d:a", "d:b"])
    with pytest.raises(ValueError, match="cf:qualifier"):
        jobs.import_tsv_cells(spark, p, ["HBASE_ROW_KEY", "noseparator"])


def test_export_cells_versions_timerange_raw(spark, tmp_path):
    # Export.java:75-100 semantics on the cell layer: version-limited and
    # time-ranged dumps, and raw=True shipping the full edit stream
    # (tombstones included, nothing masked).
    from hindex_spark.cells import cells_from_rows, resolve

    cells = cells_from_rows(
        spark,
        [
            ("r1", "f", "q", 1, "put", "v1"),
            ("r1", "f", "q", 2, "put", "v2"),
            ("r1", "f", "q", 3, "put", "v3"),
            ("r2", "f", "q", 2, "put", "w2"),
            ("r2", "f", "q", 3, "delete_column", None),
        ],
    )
    p1 = str(tmp_path / "dump_v2")
    jobs.export_cells(cells, p1, versions=2)
    got = jobs.import_table(spark, p1)
    # masked: r2's put died to the tombstone; r1 keeps newest 2 versions
    assert sorted((r["rowkey"], r["ts"]) for r in got.collect()) == [("r1", 2), ("r1", 3)]

    p2 = str(tmp_path / "dump_tr")
    jobs.export_cells(cells, p2, versions=10, start_time=1, end_time=3)
    got2 = jobs.import_table(spark, p2)
    # tombstones mask regardless of the scan TimeRange (ScanQueryMatcher
    # applies markers at read time): r2's put stays dead even though the
    # delete's ts lies outside the exported range
    assert sorted((r["rowkey"], r["ts"]) for r in got2.collect()) == [
        ("r1", 1), ("r1", 2),
    ]

    p3 = str(tmp_path / "dump_raw")
    jobs.export_cells(cells, p3, versions=10, raw=True)
    got3 = jobs.import_table(spark, p3)
    ops = sorted((r["rowkey"], r["ts"], r["op"]) for r in got3.collect())
    assert ("r2", 3, "delete_column") in ops          # tombstone shipped
    assert ("r2", 2, "put") in ops                     # nothing masked
    assert len(ops) == 5
    # raw dump replays to the same visible state as the source
    src_vis = sorted(map(tuple, resolve(cells, max_versions=1).collect()))
    dump_vis = sorted(map(tuple, resolve(got3, max_versions=1).collect()))
    assert src_vis == dump_vis


def test_import_tsv_cells_no_value_fields_raises(spark, tmp_path):
    # a columns spec with only bookkeeping fields has nothing to import;
    # it must be a clear ValueError, not a malformed stack(0, ) SQL parse
    p = str(tmp_path / "novals.tsv")
    with open(p, "w") as fh:
        fh.write("r1\t100\n")
    with pytest.raises(ValueError, match="no cf:qualifier"):
        jobs.import_tsv_cells(spark, p, ["HBASE_ROW_KEY", "HBASE_TS_KEY"])


def test_diff_tables_paths_agree_and_classify(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),            # unchanged
         (2, "B", 21.0),            # two columns changed
         (3, "c", 30.0),            # null -> value counts as changed
         (5, "e", 50.0)],           # added; 4 removed
        "k long, s string, v double",
    )
    from hindex_spark.etl import jobs as j

    want = {
        (2, "changed", "s,v"),
        (3, "changed", "s"),
        (4, "removed", ""),
        (5, "added", ""),
    }
    direct = {tuple(r) for r in j.diff_tables(old, new, ["k"]).collect()}
    assert direct == want
    two = {tuple(r) for r in
           j.diff_tables(old, new, ["k"], two_pass=True).collect()}
    assert two == want
    # include_unchanged keeps key 1
    full = {tuple(r) for r in
            j.diff_tables(old, new, ["k"], include_unchanged=True).collect()}
    assert (1, "unchanged", "") in full and len(full) == 5
    # compare_cols restricts attribution (v-only: key 3 is unchanged)
    vonly = {tuple(r) for r in
             j.diff_tables(old, new, ["k"], compare_cols=["v"]).collect()}
    assert vonly == {(2, "changed", "v"), (4, "removed", ""),
                     (5, "added", "")}
    with pytest.raises(ValueError, match="missing from new"):
        j.diff_tables(old, new.drop("v"), ["k"])


def test_import_jsonl_bad_line_taxonomy(spark, tmp_path):
    import os

    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as fh:
        fh.write('{"id": 1, "text": "hello", "score": 0.5}\n')
        fh.write('{"id": 2, "text": "world"}\n')       # missing field
        fh.write('{"id": 3, "score": }\n')             # malformed JSON
        fh.write('not json at all\n')                  # not JSON
    sch = "id long, text string, score double"

    perm = jobs.import_jsonl(spark, p, sch, "id").persist()
    rows = {r["id"]: (r["text"], r["score"], r["_corrupt"] is not None)
            for r in perm.collect() if r["id"] is not None}
    # missing fields are NULL, not corrupt; damaged lines are quarantined
    assert rows == {1: ("hello", 0.5, False), 2: ("world", None, False)}
    assert perm.filter(F.col("_corrupt").isNotNull()).count() == 2

    skip = jobs.import_jsonl(spark, p, sch, "id", bad_lines="skip")
    assert "_corrupt" not in skip.columns
    assert sorted(r["id"] for r in skip.collect()) == [1, 2]

    with pytest.raises(Exception, match="(?i)malformed|corrupt|fail"):
        jobs.import_jsonl(spark, p, sch, "id", bad_lines="fail").collect()

    with pytest.raises(ValueError, match="bad_lines"):
        jobs.import_jsonl(spark, p, sch, "id", bad_lines="nope")
