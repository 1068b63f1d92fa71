"""Batch ETL jobs — the reference's MapReduce tool set re-expressed as
one-liner DataFrame jobs (each is a thin, testable wrapper so the tool
surface of the reference exists 1:1).

Reference tools (hbase-server/.../mapreduce/):
  ImportTsv.java (~700 LoC)       -> import_tsv
  Export.java / Import.java       -> export_table / import_table
  CopyTable.java                  -> copy_table
  RowCounter.java                 -> row_counter
  CellCounter.java                -> cell_counter
  LoadIncrementalHFiles.java      -> bulk_load (append parquet files)
  IndexImportTsv (secondaryindex) -> import_tsv_with_index (table +
                                     index written in one pass — the
                                     same-job atomicity of the fork)
  TableIndexer.java               -> hindex_spark.index.build.build_index

Scale: all of these inherit Spark's parallel read/write; import jobs
should repartitionByRange on the rowkey before writing so downstream
scans get sorted, range-prunable files (the HFile sort invariant).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hindex_spark.index.build import build_index
from hindex_spark.index.spec import IndexSpecification


def import_tsv(
    spark: SparkSession,
    path: str,
    columns: Sequence[str],
    rowkey_col: str,
    schema: Optional[str] = None,
    sep: str = "\t",
    num_partitions: Optional[int] = None,
    bad_lines: str = "permissive",
) -> DataFrame:
    """ImportTsv: TSV -> typed table sorted by rowkey. ``columns`` names
    the TSV fields in order (the -Dimporttsv.columns analog).

    ``bad_lines`` is the importtsv.skip.bad.lines analog
    (ImportTsv.java:87 / TsvImporterMapper's BadLine counter), mapped to
    the CSV reader's parse mode so the choice costs nothing extra:
    'permissive' (default) NULLs unparseable fields, 'skip' drops
    malformed lines (needs ``schema``), 'fail' aborts on the first one.
    """
    modes = {"permissive": "PERMISSIVE", "skip": "DROPMALFORMED", "fail": "FAILFAST"}
    if bad_lines not in modes:
        raise ValueError(f"bad_lines must be one of {sorted(modes)}: {bad_lines!r}")
    if bad_lines == "skip" and not schema:
        raise ValueError("bad_lines='skip' requires an explicit schema "
                         "(DROPMALFORMED needs typed fields to detect damage)")
    reader = spark.read.option("sep", sep).option("mode", modes[bad_lines])
    if schema:
        df = reader.schema(schema).csv(path)
    else:
        df = reader.csv(path).toDF(*columns)
    if schema:
        df = df.toDF(*columns)
    out = df
    if num_partitions:
        out = out.repartitionByRange(num_partitions, rowkey_col)
    return out.sortWithinPartitions(rowkey_col)


def import_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    rowkey_col: str,
    bad_lines: str = "permissive",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """JSON-lines ingest — the web-crawl/API-dump sibling of
    ``import_tsv`` (same bad-line taxonomy as ImportTsv.java:87's
    BadLine counter, mapped onto the JSON reader's parse modes so the
    choice costs nothing): 'permissive' (default) keeps damaged lines
    with typed fields NULL and the raw text in ``_corrupt``, 'skip'
    drops them, 'fail' aborts on the first one. An explicit ``schema``
    is REQUIRED: schema inference would scan the input twice and
    silently widen types under damage — at corpus scale the contract
    belongs to the caller.

    Output is rowkey range-sorted like every other ingest (the
    engine's HFile convention); ``_corrupt`` rides along in permissive
    mode so a quarantine pass (``WHERE _corrupt IS NOT NULL``) can
    audit damage without re-reading the source."""
    modes = {"permissive": "PERMISSIVE", "skip": "DROPMALFORMED",
             "fail": "FAILFAST"}
    if bad_lines not in modes:
        raise ValueError(
            f"bad_lines must be one of {sorted(modes)}: {bad_lines!r}"
        )
    reader = (
        spark.read.option("mode", modes[bad_lines])
        .option("columnNameOfCorruptRecord", "_corrupt")
    )
    full = schema.rstrip()
    if bad_lines == "permissive":
        full = f"{full}, _corrupt string"
    df = reader.schema(full).json(path)
    out = df
    if num_partitions:
        out = out.repartitionByRange(num_partitions, rowkey_col)
    return out.sortWithinPartitions(rowkey_col)


def import_tsv_with_index(
    spark: SparkSession,
    path: str,
    columns: Sequence[str],
    rowkey_col: str,
    indices: Sequence[IndexSpecification],
    schema: Optional[str] = None,
    sep: str = "\t",
) -> tuple[DataFrame, Dict[str, DataFrame]]:
    """IndexImportTsv: ingest that derives table AND index tables from
    one scan of the input (IndexHFileOutputFormat analog)."""
    table = import_tsv(spark, path, columns, rowkey_col, schema, sep)
    idx = {spec.name: build_index(table, spec, rowkey_col) for spec in indices}
    return table, idx


def import_tsv_cells(
    spark: SparkSession,
    path: str,
    columns: Sequence[str],
    sep: str = "\t",
    bad_lines: str = "skip",
) -> DataFrame:
    """ImportTsv into the CELL layer using the reference's
    ``-Dimporttsv.columns`` spec syntax (ImportTsv.java TsvParser):
    ``columns`` is an ordered list of TSV field roles —
    ``HBASE_ROW_KEY`` (required, exactly once), optional
    ``HBASE_TS_KEY`` (the cell timestamp; TsvParser.getTimestampKeyColumnIndex),
    and ``cf:qualifier`` names for value fields. Output is a cell
    DataFrame (rowkey, cf, qualifier, ts, op='put', value) ready for
    ``cells.resolve`` / ``CellTable`` — rows carry the SAME ts for all
    their cells, the reference's per-line timestamp semantics.

    Bad lines (TestIndexImportTsv testTsvParserBadTsvLine*): a line with
    no rowkey or an unparseable HBASE_TS_KEY is dropped under
    ``bad_lines='skip'`` (the importtsv.skip.bad.lines default here,
    since cell output without a valid coordinate is meaningless) or
    kept with ts=NULL under 'permissive' for the caller to triage.
    Missing value fields produce no cell — a Put carries only the cells
    it has (excess TSV fields beyond the spec are already dropped by
    the positional schema).

    Scale: one CSV scan -> one stack() projection; no shuffle, no
    Python. The melt multiplies rows by the number of value columns,
    same as the reference mapper emitting one KeyValue per column.
    """
    if list(columns).count("HBASE_ROW_KEY") != 1:
        raise ValueError("columns must contain HBASE_ROW_KEY exactly once")
    if bad_lines not in ("skip", "permissive"):
        raise ValueError(f"bad_lines must be 'skip' or 'permissive': {bad_lines!r}")
    names = [f"_c{i}" for i in range(len(columns))]
    df = (
        spark.read.option("sep", sep)
        .schema(", ".join(f"{n} string" for n in names))
        .csv(path)
    )
    rk = F.col(names[list(columns).index("HBASE_ROW_KEY")])
    if "HBASE_TS_KEY" in columns:
        ts = F.col(names[list(columns).index("HBASE_TS_KEY")]).try_cast("long")
    else:
        ts = F.lit(0).cast("long")
    value_fields = [
        (i, c) for i, c in enumerate(columns)
        if c not in ("HBASE_ROW_KEY", "HBASE_TS_KEY")
    ]
    if not value_fields:
        raise ValueError(
            "columns spec has no cf:qualifier value fields — nothing to "
            f"import (got {list(columns)!r})"
        )
    for _, c in value_fields:
        if ":" not in c:
            raise ValueError(f"value column spec must be cf:qualifier, got {c!r}")
    # Melt via explode(array(struct(...))) with cf/qualifier as lit()
    # Columns — NOT a stack() SQL string, where a quote or comma inside
    # a family/qualifier name would break (or subvert) F.expr parsing.
    # Same Generate plan shape as stack, no SQL string construction.
    kvs = [
        F.struct(
            F.lit(c.split(":", 1)[0]).alias("cf"),
            F.lit(c.split(":", 1)[1]).alias("qualifier"),
            F.col(names[i]).alias("value"),
        )
        for i, c in value_fields
    ]
    cells = (
        df.select(
            rk.alias("rowkey"),
            ts.alias("ts"),
            F.explode(F.array(*kvs)).alias("__kv"),
        )
        .filter(F.col("__kv.value").isNotNull())
        .select(
            "rowkey",
            F.col("__kv.cf").alias("cf"),
            F.col("__kv.qualifier").alias("qualifier"),
            "ts",
            F.lit("put").alias("op"),
            F.col("__kv.value").alias("value"),
        )
    )
    if bad_lines == "skip":
        cells = cells.filter(F.col("rowkey").isNotNull() & F.col("ts").isNotNull())
    return cells


def import_json(
    spark: SparkSession, path: str, schema: str, rowkey_col: str
) -> DataFrame:
    """JSON lines -> typed table (schema mandatory: no inference in a
    production ingest path)."""
    return spark.read.schema(schema).json(path).sortWithinPartitions(rowkey_col)


def import_orc(spark: SparkSession, path: str, rowkey_col: str) -> DataFrame:
    return spark.read.orc(path).sortWithinPartitions(rowkey_col)


def export_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def export_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Export: table -> dump files (parquet instead of SequenceFile)."""
    df.write.mode(mode).parquet(path)


def import_table(spark: SparkSession, path: str) -> DataFrame:
    """Import: restore a dump."""
    return spark.read.parquet(path)


def export_cells(
    cells: DataFrame,
    path: str,
    versions: int = 1,
    start_time: Optional[int] = None,
    end_time: Optional[int] = None,
    raw: bool = False,
    mode: str = "overwrite",
) -> None:
    """Versioned Export (Export.java:75-100 builds its Scan from the
    CLI args exactly like this): dump the CELL layer keeping ``versions``
    per column, restricted to [start_time, end_time), optionally ``raw``
    (tombstones included, nothing masked — Scan.setRaw). The dump is a
    cell DataFrame readable by ``import_table`` and replayable into a
    ``CellTable``; at scale this is one resolve + one write, the same
    single scan-job shape as the reference's mapper-only MR job."""
    from hindex_spark import cells as cell_mod

    time_range = None
    if start_time is not None or end_time is not None:
        time_range = (start_time or 0, end_time if end_time is not None else 2**62)
    out = cell_mod.resolve(
        cells, max_versions=versions, time_range=time_range, raw=raw
    )
    if raw:
        # raw keeps delete markers too: union them back in (resolve
        # returns only puts; raw export ships the full edit stream)
        out = out.unionByName(cells.filter(F.col("op") != "put"))
        if time_range is not None:
            lo, hi = time_range
            out = out.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
    out.write.mode(mode).parquet(path)


def copy_table(
    df: DataFrame,
    rowkey_col: str,
    start_row=None,
    stop_row=None,
    predicate=None,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """CopyTable: range/filter-scoped table copy (read->filter->write)."""
    out = df
    if start_row is not None:
        out = out.filter(F.col(rowkey_col) >= start_row)
    if stop_row is not None:
        out = out.filter(F.col(rowkey_col) < stop_row)
    if predicate is not None:
        out = out.filter(predicate)
    if columns is not None:
        cols = [rowkey_col] + [c for c in columns if c != rowkey_col]
        out = out.select(*cols)
    return out


def row_counter(df: DataFrame, rowkey_col: str) -> DataFrame:
    """RowCounter: count rows (FirstKeyOnly-style: key column only)."""
    return df.select(rowkey_col).agg(F.count("*").alias("row_count"))


def cell_counter(df: DataFrame, rowkey_col: str) -> DataFrame:
    """CellCounter: per-table cell stats — total non-null cells per
    column + row count (the wide-layer analog of per-CF/qualifier
    cell counts)."""
    value_cols = [c for c in df.columns if c != rowkey_col]
    aggs = [F.count("*").alias("row_count")] + [
        F.count(c).alias(f"cells_{c}") for c in value_cols
    ]
    return df.agg(*aggs)


def cell_counter_report(cells: DataFrame, separator: str = ":") -> DataFrame:
    """CellCounter over the CELL layer — the reference's full six-stat
    report (CellCounter.java:55-170; mapper emits long-form (key, 1)
    pairs folded by IntSumReducer):

      1. ``Total ROWS``                       — distinct rowkeys
      2. ``Total Families Across all Rows``   — distinct (row, cf) pairs
      3. ``<cf>``                             — rows containing each cf
      4. ``Total Qualifiers across all Rows`` — distinct (row, cf, qual)
      5. ``<cf><sep><qual>``                  — rows containing each column
      6. ``<row><sep><cf><sep><qual>_Versions`` — version count per cell

    Input is a cell DataFrame (rowkey, cf, qualifier, ...), one row per
    cell VERSION (the wide-table analog is ``cell_counter``). All six
    stats derive from ONE aggregation on (rowkey, cf, qualifier), which
    is PERSISTED so the base shuffle over the raw cell store runs once —
    without it each of the six union branches re-planned the groupBy
    from source (six full scans of the store at 100 TB; the plan audit
    showed 11 exchanges). The re-aggregations then run over the reduced
    in-memory frame, matching the reference's single map-reduce pass.
    The report (and the persisted frame) is O(distinct row-columns)
    because of stat 6 — same cardinality as the reference's counter
    output; spill-safe via MEMORY_AND_DISK. The report is materialized
    EAGERLY (localCheckpoint) and the base aggregate unpersisted before
    returning: repeated reports over different inputs then release
    their working cache instead of accumulating executor storage, and
    no caller ever needs clearCache() (which would also evict the
    catalog's unrelated table/index caches). The checkpoint blocks free
    with the returned plan's GC, like any materialized result.
    """
    v = (
        cells.groupBy("rowkey", "cf", "qualifier")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    rowfam = v.select("rowkey", "cf").distinct()
    key = lambda *parts: F.concat_ws(separator, *parts)  # noqa: E731
    total_rows = v.agg(
        F.lit("Total ROWS").alias("key"),
        F.countDistinct("rowkey").alias("cnt"),
    )
    total_fams = rowfam.agg(
        F.lit("Total Families Across all Rows").alias("key"),
        F.count("*").alias("cnt"),
    )
    per_fam = rowfam.groupBy(F.col("cf").alias("key")).agg(F.count("*").alias("cnt"))
    total_quals = v.agg(
        F.lit("Total Qualifiers across all Rows").alias("key"),
        F.count("*").alias("cnt"),
    )
    per_qual = v.groupBy(key("cf", "qualifier").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    versions = v.select(
        F.concat(key("rowkey", "cf", "qualifier"), F.lit("_Versions")).alias("key"),
        F.col("cnt"),
    )
    out = total_rows
    for part in (total_fams, per_fam, total_quals, per_qual, versions):
        out = out.unionByName(part)
    out = out.localCheckpoint(eager=True)  # one job over the persisted base
    v.unpersist()
    return out


def _row_digest(
    df: DataFrame, rowkey_col: str, columns: Optional[Sequence[str]], hash_fn: str
) -> DataFrame:
    """(rowkey, digest) projection of a table — the narrow form each
    side of verify_replication reduces to before the compare join."""
    cols = list(columns) if columns else sorted(c for c in df.columns if c != rowkey_col)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols]
    blob = F.concat_ws("\x01", *parts)
    digest = F.md5(blob) if hash_fn == "md5" else F.xxhash64(blob).cast("string")
    return df.select(F.col(rowkey_col).alias("__rk"), digest.alias("__digest"))


def verify_replication(
    source: DataFrame,
    peer: DataFrame,
    rowkey_col: str,
    columns: Optional[Sequence[str]] = None,
    hash_fn: str = "md5",
    detail: bool = False,
) -> DataFrame:
    """VerifyReplication ("verifyrep") — compare a table with its
    replicated peer and report GOODROWS/BADROWS, the last tool of the
    reference's MapReduce Driver not yet ported (Driver.java registers
    it; mapper: hbase-server/.../mapreduce/replication/VerifyReplication.java:80-133
    — per-row Result.compareResults -> Counters.{GOODROWS,BADROWS}).

    ``badrows`` is broken down further than the reference's single
    counter: rows only in the source (peer lost an edit), only in the
    peer (peer has a ghost), and present-both-but-different content.
    ``columns`` restricts the compare (the --families analog). With
    ``detail=True`` returns the per-row verdicts instead of counters.

    Scale (100 TB): each side is reduced MAP-SIDE to (rowkey, digest) —
    the full-outer compare join ships two narrow columns no matter how
    wide the table is, and both sides of an engine-written table are
    rowkey-sorted/bucketed so the join co-partitions without a shuffle.
    ``hash_fn='xxhash64'`` is the cheap JVM production digest;
    ``'md5'`` (default) keeps the result reproducible in external
    SQL engines for auditing.
    """
    s = _row_digest(source, rowkey_col, columns, hash_fn)
    p = _row_digest(peer, rowkey_col, columns, hash_fn)
    j = s.alias("s").join(p.alias("p"), F.col("s.__rk") == F.col("p.__rk"), "full_outer")
    in_s, in_p = F.col("s.__rk").isNotNull(), F.col("p.__rk").isNotNull()
    same = F.col("s.__digest") == F.col("p.__digest")
    status = (
        F.when(~in_p, F.lit("ONLY_IN_SOURCE"))
        .when(~in_s, F.lit("ONLY_IN_PEER"))
        .when(same, F.lit("GOOD"))
        .otherwise(F.lit("CONTENT_DIFFERENT"))
    )
    verdicts = j.select(
        F.coalesce(F.col("s.__rk"), F.col("p.__rk")).alias(rowkey_col),
        status.alias("status"),
    )
    if detail:
        return verdicts.filter(F.col("status") != "GOOD")
    good = F.col("status") == "GOOD"
    return verdicts.agg(
        F.count(F.when(good, 1)).alias("goodrows"),
        F.count(F.when(~good, 1)).alias("badrows"),
        F.count(F.when(F.col("status") == "ONLY_IN_SOURCE", 1)).alias("only_in_source"),
        F.count(F.when(F.col("status") == "ONLY_IN_PEER", 1)).alias("only_in_peer"),
        F.count(F.when(F.col("status") == "CONTENT_DIFFERENT", 1)).alias(
            "content_different"
        ),
    )


def diff_tables(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    include_unchanged: bool = False,
    two_pass: bool = False,
) -> DataFrame:
    """Row-level table diff with changed-column attribution: one row
    per differing key — ``change`` in (added, removed, changed) plus
    ``changed_cols``, the comma-joined names (in ``old``'s column
    order) of the columns whose values differ null-safely. The
    row-detail companion to ``verify_replication`` (whose counters say
    HOW MANY rows diverged; this says WHICH rows and WHICH columns —
    the data-migration audit surface).

    ``two_pass=True`` is the 100 TB plan for wide tables with sparse
    diffs: pass 1 compares map-side (rowkey, digest) projections —
    the full-outer join ships two narrow columns — and only the
    differing keys' rows are re-joined wide for attribution, so the
    wide shuffle is diff-sized, not table-sized. Default off: one
    wide full-outer join, the cheaper plan when diffs are dense or
    rows are narrow. Result-identical either way (pinned by test)."""
    import functools

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_cols = list(key_cols)
    cols = (list(compare_cols) if compare_cols is not None
            else [c for c in old.columns if c not in key_cols])
    missing = [c for c in cols + key_cols if c not in new.columns]
    if missing:
        raise ValueError(f"columns missing from new frame: {missing}")

    if two_pass and not include_unchanged:
        if len(key_cols) != 1:
            raise ValueError("two_pass diff needs a single key column")
        rk = key_cols[0]
        s = _row_digest(old, rk, cols, "xxhash64")
        p = _row_digest(new, rk, cols, "xxhash64")
        j = s.alias("s").join(
            p.alias("p"), F.col("s.__rk") == F.col("p.__rk"), "full_outer"
        ).filter(
            F.col("s.__rk").isNull() | F.col("p.__rk").isNull()
            | (F.col("s.__digest") != F.col("p.__digest"))
        )
        keys = j.select(
            F.coalesce(F.col("s.__rk"), F.col("p.__rk")).alias(rk)
        )
        # pass 2: wide attribution join restricted to the differing
        # keys — semi-join each side down before the full-outer
        old = old.join(keys, rk, "left_semi")
        new = new.join(keys, rk, "left_semi")

    o = old.select(
        *key_cols, F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    n = new.select(
        *key_cols, F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    j = o.join(n, key_cols, "full_outer")
    differ = [~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in cols]
    any_diff = functools.reduce(lambda a, b: a | b, differ, F.lit(False))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed_cols = F.when(
        F.col("__in_old").isNull() | F.col("__in_new").isNull(), F.lit("")
    ).otherwise(
        F.concat_ws(",", *[F.when(d, F.lit(c)) for c, d in zip(cols, differ)])
    )
    out = j.select(
        *key_cols, change.alias("change"), changed_cols.alias("changed_cols")
    )
    if include_unchanged:
        return out
    return out.filter(F.col("change") != "unchanged")


def bulk_load(
    spark: SparkSession, prepared_path: str, table_path: str
) -> None:
    """LoadIncrementalHFiles: move prepared files into the table dir —
    with parquet tables this is an append write of already-sorted data
    (no per-file region assignment needed; Spark re-splits on read)."""
    spark.read.parquet(prepared_path).write.mode("append").parquet(table_path)


def compact_table_files(
    spark: SparkSession,
    table_path: str,
    rowkey_col: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """File-level compaction of a parquet table directory — the HBase
    minor/major compaction analog at the storage layer
    (hbase-server/.../regionserver/Store.compact,
    ExploringCompactionPolicy.java: many small store files are rewritten
    into few large sorted ones so scans stop paying per-file open/seek
    cost). ``bulk_load`` appends and high-rate batch ingests grow a
    tiny-file swamp; this job rewrites the directory into
    ceil(total_bytes / target_file_bytes) rowkey-range-sorted files and
    atomically swaps the result in (staging dir + rename — readers keep
    the old listing or see the new one, never a mix). Returns the new
    file count.

    Scale: sizing uses the directory's file lengths (metadata only, no
    data scan); the rewrite itself is one repartitionByRange shuffle —
    the price of restoring the sorted-run invariant, identical to what
    a major compaction pays. Run it from the same maintenance window as
    ``compact_changelog``; at 100 TB compact per rowkey range slice so
    each job reads a bounded region, like region-scoped compactions.
    """
    import math
    import os
    import shutil
    from urllib.parse import urlparse

    df = spark.read.parquet(table_path)
    sizes = []
    for uri in df.inputFiles():
        p = urlparse(uri).path or uri
        if os.path.isfile(p):
            sizes.append(os.path.getsize(p))
    total = sum(sizes) or 1
    n = max(1, math.ceil(total / target_file_bytes))
    staging = table_path.rstrip("/") + ".compact_staging"
    shutil.rmtree(staging, ignore_errors=True)
    (
        df.repartitionByRange(n, rowkey_col)
        .sortWithinPartitions(rowkey_col)
        .write.mode("overwrite")
        .parquet(staging)
    )
    from hindex_spark.catalog import Catalog

    Catalog._swap_in(table_path.rstrip("/"), staging)
    return n
