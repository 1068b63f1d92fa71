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
) -> DataFrame:
    """ImportTsv: TSV -> typed table sorted by rowkey. ``columns`` names
    the TSV fields in order (the -Dimporttsv.columns analog)."""
    reader = spark.read.option("sep", sep)
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


def bulk_load(
    spark: SparkSession, prepared_path: str, table_path: str
) -> None:
    """LoadIncrementalHFiles: move prepared files into the table dir —
    with parquet tables this is an append write of already-sorted data
    (no per-file region assignment needed; Spark re-splits on read)."""
    spark.read.parquet(prepared_path).write.mode("append").parquet(table_path)
