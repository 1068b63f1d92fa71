"""Catalog: table descriptors + persistent storage layout.

Reference: HTableDescriptor/HColumnDescriptor (hbase-client/.../
HTableDescriptor.java) with TableIndices serialized into the descriptor
under INDEX_SPEC (TableIndices.java:53-115, Constants.java:44-53); index
tables created next to the data table by IndexMasterObserver.preCreateTable
(IndexMasterObserver.java:89-129).

Layout per table (the 100 TB design):
    <root>/<table>/_descriptor.json      schema + rowkey + families + indexes
    <root>/<table>/data/                 parquet, repartitionByRange(rowkey),
                                         sortWithinPartitions(rowkey) — the
                                         HFile sort invariant: range scans
                                         prune via row-group min/max stats
    <root>/<table>/index/<name>/         parquet, range-partitioned + sorted
                                         by (indexed cols..., rowkey)

Both data and index files are sorted on their access key, so point/range
reads touch O(1) row groups — the parquet analog of HFile block indexes
(+ optional parquet bloom filters for point gets).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hindex_spark.index.build import build_index
from hindex_spark.index.spec import IndexSpecification, TableIndices
from hindex_spark.table import Table


@dataclass
class FamilyDescriptor:
    """HColumnDescriptor analog: per-family physical knobs."""

    name: str
    max_versions: int = 1
    ttl: Optional[int] = None  # seconds
    compression: str = "snappy"


@dataclass
class TableDescriptor:
    """HTableDescriptor analog."""

    name: str
    rowkey_col: str
    families: List[FamilyDescriptor] = field(default_factory=list)
    indices: TableIndices = field(default_factory=TableIndices)

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "rowkey_col": self.rowkey_col,
                "families": [
                    {
                        "name": f.name,
                        "max_versions": f.max_versions,
                        "ttl": f.ttl,
                        "compression": f.compression,
                    }
                    for f in self.families
                ],
                "indices": json.loads(self.indices.to_json()),
            },
            indent=2,
        )

    @staticmethod
    def from_json(s: str) -> "TableDescriptor":
        d = json.loads(s)
        return TableDescriptor(
            d["name"],
            d["rowkey_col"],
            [
                FamilyDescriptor(
                    f["name"], f.get("max_versions", 1), f.get("ttl"), f.get("compression", "snappy")
                )
                for f in d.get("families", [])
            ],
            TableIndices.from_json(json.dumps(d.get("indices", []))),
        )


class Catalog:
    """Filesystem-backed table catalog (the master's table registry)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def save(self, table: Table, num_partitions: int = 32) -> None:
        """Persist table + all index tables, range-sorted on their keys.
        One repartitionByRange shuffle per artifact — the minimum for a
        sorted layout; at 100 TB size num_partitions to ~target file
        count (data_size / 1 GB)."""
        d = self._dir(table.name)
        desc = TableDescriptor(table.name, table.rowkey_col, indices=table.indices)
        data = (
            table.df.repartitionByRange(num_partitions, table.rowkey_col)
            .sortWithinPartitions(table.rowkey_col)
        )
        # parquet bloom filter on the rowkey: the HFile row-bloom analog
        # (BloomFilterFactory.java:40) — point gets skip row groups whose
        # bloom excludes the key even when min/max ranges overlap
        (
            data.write.mode("overwrite")
            .option(f"parquet.bloom.filter.enabled#{table.rowkey_col}", "true")
            .parquet(os.path.join(d, "data"))
        )
        for spec in table.indices.indices:
            idx = table.index_tables[spec.name]
            sort_cols = spec.indexed_names + [table.rowkey_col]
            (
                idx.repartitionByRange(num_partitions, *sort_cols)
                .sortWithinPartitions(*sort_cols)
                .write.mode("overwrite")
                .parquet(os.path.join(d, "index", spec.name))
            )
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "_descriptor.json"), "w") as f:
            f.write(desc.to_json())

    def load(self, name: str) -> Table:
        """Open a table: reads descriptor, attaches data + index scans
        (lazy — nothing is read until a query runs)."""
        d = self._dir(name)
        with open(os.path.join(d, "_descriptor.json")) as f:
            desc = TableDescriptor.from_json(f.read())
        t = Table(
            self.spark.read.parquet(os.path.join(d, "data")), desc.rowkey_col, name, desc.indices
        )
        for spec in desc.indices.indices:
            t.index_tables[spec.name] = self.spark.read.parquet(
                os.path.join(d, "index", spec.name)
            )
        return t

    def save_bucketed(self, table: Table, num_buckets: int = 32) -> None:
        """Persist as a bucketed+sorted managed table (bucketBy rowkey):
        joins and aggregations on the rowkey then run WITHOUT a shuffle
        on this side — the analog of the reference's region colocation
        (SecIndexLoadBalancer keeps T and T_idx regions together so the
        index semi-join is region-local). Index tables are bucketed on
        rowkey too, so index-rowkeys ∩ data is also shuffle-free."""
        name = f"{table.name}_bucketed"
        (
            table.df.write.mode("overwrite")
            .bucketBy(num_buckets, table.rowkey_col)
            .sortBy(table.rowkey_col)
            .option("path", os.path.join(self.root, name, "data"))
            .saveAsTable(name)
        )
        for spec in table.indices.indices:
            idx_name = f"{table.name}_bucketed_idx_{spec.name}"
            (
                table.index_tables[spec.name]
                .write.mode("overwrite")
                .bucketBy(num_buckets, table.rowkey_col)
                .sortBy(table.rowkey_col)
                .option("path", os.path.join(self.root, name, "index", spec.name))
                .saveAsTable(idx_name)
            )

    def load_bucketed(self, spark_name: str, rowkey_col: str) -> Table:
        return Table(self.spark.table(spark_name), rowkey_col, spark_name)

    def list_tables(self) -> List[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            n
            for n in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, n, "_descriptor.json"))
        )

    def snapshot(self, name: str, snapshot_name: str) -> None:
        """TableSnapshotInputFormat analog: an immutable copy readable
        without touching the live table."""
        t = self.load(name)
        snap = Table(t.df, t.rowkey_col, f"{name}@{snapshot_name}", t.indices)
        snap.index_tables = t.index_tables
        d = self._dir(f"{name}@{snapshot_name}")
        os.makedirs(d, exist_ok=True)
        self.save(snap)


def multi_table_scan(tables: List[Table]) -> DataFrame:
    """MultiTableInputFormat analog: one scan over several tables."""
    out = tables[0].df
    for t in tables[1:]:
        out = out.unionByName(t.df, allowMissingColumns=True)
    return out
