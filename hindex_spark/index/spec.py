"""Index specifications — the typed, multi-column, value-partitioned
index metadata of the reference.

Reference: hbase-secondaryindex/.../index/IndexSpecification.java:47-59
(name <= 18 chars, Constants.java:42), ColumnQualifier.java:39-49
(cf, qualifier, ValueType, maxValueLength, ValuePartition),
ValuePartition.java:9-26 / SeparatorPartition.java:40-124 /
SpatialPartition.java, TableIndices.java:53-115.

Spark mapping: an index is a sorted projection table
``(idx_c0, idx_c1, ..., rowkey)`` over typed columns — no byte-level
order-preserving encoding needed (IndexUtils.changeValueAccToDataType's
job is done by native column types). A ValuePartition becomes an
expression index: the indexed column is ``split(col, sep)[n]`` or
``substring(col, off, len)`` computed at build time.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import List, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_INDEX_NAME_LENGTH = 18  # Constants.java:42

VALUE_TYPES = {"String", "Int", "Float", "Long", "Double", "Short", "Byte", "Char"}

_SPARK_TYPE = {
    "String": "string",
    "Int": "int",
    "Float": "float",
    "Long": "long",
    "Double": "double",
    "Short": "short",
    "Byte": "tinyint",
    "Char": "string",
}


class ValuePartition:
    """Index over a *part* of a value (ValuePartition.java:9-26)."""

    def expr(self, col: Column) -> Column:  # pragma: no cover
        raise NotImplementedError

    def to_json(self) -> dict:  # pragma: no cover
        raise NotImplementedError


@dataclass
class SeparatorPartition(ValuePartition):
    """Split by separator, index the Nth piece (1-based, matching
    SeparatorPartition.getPartOfValue:76-124)."""

    separator: str
    position: int

    def expr(self, col: Column) -> Column:
        # Literal separator: split() takes a regex, so escape it. F.get
        # (not getItem) because under ANSI mode (Spark 4 default) getItem
        # THROWS on out-of-bounds: a value with fewer than position-1
        # separators must derive NULL (the reference zero-pads it —
        # SeparatorPartition.getPartOfValue:97-99 returns byte[0]), not
        # crash the whole index build.
        import re

        return F.get(F.split(col, re.escape(self.separator)), self.position - 1)

    def to_json(self) -> dict:
        return {"kind": "separator", "separator": self.separator, "position": self.position}


@dataclass
class SpatialPartition(ValuePartition):
    """Index a substring: offset (0-based) + length (SpatialPartition.java)."""

    offset: int
    length: int

    def expr(self, col: Column) -> Column:
        return F.substring(col, self.offset + 1, self.length)

    def to_json(self) -> dict:
        return {"kind": "spatial", "offset": self.offset, "length": self.length}


def partition_from_json(d: Optional[dict]) -> Optional[ValuePartition]:
    if d is None:
        return None
    if d["kind"] == "separator":
        return SeparatorPartition(d["separator"], d["position"])
    if d["kind"] == "spatial":
        return SpatialPartition(d["offset"], d["length"])
    raise ValueError(f"unknown partition kind {d['kind']}")


@dataclass
class ColumnQualifier:
    """One indexed column (ColumnQualifier.java:39-49).

    ``column`` is the wide-table column name (the analog of cf+qualifier;
    use "cf_q" naming for cell-backed tables). ``value_type`` one of
    VALUE_TYPES (ColumnQualifier.java:208-210); ``max_value_length`` kept
    for API parity (padding is unnecessary with typed columns).
    """

    column: str
    value_type: str = "String"
    max_value_length: int = 0
    value_partition: Optional[ValuePartition] = None

    def __post_init__(self):
        if self.value_type not in VALUE_TYPES:
            raise ValueError(f"unsupported ValueType {self.value_type}")

    @property
    def indexed_name(self) -> str:
        """Column name inside the index table."""
        if isinstance(self.value_partition, SeparatorPartition):
            return f"{self.column}__sep{self.value_partition.position}"
        if isinstance(self.value_partition, SpatialPartition):
            vp = self.value_partition
            return f"{self.column}__sub{vp.offset}_{vp.length}"
        return self.column

    def value_expr(self, validate: bool = False) -> Column:
        """The (unaliased) expression computing this indexed value from
        the data table — what Table.resolve_column hands to filters that
        reference the derived ``indexed_name`` directly.

        ``validate=True`` (the index build/maintenance path) enforces
        ``max_value_length`` on String values the way
        IndexUtils.prepareIndexPut throws IOException for an over-length
        value (TestIndexRegionObserver.testIndexPutWithValueGreaterThanLength:590,
        testPutWithValueLengthMoreThanMaxValueLength:1091): a
        ``raise_error`` guard inside the projection, so the write job
        itself fails — no extra validation pass over the data."""
        base = F.col(self.column)
        if self.value_partition is not None:
            base = self.value_partition.expr(base.cast("string"))
        out = base.cast(_SPARK_TYPE[self.value_type])
        if validate and self.max_value_length > 0 and self.value_type in ("String", "Char"):
            out = F.when(
                F.length(out) > self.max_value_length,
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"value for indexed column {self.column!r} exceeds "
                            f"max_value_length {self.max_value_length}: "
                        ),
                        out,
                    )
                ),
            ).otherwise(out)
        return out

    def expr(self, validate: bool = False) -> Column:
        return self.value_expr(validate).alias(self.indexed_name)

    def to_json(self) -> dict:
        return {
            "column": self.column,
            "value_type": self.value_type,
            "max_value_length": self.max_value_length,
            "value_partition": self.value_partition.to_json() if self.value_partition else None,
        }

    @staticmethod
    def from_json(d: dict) -> "ColumnQualifier":
        return ColumnQualifier(
            d["column"],
            d.get("value_type", "String"),
            d.get("max_value_length", 0),
            partition_from_json(d.get("value_partition")),
        )


@dataclass
class IndexSpecification:
    """Named index over 1..n columns (IndexSpecification.java:47-59)."""

    name: str
    columns: List[ColumnQualifier] = field(default_factory=list)
    ttl: Optional[int] = None
    max_versions: Optional[int] = None

    def __post_init__(self):
        if not self.name or len(self.name) > MAX_INDEX_NAME_LENGTH:
            raise ValueError(
                f"index name must be 1..{MAX_INDEX_NAME_LENGTH} chars: {self.name!r}"
            )
        seen = set()
        for c in self.columns:
            if c.indexed_name in seen:
                raise ValueError(f"duplicate column {c.indexed_name} in index {self.name}")
            seen.add(c.indexed_name)

    def add_column(
        self,
        column: str,
        value_type: str = "String",
        max_value_length: int = 0,
        value_partition: Optional[ValuePartition] = None,
    ) -> "IndexSpecification":
        self.columns.append(ColumnQualifier(column, value_type, max_value_length, value_partition))
        return self

    @property
    def indexed_names(self) -> List[str]:
        return [c.indexed_name for c in self.columns]

    def derive_physical(self, member_families) -> "IndexSpecification":
        """Derive the index's physical knobs from its member columns'
        families (IndexSpecification.java:57-59,111-112): TTL = MIN over
        families — an index entry must not outlive ANY member value —
        and max_versions = MAX — it must stay visible as long as the
        most-versioned member is. Applies to CellTable-backed tables,
        where the compaction job (cells.compact) enforces both knobs."""
        ttls = [f.ttl for f in member_families if getattr(f, "ttl", None) is not None]
        self.ttl = min(ttls) if ttls else None
        mvs = [getattr(f, "max_versions", None) for f in member_families]
        mvs = [m for m in mvs if m is not None]
        self.max_versions = max(mvs) if mvs else None
        return self

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "columns": [c.to_json() for c in self.columns],
            "ttl": self.ttl,
            "max_versions": self.max_versions,
        }

    @staticmethod
    def from_json(d: dict) -> "IndexSpecification":
        return IndexSpecification(
            d["name"],
            [ColumnQualifier.from_json(c) for c in d["columns"]],
            d.get("ttl"),
            d.get("max_versions"),
        )


@dataclass
class TableIndices:
    """The list of indexes attached to a table descriptor
    (TableIndices.java:53-115, serialized under INDEX_SPEC)."""

    indices: List[IndexSpecification] = field(default_factory=list)

    def add_index(self, spec: IndexSpecification) -> "TableIndices":
        if any(i.name == spec.name for i in self.indices):
            raise ValueError(f"duplicate index name {spec.name}")
        self.indices.append(spec)
        return self

    def to_json(self) -> str:
        return json.dumps([i.to_json() for i in self.indices])

    @staticmethod
    def from_json(s: str) -> "TableIndices":
        return TableIndices([IndexSpecification.from_json(d) for d in json.loads(s)])
