"""hindex_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tenggyut/HIndex (HBase 0.98.3 + secondary
indexes), re-expressed Spark-first.

Reference semantics (file:line cites point into /root/reference):
  - Data model: sorted multi-versioned cell space (KeyValue.java:64-81)
    -> cell layer (cells.py) + typed wide table layer.
  - Query surface: Get/Scan + filter algebra (hbase-client/.../filter/),
    mutations (Put/Delete/Increment/Append/checkAnd*), server-side
    aggregations (AggregateImplementation.java) -> table.py, filters.py,
    aggregations.py.
  - Secondary indexes: typed multi-column indexes with a planner that
    rewrites filter trees into index scans merged by AND/OR set ops
    (ScanFilterEvaluator.java) -> index/ package.

Everything compiles to DataFrame plans so Catalyst handles pushdown,
pruning, join strategy, and whole-stage codegen.
"""

from hindex_spark.session import get_spark, load_tables  # noqa: F401
from hindex_spark.table import CellTable, Scan, Table  # noqa: F401
from hindex_spark.catalog import Catalog, FamilyDescriptor, TableDescriptor  # noqa: F401
from hindex_spark.parse_filter import parse_filter  # noqa: F401
from hindex_spark.index.spec import (  # noqa: F401
    ColumnQualifier,
    IndexSpecification,
    SeparatorPartition,
    SpatialPartition,
    TableIndices,
)
from hindex_spark.index.planner import (  # noqa: F401
    MultiIndexExpression,
    NoIndexExpression,
    SingleIndexExpression,
)

__version__ = "0.1.0"
