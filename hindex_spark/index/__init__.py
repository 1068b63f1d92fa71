from hindex_spark.index.spec import (  # noqa: F401
    ColumnQualifier,
    IndexSpecification,
    SeparatorPartition,
    SpatialPartition,
    TableIndices,
    ValuePartition,
)
from hindex_spark.index.planner import (  # noqa: F401
    IndexPlan,
    NoIndexExpression,
    ScanFilterEvaluator,
    SingleIndexExpression,
    MultiIndexExpression,
)
from hindex_spark.index.build import build_index  # noqa: F401
