"""F1-fixture queries in the correctness gate: the canonical
TestMultipleIndicesInScan table (idxtab, columns c1..c6, indexes
idx1(c3,c4,c5,c6) idx2(c1) idx3(c2) idx4(c2,c1)) built deterministically
from module constants on BOTH sides — Spark createDataFrame and a DuckDB
VALUES CTE — so index-path results are oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.index.spec import IndexSpecification
from hindex_spark.queries import query
from hindex_spark.table import Scan, Table

# deterministic fixture rows (LCG over a 6-value alphabet, some NULLs —
# partial puts per TestExtendedPutOps)
_VALUES = ["a", "b", "c", "d", "e", "f"]
ROWS = []
_seed = 7
for _i in range(120):
    _seed = (_seed * 1103515245 + 12345) % (2 ** 31)
    row = [f"row{_i:03d}"]
    for _j in range(6):
        v = (_seed >> (_j * 4)) % (len(_VALUES) + 2)
        row.append(_VALUES[v] if v < len(_VALUES) else None)
    ROWS.append(tuple(row))

_COLS = ["rowkey", "c1", "c2", "c3", "c4", "c5", "c6"]


def _values_cte() -> str:
    def lit(v):
        return "NULL" if v is None else f"'{v}'"

    rows_sql = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in ROWS)
    return f"idxtab({', '.join(_COLS)}) AS (SELECT * FROM (VALUES {rows_sql}))"


def _idxtab(spark) -> Table:
    df = spark.createDataFrame(ROWS, _COLS)
    t = Table(df, "rowkey", "idxtab")
    idx1 = IndexSpecification("idx1")
    for c in ["c3", "c4", "c5", "c6"]:
        idx1.add_column(c)
    t.create_index(idx1)
    t.create_index(IndexSpecification("idx2").add_column("c1"))
    t.create_index(IndexSpecification("idx3").add_column("c2"))
    t.create_index(IndexSpecification("idx4").add_column("c2").add_column("c1"))
    return t


def _scvf(col, op, val):
    return fl.SingleColumnValueFilter(col, op, val, filter_if_missing=True)


@query(
    "idxtab_and_setcover",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1, c2 FROM idxtab WHERE c1 = 'a' AND c2 = 'b'""",
)
def q_idxtab_and(spark, sf_dir):
    """AND over (c1, c2): set-cover picks idx4(c2,c1) alone."""
    t = _idxtab(spark)
    f = fl.FilterList("AND", [_scvf("c1", fl.EQUAL, "a"), _scvf("c2", fl.EQUAL, "b")])
    out = t.scan(Scan(filter=f, columns=["c1", "c2"]))
    assert t.last_index_plan.used_indexes == ["idx4"], t.last_index_plan.used_indexes
    return out


@query(
    "idxtab_or_union",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1, c2 FROM idxtab WHERE c1 = 'a' OR c2 = 'c'""",
)
def q_idxtab_or(spark, sf_dir):
    t = _idxtab(spark)
    f = fl.FilterList("OR", [_scvf("c1", fl.EQUAL, "a"), _scvf("c2", fl.EQUAL, "c")])
    out = t.scan(Scan(filter=f, columns=["c1", "c2"]))
    assert set(t.last_index_plan.used_indexes) == {"idx2", "idx3"}
    return out


@query(
    "idxtab_prefix_range",
    f"""WITH {_values_cte()}
        SELECT rowkey, c3, c4, c5 FROM idxtab
        WHERE c3 = 'f' AND c4 = 'f' AND c5 >= 'b' AND c5 < 'e'""",
)
def q_idxtab_prefix_range(spark, sf_dir):
    """Equals-prefix (c3,c4) + range on c5 through idx1."""
    t = _idxtab(spark)
    f = fl.FilterList(
        "AND",
        [
            _scvf("c3", fl.EQUAL, "f"),
            _scvf("c4", fl.EQUAL, "f"),
            _scvf("c5", fl.GREATER_OR_EQUAL, "b"),
            _scvf("c5", fl.LESS, "e"),
        ],
    )
    out = t.scan(Scan(filter=f, columns=["c3", "c4", "c5"]))
    assert t.last_index_plan.used_indexes == ["idx1"]
    assert t.last_index_plan.root.covered_columns == ["c3", "c4", "c5"]
    return out


@query(
    "idxtab_null_semantics",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1 FROM idxtab WHERE c1 IS NULL OR c1 > 'd'""",
)
def q_idxtab_nulls(spark, sf_dir):
    """filterIfMissing=false keeps NULL rows — the non-indexable path."""
    t = _idxtab(spark)
    f = fl.SingleColumnValueFilter("c1", fl.GREATER, "d", filter_if_missing=False)
    out = t.scan(Scan(filter=f, columns=["c1"]))
    assert not t.last_index_plan.uses_index  # NULL-keeping is not indexable
    return out
