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


# ---------------------------------------------------------------------------
# round-4 ports of TestMultipleIndicesInScan's combination cases
# (hbase-secondaryindex/src/test/.../TestMultipleIndicesInScan.java) —
# each gate asserts BOTH the rows (vs the DuckDB oracle) and the planner's
# index choice (vs the reference's IndexRegionObserver spy assertions).
# ---------------------------------------------------------------------------


@query(
    "idxtab_and_or_combination",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1, c2, c3, c4 FROM idxtab
        WHERE (c1 = 'a' OR c2 = 'b') AND c3 = 'c' AND c4 = 'b'
          AND c5 >= 'a' AND c6 >= 'a'""",
)
def q_idxtab_and_or_combination(spark, sf_dir):
    """testAndOrCombinationWithMultipleIndices
    (TestMultipleIndicesInScan.java:112-210): a master AND over an OR
    branch plus equality and range conjuncts. The OR unions idx2(c1) and
    idx3(c2); the (c3,c4,c5) conjuncts ride idx1's equality-prefix+range;
    the trailing c6 range is past idx1's usable prefix and stays a
    residual predicate."""
    t = _idxtab(spark)
    f = fl.FilterList(
        "AND",
        [
            fl.FilterList("OR", [_scvf("c1", fl.EQUAL, "a"), _scvf("c2", fl.EQUAL, "b")]),
            fl.FilterList("AND", [_scvf("c3", fl.EQUAL, "c"), _scvf("c4", fl.EQUAL, "b")]),
            fl.FilterList(
                "AND",
                [_scvf("c5", fl.GREATER_OR_EQUAL, "a"), _scvf("c6", fl.GREATER_OR_EQUAL, "a")],
            ),
        ],
    )
    out = t.scan(Scan(filter=f, columns=["c1", "c2", "c3", "c4"]))
    assert set(t.last_index_plan.used_indexes) == {"idx1", "idx2", "idx3"}, (
        t.last_index_plan.used_indexes
    )
    return out


@query(
    "idxtab_equal_range_combination",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1, c2, c3 FROM idxtab
        WHERE c1 = 'b' AND c2 = 'c' AND (c1 >= 'a' OR c3 >= 'd')""",
)
def q_idxtab_equal_range_combination(spark, sf_dir):
    """testEqualAndRangeCombinationWithMultipleIndices
    (TestMultipleIndicesInScan.java:1538-1620): equality conjuncts AND an
    OR of ranges. The equalities set-cover to idx4(c2,c1) alone; the OR
    branch unions idx2(c1 range) with idx1(c3 range on its first
    column) — a range on a multi-column index's FIRST column is a usable
    (single-column) prefix."""
    t = _idxtab(spark)
    f = fl.FilterList(
        "AND",
        [
            _scvf("c1", fl.EQUAL, "b"),
            _scvf("c2", fl.EQUAL, "c"),
            fl.FilterList(
                "OR",
                [_scvf("c1", fl.GREATER_OR_EQUAL, "a"), _scvf("c3", fl.GREATER_OR_EQUAL, "d")],
            ),
        ],
    )
    out = t.scan(Scan(filter=f, columns=["c1", "c2", "c3"]))
    plan = t.last_index_plan
    assert "idx4" in plan.used_indexes and "idx1" in plan.used_indexes, plan.used_indexes
    return out


@query(
    "idxtab_or_all_range",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1, c2, c3 FROM idxtab
        WHERE c1 > 'b' OR c2 <= 'c' OR (c1 >= 'a' AND c2 <= 'e' AND c3 >= 'a')""",
)
def q_idxtab_or_all_range(spark, sf_dir):
    """testIfAllScannersAreRangeInAllLevels
    (TestMultipleIndicesInScan.java:1793-1876): every leaf in every level
    is a RANGE (no equality anywhere) — still fully indexable; OR
    requires every branch to plan (all-or-nothing) and each range rides
    its narrowest index."""
    t = _idxtab(spark)
    f = fl.FilterList(
        "OR",
        [
            _scvf("c1", fl.GREATER, "b"),
            _scvf("c2", fl.LESS_OR_EQUAL, "c"),
            fl.FilterList(
                "AND",
                [
                    _scvf("c1", fl.GREATER_OR_EQUAL, "a"),
                    _scvf("c2", fl.LESS_OR_EQUAL, "e"),
                    _scvf("c3", fl.GREATER_OR_EQUAL, "a"),
                ],
            ),
        ],
    )
    out = t.scan(Scan(filter=f, columns=["c1", "c2", "c3"]))
    assert t.last_index_plan.uses_index
    return out


@query(
    "idxtab_or_poisoned_branch",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1 FROM idxtab WHERE c1 = 'a' OR rowkey = 'row010'""",
)
def q_idxtab_or_poisoned_branch(spark, sf_dir):
    """testORIfEachBranchHavingAtleastOneOtherFilterThanSCVF
    (TestMultipleIndicesInScan.java:1982-2006, asserts NO index): OR is
    all-or-nothing — one branch that cannot ride an index (a RowFilter)
    poisons the whole OR, which falls back to a full scan. Rows must
    still be correct through the fallback path."""
    t = _idxtab(spark)
    f = fl.FilterList(
        "OR",
        [
            _scvf("c1", fl.EQUAL, "a"),
            fl.RowFilter(fl.EQUAL, fl.BinaryComparator("row010")),
        ],
    )
    out = t.scan(Scan(filter=f, columns=["c1"]))
    assert not t.last_index_plan.uses_index
    return out


@query(
    "idxtab_and_with_poisoned_or",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1, c2 FROM idxtab
        WHERE c2 = 'b' AND (c1 = 'a' OR rowkey = 'row010')""",
)
def q_idxtab_and_with_poisoned_or(spark, sf_dir):
    """testANDhavingORbranchWithOtherFilterThanSCVF
    (TestMultipleIndicesInScan.java:2170-2258, asserts index IS used):
    under AND, a non-indexable OR branch degrades to a residual
    predicate while the indexable conjunct (c2) still drives an index
    seek — the asymmetric twin of idxtab_or_poisoned_branch."""
    t = _idxtab(spark)
    f = fl.FilterList(
        "AND",
        [
            _scvf("c2", fl.EQUAL, "b"),
            fl.FilterList(
                "OR",
                [
                    _scvf("c1", fl.EQUAL, "a"),
                    fl.RowFilter(fl.EQUAL, fl.BinaryComparator("row010")),
                ],
            ),
        ],
    )
    out = t.scan(Scan(filter=f, columns=["c1", "c2"]))
    plan = t.last_index_plan
    assert plan.uses_index and plan.used_indexes == ["idx3"], plan.used_indexes
    return out


@query(
    "idxtab_range_not_last",
    f"""WITH {_values_cte()}
        SELECT rowkey, c3, c4 FROM idxtab
        WHERE c3 >= 'b' AND c3 < 'e' AND c4 = 'a'""",
)
def q_idxtab_range_not_last(spark, sf_dir):
    """ScanFilterEvaluator.java:452-462 usable-prefix rule, exercised by
    the combination suite: once a RANGE column is consumed the index
    prefix ENDS — the equality on c4 behind c3's range cannot extend
    idx1's scan and must be applied as a residual predicate (asserted:
    only c3 is covered)."""
    t = _idxtab(spark)
    f = fl.FilterList(
        "AND",
        [
            _scvf("c3", fl.GREATER_OR_EQUAL, "b"),
            _scvf("c3", fl.LESS, "e"),
            _scvf("c4", fl.EQUAL, "a"),
        ],
    )
    out = t.scan(Scan(filter=f, columns=["c3", "c4"]))
    plan = t.last_index_plan
    assert plan.used_indexes == ["idx1"], plan.used_indexes
    assert plan.root.covered_columns == ["c3"], plan.root.covered_columns
    return out


@query(
    "idxtab_multilevel_or",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1, c2 FROM idxtab
        WHERE c1 >= 'e' OR c1 <= 'a' OR c2 = 'b' OR c2 = 'c'""",
)
def q_idxtab_multilevel_or(spark, sf_dir):
    """testOREvaluatorWithMultipleOperatorsInEachLevel
    (TestMultipleIndicesInScan.java:1708-1791): nested ORs with several
    operators per level flatten into one union; multiple disjoint bounds
    on the SAME column become separate index scans on the same index
    (idx2 twice, idx3 twice), not a merged range."""
    t = _idxtab(spark)
    f = fl.FilterList(
        "OR",
        [
            _scvf("c1", fl.GREATER_OR_EQUAL, "e"),
            _scvf("c1", fl.LESS_OR_EQUAL, "a"),
            fl.FilterList("OR", [_scvf("c2", fl.EQUAL, "b"), _scvf("c2", fl.EQUAL, "c")]),
        ],
    )
    out = t.scan(Scan(filter=f, columns=["c1", "c2"]))
    assert set(t.last_index_plan.used_indexes) == {"idx2", "idx3"}
    return out


# -- similar-value-pattern fixture (padded-value regression) ----------------

SIM_ROWS = [
    ("row0", "aaa"),
    ("row9", "aaa1"),
    ("row1", "aaa3"),
    ("row3", "aaa4"),
    ("row7", "aaa5"),
]


def _sim_cte() -> str:
    rows_sql = ", ".join(f"('{r}', '{v}')" for r, v in SIM_ROWS)
    return f"simtab(rowkey, c1) AS (SELECT * FROM (VALUES {rows_sql}))"


@query(
    "idxtab_similar_value_pattern",
    f"""WITH {_sim_cte()}
        SELECT rowkey, c1 FROM simtab WHERE c1 = 'aaa'""",
)
def q_idxtab_similar_value_pattern(spark, sf_dir):
    """testAndOperationWithSimilarValuePattern
    (TestMultipleIndicesInScan.java:551-599): values sharing a common
    prefix ('aaa', 'aaa1', 'aaa3'...) — the reference's fixed-width
    padded index encoding must not prefix-match 'aaa' to 'aaa1'; exactly
    one row may come back through the index seek."""
    df = spark.createDataFrame(SIM_ROWS, ["rowkey", "c1"])
    t = Table(df, "rowkey", "simtab")
    t.create_index(IndexSpecification("idx1").add_column("c1"))
    out = t.scan(Scan(filter=_scvf("c1", fl.EQUAL, "aaa"), columns=["c1"]))
    assert t.last_index_plan.used_indexes == ["idx1"]
    return out


# -- negative typed-value fixture (ValueType encoding regression) -----------
# testShouldRetrieveNegative{Int,Float,Double}Value* (TestMultipleIndicesInScan
# .java:2720-3006): the reference's typed index encoding must sign-flip so
# negative values ORDER correctly in the index rowkey; these gates prove the
# same comparisons hold through this engine's typed index scans.

NEG_ROWS = [
    ("row0", 1, 1.5, 1.5),
    ("row1", 2, 2.89, 2.89),
    ("row2", 3, 3.9, 3.9),
    ("row3", -4, -4.7, -4.7),
    ("row4", -5, -5.3, -5.3),
    ("row5", -6, -6.456, -6.456),
]


def _neg_cte() -> str:
    rows_sql = ", ".join(f"('{r}', {i}, {f}, {d})" for r, i, f, d in NEG_ROWS)
    return (
        "negtab(rowkey, ci, cf, cd) AS "
        f"(SELECT rowkey, CAST(ci AS INTEGER), CAST(cf AS FLOAT), CAST(cd AS DOUBLE) "
        f"FROM (VALUES {rows_sql}) t(rowkey, ci, cf, cd))"
    )


def _negtab(spark) -> Table:
    df = spark.createDataFrame(NEG_ROWS, "rowkey string, ci int, cf float, cd double")
    t = Table(df, "rowkey", "negtab")
    t.create_index(IndexSpecification("idx_int").add_column("ci", "Int"))
    t.create_index(IndexSpecification("idx_float").add_column("cf", "Float"))
    t.create_index(IndexSpecification("idx_double").add_column("cd", "Double"))
    return t


@query(
    "idxtab_negative_int_eq",
    f"WITH {_neg_cte()} SELECT rowkey, ci FROM negtab WHERE ci = -4",
)
def q_idxtab_negative_int_eq(spark, sf_dir):
    """testShouldRetrieveNegtiveIntValueWithEqualCondition (:2720):
    equality on a negative Int through the typed index — exactly row3."""
    t = _negtab(spark)
    out = t.scan(Scan(filter=_scvf("ci", fl.EQUAL, -4), columns=["ci"]))
    assert t.last_index_plan.used_indexes == ["idx_int"]
    return out


@query(
    "idxtab_negative_int_range",
    f"WITH {_neg_cte()} SELECT rowkey, ci FROM negtab WHERE ci > -6",
)
def q_idxtab_negative_int_range(spark, sf_dir):
    """testShouldRetriveNegativeIntValueWithGreaterCondition (:2786):
    a range crossing the sign boundary — naive byte-comparison encodings
    would order -6 ABOVE positives and return the wrong set."""
    t = _negtab(spark)
    out = t.scan(Scan(filter=_scvf("ci", fl.GREATER, -6), columns=["ci"]))
    assert t.last_index_plan.used_indexes == ["idx_int"]
    return out


@query(
    "idxtab_negative_float_range",
    f"WITH {_neg_cte()} SELECT rowkey, cf FROM negtab WHERE cf > CAST(-5.0 AS FLOAT)",
)
def q_idxtab_negative_float_range(spark, sf_dir):
    """testShouldRetrieveNegativeFloatValueWithGreaterCondition (:2845):
    4 rows (1.5, 2.89, 3.9, -4.7) — IEEE float order through the index."""
    t = _negtab(spark)
    out = t.scan(Scan(filter=_scvf("cf", fl.GREATER, -5.0), columns=["cf"]))
    assert t.last_index_plan.used_indexes == ["idx_float"]
    return out


@query(
    "idxtab_negative_double_le",
    f"WITH {_neg_cte()} SELECT rowkey, cd FROM negtab WHERE cd <= -4.7",
)
def q_idxtab_negative_double_le(spark, sf_dir):
    """testShouldRetrieveNegativeDoubleValueWithLesserThanEqualsCondition
    (:2942): inclusive boundary on a negative Double — 3 rows."""
    t = _negtab(spark)
    out = t.scan(Scan(filter=_scvf("cd", fl.LESS_OR_EQUAL, -4.7), columns=["cd"]))
    assert t.last_index_plan.used_indexes == ["idx_double"]
    return out


@query(
    "idxtab_complex_range_or",
    """WITH ctab AS (
         SELECT 'row' || i AS rowkey,
                CAST(i AS VARCHAR) AS detail,
                CAST(1000 - i AS VARCHAR) AS info,
                CAST(i % 100 AS VARCHAR) AS val
         FROM range(1, 1000) t(i))
       SELECT rowkey, detail, info, val FROM ctab
       WHERE detail <= '6' OR info >= '992' OR val = '9'""",
)
def q_idxtab_complex_range_or(spark, sf_dir):
    """testComplexRangeScan (TestMultipleIndicesInScan.java:3213): a
    3-branch OR of STRING-typed comparisons over numeric strings — the
    comparisons are LEXICOGRAPHIC ('599' <= '6' but '60' > '6'), each
    branch rides its own single-column index, and the union must hit
    the reference's exact 563 rows."""
    df = spark.range(1, 1000).select(
        F.concat(F.lit("row"), F.col("id")).alias("rowkey"),
        F.col("id").cast("string").alias("detail"),
        (1000 - F.col("id")).cast("string").alias("info"),
        (F.col("id") % 100).cast("string").alias("val"),
    )
    t = Table(df, "rowkey", "ctab")
    t.create_index(IndexSpecification("idx1").add_column("detail"))
    t.create_index(IndexSpecification("idx2").add_column("info"))
    t.create_index(IndexSpecification("idx3").add_column("val"))
    f = fl.FilterList(
        "OR",
        [
            _scvf("detail", fl.LESS_OR_EQUAL, "6"),
            _scvf("info", fl.GREATER_OR_EQUAL, "992"),
            _scvf("val", fl.EQUAL, "9"),
        ],
    )
    out = t.scan(Scan(filter=f, columns=["detail", "info", "val"]))
    assert set(t.last_index_plan.used_indexes) == {"idx1", "idx2", "idx3"}
    assert out.count() == 563  # the reference's literal assertion
    return out


@query(
    "idxtab_partial_put",
    f"""WITH {_values_cte()},
        after AS (
          SELECT rowkey, c1,
                 CASE WHEN rowkey < 'row040' THEN 'z' ELSE c2 END AS c2
          FROM idxtab)
        SELECT rowkey, c1, c2 FROM after
        WHERE c2 = 'z' AND c1 = 'a'""",
)
def q_idxtab_partial_put(spark, sf_dir):
    """Partial-column put under a multi-column index
    (TestIndexRegionObserver.testIndexOnMultipleCols:233 — row2's put
    carries only some indexed columns; TestExtendedPutOps partial-put
    suites): a put touching ONLY c2 must leave idx4(c2, c1) entries that
    pair the NEW c2 with the row's CURRENT c1 — i.e. the index row is
    re-derived from the merged state, not from the put's cells alone. The
    proof is the scan: (c2='z' AND c1='a') through idx4 can only find
    rows whose entries carry both the fresh c2 and the pre-existing c1."""
    t = _idxtab(spark)
    keys = [r[0] for r in ROWS[:40]]
    puts = spark.createDataFrame([(k, "z") for k in keys], "rowkey string, c2 string")
    t2 = t.put(puts)
    f = fl.FilterList("AND", [_scvf("c2", fl.EQUAL, "z"), _scvf("c1", fl.EQUAL, "a")])
    out = t2.scan(Scan(filter=f, columns=["c1", "c2"]))
    assert t2.last_index_plan.used_indexes == ["idx4"], t2.last_index_plan.used_indexes
    return out


@query(
    "idxtab_family_delete_index",
    f"""WITH {_values_cte()},
        famtab AS (
          SELECT rowkey, c1 AS f1_c1, c2 AS f1_c2, c3 AS f2_c3, c4 AS f2_c4
          FROM idxtab),
        after AS (
          SELECT rowkey,
                 CASE WHEN rowkey < 'row030' THEN NULL ELSE f1_c1 END AS f1_c1,
                 f2_c3, f2_c4
          FROM famtab
          WHERE NOT (rowkey < 'row030' AND f2_c3 IS NULL AND f2_c4 IS NULL))
        SELECT 'via_xf' AS src, rowkey, f2_c3, f1_c1 FROM after WHERE f2_c3 = 'd'
        UNION ALL
        SELECT 'via_f1' AS src, rowkey, f2_c3, f1_c1 FROM after WHERE f1_c1 = 'a'
        UNION ALL
        SELECT 'all' AS src, rowkey, CAST(NULL AS VARCHAR) AS f2_c3,
               CAST(NULL AS VARCHAR) AS f1_c1 FROM after""",
)
def q_idxtab_family_delete(spark, sf_dir):
    """Family-level delete under an index spanning two families
    (IndexRegionObserver.getIndexDeletes:243-286 + doGetAndGroupByTS:288
    — the reference reads the current row to find which index entries to
    tombstone). Deleting family f1 must: drop idx_f1(f1_c1) entries for
    the affected rows (leading column cleared); keep rows reachable via
    idx_xf(f2_c3, f1_c1) whose f2 data survives (the index stays a
    projection of current state); and remove rows wholesale when the
    delete cleared their last cells (a row IS its cells). Three branches:
    scan via each index + the full row inventory."""
    df = spark.createDataFrame(ROWS, _COLS).select(
        "rowkey",
        F.col("c1").alias("f1_c1"),
        F.col("c2").alias("f1_c2"),
        F.col("c3").alias("f2_c3"),
        F.col("c4").alias("f2_c4"),
    )
    t = Table(df, "rowkey", "famtab")
    t.create_index(
        IndexSpecification("idx_xf").add_column("f2_c3").add_column("f1_c1")
    )
    t.create_index(IndexSpecification("idx_f1").add_column("f1_c1"))
    keys = df.filter(F.col("rowkey") < "row030").select("rowkey")
    t2 = t.delete_family(keys, "f1")
    s1 = t2.scan(Scan(filter=_scvf("f2_c3", fl.EQUAL, "d"), columns=["f2_c3", "f1_c1"]))
    assert t2.last_index_plan.used_indexes == ["idx_xf"], t2.last_index_plan.used_indexes
    s2 = t2.scan(Scan(filter=_scvf("f1_c1", fl.EQUAL, "a"), columns=["f2_c3", "f1_c1"]))
    assert t2.last_index_plan.used_indexes == ["idx_f1"], t2.last_index_plan.used_indexes
    null_s = F.lit(None).cast("string")
    return (
        s1.select(F.lit("via_xf").alias("src"), "rowkey", "f2_c3", "f1_c1")
        .unionByName(s2.select(F.lit("via_f1").alias("src"), "rowkey", "f2_c3", "f1_c1"))
        .unionByName(
            t2.df.select(
                F.lit("all").alias("src"),
                "rowkey",
                null_s.alias("f2_c3"),
                null_s.alias("f1_c1"),
            )
        )
    )


@query(
    "idxtab_checkand_index",
    f"""WITH {_values_cte()},
        after1 AS (
          SELECT rowkey,
                 CASE WHEN rowkey < 'row060' AND c1 = 'a' THEN 'z' ELSE c1 END AS c1,
                 c2
          FROM idxtab),
        after2 AS (
          SELECT rowkey, c1, c2 FROM after1
          WHERE c2 IS NULL OR c2 <> 'b')
        SELECT 'via_z' AS src, rowkey, c1, c2 FROM after2 WHERE c1 = 'z'
        UNION ALL
        SELECT 'via_a' AS src, rowkey, c1, c2 FROM after2 WHERE c1 = 'a'
        UNION ALL
        SELECT 'all' AS src, rowkey, CAST(NULL AS VARCHAR) AS c1,
               CAST(NULL AS VARCHAR) AS c2 FROM after2""",
)
def q_idxtab_checkand_index(spark, sf_dir):
    """checkAndPut / checkAndDelete must maintain the index like plain
    mutations (TestIndexRegionObserver.testCheckAndPutFor1PutShouldHav2PutsInIndexTableAndShouldReplaceWithNewValue:1263,
    testCheckAndDeleteShudDeleteTheRowSuccessfullyInBothIndexAndMainTable:1355):
    a successful checkAndPut REPLACES the old index entry (the old value
    is no longer reachable through the index, the new one is); a
    successful checkAndDelete removes the row from main AND index. The
    scan through idx2 proves both: c1='z' finds exactly the check-passed
    rows, c1='a' finds only rows outside the checked key range, and the
    full inventory pins the deletes."""
    t = _idxtab(spark)
    keys = [r[0] for r in ROWS[:60]]
    puts = spark.createDataFrame([(k, "z") for k in keys], "rowkey string, c1 string")
    t2 = t.check_and_put("c1", fl.EQUAL, "a", puts)
    all_keys = spark.createDataFrame([(r[0],) for r in ROWS], "rowkey string")
    t3 = t2.check_and_delete("c2", fl.EQUAL, "b", all_keys)
    s1 = t3.scan(Scan(filter=_scvf("c1", fl.EQUAL, "z"), columns=["c1", "c2"]))
    assert t3.last_index_plan.used_indexes == ["idx2"], t3.last_index_plan.used_indexes
    s2 = t3.scan(Scan(filter=_scvf("c1", fl.EQUAL, "a"), columns=["c1", "c2"]))
    assert t3.last_index_plan.used_indexes == ["idx2"], t3.last_index_plan.used_indexes
    null_s = F.lit(None).cast("string")
    return (
        s1.select(F.lit("via_z").alias("src"), "rowkey", "c1", "c2")
        .unionByName(s2.select(F.lit("via_a").alias("src"), "rowkey", "c1", "c2"))
        .unionByName(
            t3.df.select(
                F.lit("all").alias("src"), "rowkey", null_s.alias("c1"), null_s.alias("c2")
            )
        )
    )


@query(
    "idxtab_multi_index_put",
    f"""WITH {_values_cte()},
        after AS (
          SELECT rowkey,
                 CASE WHEN rowkey < 'row020' THEN 'y' ELSE c1 END AS c1,
                 CASE WHEN rowkey < 'row020' THEN 'x' ELSE c2 END AS c2
          FROM idxtab
          UNION ALL SELECT 'row900', 'e', NULL
          UNION ALL SELECT 'row901', NULL, NULL)
        SELECT 'via_y' AS src, rowkey, c1, c2 FROM after WHERE c1 = 'y'
        UNION ALL
        SELECT 'via_x' AS src, rowkey, c1, c2 FROM after WHERE c2 = 'x'
        UNION ALL
        SELECT 'via_e' AS src, rowkey, c1, c2 FROM after WHERE c1 = 'e'
        UNION ALL
        SELECT 'via_pair' AS src, rowkey, c1, c2 FROM after
        WHERE c2 = 'x' AND c1 = 'y'
        UNION ALL
        SELECT 'all' AS src, rowkey, CAST(NULL AS VARCHAR) AS c1,
               CAST(NULL AS VARCHAR) AS c2 FROM after""",
)
def q_idxtab_multi_index_put(spark, sf_dir):
    """One put maintaining SEVERAL indices at once + puts with and
    without indexed columns (TestIndexRegionObserver.testMultipleIndicesOnUniqueColumns:195,
    testPutWithAndWithoutTheIndexedColumn:114): a single put batch
    updating c1 and c2 must refresh idx2(c1), idx3(c2) AND idx4(c2,c1)
    together; a new row carrying only c1 is reachable through idx2 but
    invisible to idx3; a row put with NO indexed columns exists in the
    main table yet creates no index entry (only the inventory sees it)."""
    t = _idxtab(spark)
    keys = [r[0] for r in ROWS[:20]]
    puts = spark.createDataFrame(
        [(k, "y", "x") for k in keys] + [("row900", "e", None), ("row901", None, None)],
        "rowkey string, c1 string, c2 string",
    )
    t2 = t.put(puts)
    s_y = t2.scan(Scan(filter=_scvf("c1", fl.EQUAL, "y"), columns=["c1", "c2"]))
    assert t2.last_index_plan.used_indexes == ["idx2"], t2.last_index_plan.used_indexes
    s_x = t2.scan(Scan(filter=_scvf("c2", fl.EQUAL, "x"), columns=["c1", "c2"]))
    assert t2.last_index_plan.used_indexes == ["idx3"], t2.last_index_plan.used_indexes
    s_e = t2.scan(Scan(filter=_scvf("c1", fl.EQUAL, "e"), columns=["c1", "c2"]))
    assert t2.last_index_plan.used_indexes == ["idx2"], t2.last_index_plan.used_indexes
    pair = fl.FilterList("AND", [_scvf("c2", fl.EQUAL, "x"), _scvf("c1", fl.EQUAL, "y")])
    s_p = t2.scan(Scan(filter=pair, columns=["c1", "c2"]))
    assert t2.last_index_plan.used_indexes == ["idx4"], t2.last_index_plan.used_indexes
    null_s = F.lit(None).cast("string")
    out = s_y.select(F.lit("via_y").alias("src"), "rowkey", "c1", "c2")
    for tag, s in (("via_x", s_x), ("via_e", s_e), ("via_pair", s_p)):
        out = out.unionByName(s.select(F.lit(tag).alias("src"), "rowkey", "c1", "c2"))
    return out.unionByName(
        t2.df.select(
            F.lit("all").alias("src"), "rowkey", null_s.alias("c1"), null_s.alias("c2")
        )
    )


@query(
    "idxtab_stale_index",
    f"""WITH {_values_cte()}
        SELECT rowkey, c1 FROM idxtab WHERE c1 = 'zz'
        UNION ALL
        SELECT rowkey, c1 FROM idxtab WHERE c1 = 'a'""",
)
def q_idxtab_stale_index(spark, sf_dir):
    """Stale/poisoned index entries must yield ZERO phantom rows
    (TestIndexRegionObserverForScan.testScanShouldNotRetreiveRowsIfRows
    ArePresentOnlyInIndexedTableAndNotInMainTable:486): the main scan
    re-verifies every seek point, so an index entry pointing at a
    missing row, or at a row whose current value no longer matches,
    contributes nothing. The gate poisons idx2 with BOTH kinds of junk
    ('zz' -> nonexistent rowkey; 'zz' -> live row whose c1 is not 'zz';
    'a' -> rowkey outside the table) and scans both values: 'zz' must
    return empty, 'a' must return exactly the true c1='a' rows — all
    through the index flow (used_indexes asserted)."""
    t = _idxtab(spark)
    poison = spark.createDataFrame(
        [("zz", "rowNONE"), ("zz", "row000"), ("a", "rowGHOST")],
        ["c1", "rowkey"],
    )
    t.index_tables["idx2"] = t.index_tables["idx2"].unionByName(poison)
    s_zz = t.scan(Scan(filter=_scvf("c1", fl.EQUAL, "zz"), columns=["c1"]))
    assert t.last_index_plan.used_indexes == ["idx2"], t.last_index_plan.used_indexes
    s_a = t.scan(Scan(filter=_scvf("c1", fl.EQUAL, "a"), columns=["c1"]))
    assert t.last_index_plan.used_indexes == ["idx2"], t.last_index_plan.used_indexes
    return s_zz.unionByName(s_a)
