"""One-pass per-column data profiling — the data-quality step every
ingestion pipeline runs before accepting a batch: row/null counts,
distinct counts, and canonical min/max per column, for ANY subset of
columns, in ONE aggregation job (a single scan computes every column's
statistics; the per-column results unpivot driver-free via ``stack``).

NDV is a DataSketches HLL estimate by default (``ndv_lgk=16`` — exact
through ~5k distinct, graceful ~0.5% error beyond; the only answer that
stays one-pass and mergeable at 100 TB). ``exact_ndv=True`` switches to
``count(DISTINCT)`` — Spark computes multiple exact distincts in one
job via expand, at a data-proportional cost — which is what the
oracle-checked gate pins (exact at every scale factor), while the
sketch default carries the documented exactness boundary
(tests/test_pipeline_ops.py pins both).

min/max are CANONICAL STRING representations so one schema serves every
column type deterministically across engines: strings pass through
(binary collation both engines), integers render as digits, fractional
numerics at fixed 6dp (``%.6f`` — the repo's fixed-point convention),
timestamps as epoch micros (via timeutil, physical-type agnostic).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hindex_spark.timeutil import ts_micros

_INT_TYPES = ("tinyint", "smallint", "int", "bigint", "long")


def profile(
    df: DataFrame,
    columns: Optional[List[str]] = None,
    exact_ndv: bool = False,
    ndv_lgk: int = 16,
    pctls: Optional[List[float]] = None,
    pctl_k: int = 4096,
) -> DataFrame:
    """(col_name, n_rows, n_null, ndv, min_repr, max_repr[, pNN...]) —
    one row per profiled column, one aggregation job total.

    ``pctls`` adds a ``pNN`` DOUBLE column per requested quantile,
    computed for NUMERIC/timestamp columns via a KLL sketch (exact
    while the column's row count stays under ``pctl_k`` — the same
    discrete element-at-rank-ceil(p*n) contract as the rollup's
    pctl_col, same documented degradation beyond) and NULL for string
    columns."""
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(cols):
        t = dtypes[c]
        col = F.col(c)
        if t in ("double", "float") or t.startswith("decimal"):
            base = col  # min/max on the VALUE, repr at the edge
            rep = lambda x: F.format_string("%.6f", F.round(x, 6))  # noqa: E731
            sk = F.format_string("%.6f", F.round(col, 6))  # string-keyed
        elif t.startswith("timestamp"):
            base = ts_micros(df, c)
            rep = lambda x: x.cast("string")  # noqa: E731
            sk = base
        elif t in _INT_TYPES or t == "boolean":
            base = col
            rep = lambda x: x.cast("string")  # noqa: E731
            sk = col if t in _INT_TYPES else col.cast("string")
        else:  # string and anything else with a stable cast
            base = col.cast("string")
            rep = lambda x: x  # noqa: E731
            sk = col.cast("string")
        if exact_ndv:
            ndv = F.count_distinct(base)
        else:
            ndv = F.hll_sketch_estimate(
                F.hll_sketch_agg(sk, F.lit(int(ndv_lgk)))
            )
        aggs += [
            F.count(base).alias(f"__n_{i}"),
            ndv.cast("long").alias(f"__d_{i}"),
            rep(F.min(base)).alias(f"__mn_{i}"),
            rep(F.max(base)).alias(f"__mx_{i}"),
        ]
        if pctls:
            numeric = (
                t in ("double", "float") or t.startswith("decimal")
                or t.startswith("timestamp") or t in _INT_TYPES
            )
            for j, q in enumerate(pctls):
                if numeric:
                    aggs.append(
                        F.kll_sketch_get_quantile_double(
                            F.kll_sketch_agg_double(
                                base.cast("double"), F.lit(int(pctl_k))
                            ),
                            F.lit(float(q)),
                        ).alias(f"__q{j}_{i}")
                    )
                else:
                    aggs.append(
                        F.lit(None).cast("double").alias(f"__q{j}_{i}")
                    )
    row = df.agg(*aggs)
    qnames = [f"p{int(round(q * 100))}" for q in (pctls or ())]
    stacked = ", ".join(
        f"'{c}', __n_{i}, __d_{i}, __mn_{i}, __mx_{i}"
        + "".join(f", __q{j}_{i}" for j in range(len(qnames)))
        for i, c in enumerate(cols)
    )
    return row.select(
        F.col("__total"),
        F.expr(
            f"stack({len(cols)}, {stacked}) as (col_name, __n, ndv, "
            f"min_repr, max_repr{''.join(', ' + q for q in qnames)})"
        ),
    ).select(
        "col_name",
        F.col("__n").cast("long").alias("n_rows"),
        (F.col("__total") - F.col("__n")).cast("long").alias("n_null"),
        "ndv", "min_repr", "max_repr", *qnames,
    )
