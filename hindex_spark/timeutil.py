"""Physical-timestamp adapters for the events stream table.

The testdata's ``events.ts`` physical type has varied across data
generations: TIMESTAMP(NANOS) (read as epoch-nanos bigint under
``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP(MICROS) with
isAdjustedToUTC=false (read as ``timestamp_ntz``), or plain
``timestamp``.  The engine talks in epoch **microseconds** (the
resolution DuckDB's ``epoch_us`` oracle uses); :func:`ts_micros`
adapts any of those physical types to that contract.

Timezone-independence: an NTZ value is taken at face value via
``timestampdiff`` against the NTZ epoch — no session-timezone cast —
matching DuckDB's ``epoch_us`` on naive timestamps regardless of the
host timezone the driver runs under.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-microseconds (bigint) column for ``df[col]`` whatever its
    physical type (long nanos / timestamp_ntz / timestamp)."""
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise KeyError(f"no column {col!r} in {df.columns}")
    # Backtick-quote the identifier inside F.expr so names with spaces,
    # dots, or reserved words resolve as one column, not a parse error.
    q = "`" + col.replace("`", "``") + "`"
    if dtype in ("bigint", "long"):
        # nanosAsLong read path: epoch NANOS -> micros. This is the one
        # branch that ASSUMES the unit — a bigint column of plain
        # epoch-micros would be silently divided by 1000. The assumption
        # holds for every testdata generation to date (asserted by a
        # magnitude sanity test in test_temporal.py); revisit if the
        # generator ever emits INT64 micros.
        return F.expr(f"{q} div 1000")
    if dtype.startswith("timestamp_ntz"):
        return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {q})")
    if dtype.startswith("timestamp"):
        return F.expr(f"unix_micros({q})")
    raise TypeError(
        f"unsupported timestamp physical type {dtype!r} for {col!r} "
        "(expected epoch-nanos bigint, timestamp_ntz, or timestamp)"
    )


def ts_timestamp(df: DataFrame, col: str = "ts") -> Column:
    """A proper ``timestamp`` column for ``df[col]`` (for windowed /
    watermarked streaming operators), from any physical type."""
    return F.timestamp_micros(ts_micros(df, col))
