"""Skew-handling utilities for 100 TB joins.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting is for the pathological ones — a join key where
one value holds a double-digit percent of the rows (the classic hot
tenant/hot document key) and the other side is too big to broadcast.

``salted_join``: replicate the small side R times, scatter the big side's
hot keys across R salt buckets, join on (key, salt). Cost: small side
xR; benefit: the hot key's rows spread over R tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join ``big`` with ``small`` on ``key`` with the big side salted.

    The big side gets a uniform random salt in [0, salt); the small side
    is exploded across all salt values, so every (key, salt) pair finds
    its match. Result columns = big's + small's (minus the dup key).

    Only inner/left joins are safe: in a right/full join an unmatched
    small-side row would survive once PER SALT VALUE.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): right/full "
            "would duplicate unmatched small-side rows once per salt value"
        )
    big_s = big.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Diagnostic: the n heaviest join keys with their row share —
    run this before deciding a join needs salting."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("rows"))
        .withColumn("share", F.round(F.col("rows") / F.lit(total), 4))
        .orderBy(F.col("rows").desc())
        .limit(n)
    )
