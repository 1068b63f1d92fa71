"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style aggregate over
the engine's scan path) at sf0.001. ``queries()`` / ``oracle_sql()``
expose every implemented operator from SURVEY.md §2 plus the
data-pipeline operators; implementations live in hindex_spark.queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hindex_spark.queries import QUERIES

    return QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hindex_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from hindex_spark.queries import all_oracles

    return all_oracles()
