"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship EdgeLake-dialect query (increments buckets
over the events stream) at sf0.001.
``queries()`` / ``oracle_sql()`` — the operator inventory from
SURVEY.md §2 plus the training-data operators; see
edgelake_spark/queries.py for the cross-engine determinism conventions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from edgelake_spark.queries import ORACLE_SQL, SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK_QUERIES["el_increments_hour"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(ORACLE_SQL)
