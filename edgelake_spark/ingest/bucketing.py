"""Bucketed tables: co-located joins and aggregations without shuffle.

The reference co-locates by construction — each operator node OWNS its
rows, and the query node unions partials (member_cmd.py:5330
partition_query), so no cross-node join exists to optimize. On Spark
the equivalent at 100 TB is bucketing: writing both join sides bucketed
by the join key (same bucket count) lets SortMergeJoin read
bucket-for-bucket with ZERO Exchange — the single biggest shuffle save
available for repeated big-table joins (fact-to-fact joins, repeated
dedup-pair verification, entity resolution reruns).

Bucketed tables are catalog tables (``saveAsTable``) — bucketing
metadata lives in the session catalog, which is exactly the production
setup (a metastore) on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet catalog table bucketed (and sorted) by
    ``key``. Join/aggregate on ``key`` then needs no shuffle on this
    side; sorting additionally removes the SortMergeJoin sort."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table_name)


def drop_bucketed(spark: SparkSession, table_name: str) -> None:
    """Drop a managed bucketed table (removes its files)."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
