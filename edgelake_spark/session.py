"""SparkSession factory.

Local mode here, but every config is chosen to survive a 1000-executor
cluster at ~100 TB: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), UTC session timezone (EdgeLake stores and compares
timestamps in UTC — reference edge_lake/generic/utils_columns.py:1660 —
and the DuckDB oracle is UTC-naive), Arrow enabled for the Pandas-UDF
slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "edgelake-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores.
    ``shuffle_partitions`` defaults to the core count — at cluster scale
    you would size it to total-cores or rely on AQE coalescing, which is
    enabled here and does the right thing in both regimes.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode = driver-only JVM: size its heap to the machine, or
        # 32 executor threads + checkpointed intermediates GC-thrash
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # explicit System.gc() (bench inter-query cleanup, block-manager
        # housekeeping) must not stop the world for a ~48 GB heap: run it
        # as a concurrent G1 cycle so a timed query never eats a full STW
        # collection triggered by the previous query's cleanup
        .config("spark.driver.extraJavaOptions", "-XX:+ExplicitGCInvokesConcurrent")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata ships timestamp[ns] columns (events.ts); Spark has no
        # nanosecond timestamp type, so read them as int64 and the
        # catalog converts to microsecond timestamps (truncating,
        # exactly like DuckDB's ns→us read of the same files)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # reliable-checkpoint mode (edgelake_spark/checkpoint.py) writes
        # df.checkpoint() files per barrier; this makes the ContextCleaner
        # delete a checkpoint's files once its RDD is GC'd — the file-form
        # analogue of the localCheckpoint unpersist discipline, without
        # which an iterative job (CC label rounds) accumulates one file
        # set per round until the checkpoint dir fills
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
