"""Table registry: maps EdgeLake's ``dbms.table`` namespace onto Spark
temp views over partitioned Parquet.

In EdgeLake a "distributed table" is the same schema hosted by N operator
nodes and a query is the union over hosts (reference
edge_lake/cmd/member_cmd.py:2867 resolve_destination,
edge_lake/dbms/unify_results.py:18-24). Here one logical table is one
(partitioned) dataset; the operator dimension, when needed, is a plain
column (see ``extend`` handling in the dialect layer).
"""

from __future__ import annotations

import os
import weakref

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: tables the driver's testdata ships at every scale factor
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: runtime-settable SQL confs the engine depends on. The driver harness
#: supplies its OWN SparkSession (not our session.get_spark), so every
#: entry point must re-assert these at runtime — round 1's 0/40 gate came
#: from assuming builder-time configs survive into a foreign session.
_REQUIRED_CONFS = {
    # testdata ships timestamp[ns]; Spark has no ns type, so read as
    # int64 and load_parquet converts to microsecond timestamps
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # testdata timestamps are naive (isAdjustedToUTC=false); read them as
    # session-TZ TIMESTAMP (UTC session => same wall-clock values DuckDB
    # sees) instead of TIMESTAMP_NTZ so every time function/cast behaves
    # as one type across the engine
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # oracle value-hashes compare UTC-naive timestamps; a non-UTC
    # session would silently shift every rendered timestamp
    "spark.sql.session.timeZone": "UTC",
    # Arrow batch transfer for the Pandas-UDF slow path
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Assert the engine's required SQL confs on any session at runtime.

    All three are runtime-settable; try/except guards Spark versions
    where a key is absent."""
    for key, value in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            pass


#: session id → sf_dir currently registered. Registration with the SAME
#: dir is idempotent (identical view definitions), so repeat engine
#: constructions skip the per-table schema reads; a different dir
#: re-registers (views must track it).
#: weak keys: a dict keyed by id(spark) could silently skip registration
#: for a brand-new session whose id CPython recycled from a dead one
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, str]" = weakref.WeakKeyDictionary()


def register_sf_tables(spark: SparkSession, sf_dir: str, force: bool = False) -> list[str]:
    """Register every ``<sf_dir>/<name>.parquet`` as a temp view ``name``.

    Reading is lazy; Catalyst prunes columns and pushes filters into the
    Parquet scan, so registering all tables costs nothing until queried.
    """
    ensure_session_confs(spark)
    sf_dir = os.path.abspath(sf_dir)
    if _REGISTERED.get(spark) == sf_dir and not force:
        return [t for t in TESTDATA_TABLES if spark.catalog.tableExists(t)]
    registered = []
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_parquet(spark, path).createOrReplaceTempView(name)
            registered.append(name)
    _REGISTERED[spark] = sf_dir
    return registered


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet, converting timestamp[ns] columns (read as int64
    under spark.sql.legacy.parquet.nanosAsLong) to microsecond
    timestamps. `div 1000` truncates toward zero — the same ns→us
    narrowing DuckDB applies, keeping oracle comparisons exact."""
    ensure_session_confs(spark)
    df = spark.read.parquet(path)
    try:
        arrow_schema = pq.read_schema(path)
    except Exception:
        return df
    for f_ in arrow_schema:
        if str(f_.type).startswith("timestamp[ns") and f_.name in df.columns:
            # integer `div` — double division would lose precision on
            # ~1.7e18 nanosecond values
            df = df.withColumn(f_.name, F.timestamp_micros(F.expr(f"`{f_.name}` div 1000")))
    return df


def resolve_table(spark: SparkSession, name: str) -> DataFrame:
    """Resolve ``dbms.table`` or bare ``table`` to a DataFrame.

    EdgeLake scopes tables by logical dbms (edge_lake/dbms/db_info.py:1207);
    we accept the prefix and fall back to the bare view name, which is how
    the single-catalog Spark world flattens it.
    """
    short = name.split(".")[-1]
    try:
        return spark.table(name)
    except Exception:
        return spark.table(short)


def view_name(name: str) -> str:
    """The Spark-side view name for an EdgeLake ``dbms.table`` reference."""
    return name.split(".")[-1]
