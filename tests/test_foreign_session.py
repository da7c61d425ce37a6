"""Regression for round-1's 0/40 gate: the driver harness supplies its
OWN SparkSession without our builder-time configs. The engine must set
every required SQL conf at runtime (catalog.ensure_session_confs), so a
session missing nanosAsLong / running non-UTC still reads the nanos
testdata and produces oracle-identical timestamps.
"""

import pytest

from tests.conftest import SF_DIR


@pytest.fixture()
def hostile_confs(spark):
    """Deliberately mis-configure the shared session like a foreign
    driver session would be, restoring afterwards."""
    saved = {}
    for key, bad in [
        ("spark.sql.legacy.parquet.nanosAsLong", None),  # unset entirely
        ("spark.sql.session.timeZone", "America/New_York"),
    ]:
        saved[key] = spark.conf.get(key, None)
        if bad is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, bad)
    yield spark
    for key, val in saved.items():
        if val is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, val)


def test_register_sf_tables_on_foreign_session(hostile_confs):
    """register_sf_tables must succeed (and read ts as timestamp) even
    when the session lacks nanosAsLong — the exact r1 gate failure."""
    from edgelake_spark import catalog

    spark = hostile_confs
    catalog.register_sf_tables(spark, SF_DIR)
    schema = dict(spark.table("events").dtypes)
    assert schema["ts"] == "timestamp"
    assert spark.table("events").limit(1).count() == 1


def test_engine_query_on_foreign_session(hostile_confs):
    """A timestamp-rendering engine query on the hostile session must
    match the same query on a clean session (UTC restored at init)."""
    from edgelake_spark.engine import EdgeLakeEngine

    spark = hostile_confs
    eng = EdgeLakeEngine(spark, SF_DIR)
    df = eng.query(
        "select event_type, min(ts) as min_ts, max(ts) as max_ts "
        "from events group by event_type order by event_type"
    )
    rows = df.collect()
    assert rows
    # UTC restored ⇒ date_format renders the stored UTC instant
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    rendered = eng.query(
        "select ts::datetime('%Y-%m-%d %H:%M:%S') as s from events order by ts limit 1"
    ).collect()[0][0]
    import duckdb

    oracle = duckdb.sql(
        f"SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert rendered == oracle
