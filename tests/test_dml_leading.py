"""Leading queries (literal substitution) + insert/update/delete on
engine-managed tables."""

from datetime import datetime

import pytest

from edgelake_spark.engine import EdgeLakeEngine
from tests.conftest import SF_DIR


@pytest.fixture()
def engine(spark):
    return EdgeLakeEngine(spark, SF_DIR, now=datetime(2024, 2, 1))


def test_leading_query_substitution(engine):
    # {select max(ts) from events (ts)} runs first; outer sees a literal
    df = engine.run(
        'sql d "select count(*) as n, max(ts) as mx from events '
        "where ts > {select max(ts) from events (ts)} - 1 day\""
    )
    row = df.collect()[0]
    direct = engine.run('sql d "select max(ts) as m from events"').collect()[0].m
    assert row.mx == direct and row.n > 0


def test_leading_query_numeric(engine):
    df = engine.run(
        'sql d "select count(*) as n from events where value > {select max(value) from events (value)}"'
    )
    assert df.collect()[0].n == 0


def test_insert_then_query(engine):
    engine.run("sql d \"insert into mytab (device, value) values ('d1', 1.5)\"")
    engine.run("sql d \"insert into mytab (device, value) values ('d2', 2.5)\"")
    rows = engine.run('sql d "select device, value from mytab order by device"').collect()
    assert [(r.device, r.value) for r in rows] == [("d1", 1.5), ("d2", 2.5)]


def test_insert_into_existing_table_snapshots(engine):
    engine.run("sql d \"insert into events (event_id, event_type) values (99999, 'click')\"")
    n = engine.run('sql d "select count(*) as n from events"').collect()[0].n
    assert n == 1001  # 1000 + 1; snapshot, original parquet untouched


def test_update_and_delete(engine):
    engine.run("sql d \"insert into t2 (k, v) values (1, 10.0)\"")
    engine.run("sql d \"insert into t2 (k, v) values (2, 20.0)\"")
    engine.run('sql d "update t2 set v = v + 1.0 where k = 1"')
    rows = {r.k: r.v for r in engine.run('sql d "select k, v from t2"').collect()}
    assert rows == {1: 11.0, 2: 20.0}
    engine.run('sql d "delete from t2 where k = 2"')
    rows = [r.k for r in engine.run('sql d "select k from t2"').collect()]
    assert rows == [1]


def test_delete_keeps_null_predicate_rows(engine):
    """DELETE removes only rows where the predicate is TRUE; rows where
    it evaluates NULL must survive (r1 verdict item 2)."""
    engine.run('sql d "insert into t3 (k, v) values (1, 10.0)"')
    engine.run('sql d "insert into t3 (k, v) values (2, NULL)"')
    engine.run('sql d "delete from t3 where v > 5.0"')
    rows = [r.k for r in engine.run('sql d "select k from t3 order by k"').collect()]
    assert rows == [2]  # NULL-v row kept, v=10 row deleted


def test_update_swap_uses_pre_update_row(engine):
    """`set a = b, b = a` must swap — every RHS reads the original row."""
    engine.run('sql d "insert into t4 (a, b) values (1, 2)"')
    engine.run('sql d "update t4 set a = b, b = a"')
    row = engine.run('sql d "select a, b from t4"').collect()[0]
    assert (row.a, row.b) == (2, 1)


def test_run_client_prefix(engine):
    """`run client () sql …` — the reference's canonical CLI shape."""
    df = engine.run('run client () sql d "select count(*) as n from events"')
    assert df.collect()[0].n == 1000
