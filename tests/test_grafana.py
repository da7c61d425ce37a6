"""Grafana JSON-datasource façade (reference al_grafana.py): SQL built
from panel payloads, timeserie/table reply shapes, HTTP round-trip."""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from datetime import datetime

import pytest

from edgelake_spark.api.grafana import (
    build_target_sql,
    format_table,
    format_timeseries,
    parse_interval,
)
from tests.conftest import SF_DIR


def test_parse_interval():
    assert parse_interval("30s") == ("second", 30)
    assert parse_interval("5m") == ("minute", 5)
    assert parse_interval("2h") == ("hour", 2)
    assert parse_interval("1d") == ("day", 1)
    assert parse_interval("500ms") == ("second", 1)
    assert parse_interval("") == ("minute", 1)


def test_build_default_timeseries_sql():
    sql, table, ts = build_target_sql(
        {"target": "events", "type": "timeseries"},
        "2024-01-01T00:00:00Z",
        "2024-01-02T00:00:00.000Z",
        "1h",
    )
    assert ts and table == "events"
    assert sql.startswith("select increments(hour, 1, ts), max(ts) as timestamp")
    assert "avg(value) as avg_val" in sql
    assert "ts >= '2024-01-01 00:00:00' and ts <= '2024-01-02 00:00:00'" in sql


def test_build_payload_overrides():
    sql, table, ts = build_target_sql(
        {
            "target": "x",
            "payload": {
                "dbms": "db",
                "table": "lineitem",
                "time_column": "l_shipdate",
                "value_column": "l_quantity",
                "functions": ["sum"],
                "where": "l_returnflag = 'R'",
                "data_points": 200,
            },
        },
        "2024-01-01T00:00:00Z",
        "2024-06-01T00:00:00Z",
        "1h",
    )
    assert table == "db.lineitem"
    assert sql.startswith("select increments(l_shipdate, 200)")
    assert "sum(l_quantity) as sum_val" in sql
    assert "(l_returnflag = 'R')" in sql


def test_build_period_and_table_sql():
    sql, _, ts = build_target_sql(
        {"target": "events", "payload": {"type": "period"}},
        "2024-01-01T00:00:00Z",
        "2024-01-02T00:00:00Z",
        "10m",
    )
    assert ts and "period(minute, 10, '2024-01-02 00:00:00', ts)" in sql
    sql, _, ts = build_target_sql(
        {"target": "events", "type": "table", "payload": {"columns": ["event_id", "value"]}},
        "2024-01-01T00:00:00Z",
        "2024-01-02T00:00:00Z",
        "1h",
        500,
    )
    assert not ts
    assert sql.startswith("select event_id, value from events")
    assert sql.endswith("order by ts limit 500")


def test_build_period_applies_where_and_limit():
    # the payload's extra filter must ride inside period(...) as the 5th
    # argument (reference al_grafana.py:2251) and the limit must apply
    sql, _, ts = build_target_sql(
        {
            "target": "events",
            "payload": {"type": "period", "where": "event_type = 'error'", "limit": 7},
        },
        "2024-01-01T00:00:00Z",
        "2024-01-02T00:00:00Z",
        "10m",
    )
    assert ts
    assert (
        "period(minute, 10, '2024-01-02 00:00:00', ts, and (event_type = 'error'))"
        in sql
    )
    assert sql.endswith(" limit 7")


def test_format_timeseries_shapes():
    rows = [
        (datetime(2024, 1, 1, 0, 0, 0), "b0", 1.5, 3.0),
        (datetime(2024, 1, 1, 1, 0, 0), "b1", 2.5, 4.0),
    ]
    series = format_timeseries(
        "events", ["timestamp", "h_trunc", "avg_val", "max_val"], rows
    )
    assert [s["target"] for s in series] == ["events.avg_val", "events.max_val"]
    pts = series[0]["datapoints"]
    assert pts[0][0] == 1.5 and pts[0][1] == 1704067200000.0
    assert pts[1][1] > pts[0][1]


def test_format_table_types():
    out = format_table(
        ["ts", "n", "s"], [(datetime(2024, 1, 1), 3, "x"), (None, None, None)]
    )
    cols = out[0]["columns"]
    assert [c["type"] for c in cols] == ["time", "number", "string"]
    assert out[0]["rows"][0][0] == "2024-01-01T00:00:00"


@pytest.fixture(scope="module")
def rest_engine(spark):
    from edgelake_spark.api.rest import EdgeLakeRestServer
    from edgelake_spark.engine import EdgeLakeEngine

    eng = EdgeLakeEngine(spark, SF_DIR, now=datetime(2024, 2, 1))
    server = EdgeLakeRestServer(eng).start()
    yield server
    server.stop()


def _post(port: int, path: str, body: dict):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def test_grafana_http_roundtrip(rest_engine):
    tables = _post(rest_engine.port, "/search", {})
    assert "events" in tables

    body = {
        "range": {"from": "2024-01-01T00:00:00Z", "to": "2024-02-01T00:00:00Z"},
        "interval": "6h",
        "targets": [{"target": "events", "type": "timeseries"}],
    }
    series = _post(rest_engine.port, "/query", body)
    assert {s["target"] for s in series} == {
        "events.avg_val", "events.min_val", "events.max_val"
    }
    pts = series[0]["datapoints"]
    assert len(pts) > 10  # a month of 6h buckets
    assert all(p[1] >= 1704067200000.0 for p in pts)
    # monotone x-axis (reference sorts series points by time)
    assert pts == sorted(pts, key=lambda p: p[1])

    # table target through the same endpoint
    body["targets"] = [
        {"target": "events", "type": "table", "payload": {"columns": ["event_id", "value"]}}
    ]
    out = _post(rest_engine.port, "/query", body)
    assert out[0]["type"] == "table"
    assert [c["text"] for c in out[0]["columns"]] == ["event_id", "value"]
    assert len(out[0]["rows"]) > 0


def test_rest_post_topic_publish(rest_engine):
    """POST with a `topic` header routes messages through the registered
    broker consumer's mapping (reference http_server.py:1844-1930) —
    typed rows land in the target table, queryable via the engine."""
    eng = rest_engine.engine
    eng.run(
        "run kafka consumer where ip = 127.0.0.1 and port = 9092 and topic = "
        "(name = readings and dbms = iot and table = meter and "
        'column.ts.timestamp = "bring [ts]" and column.value.float = "bring [v]")'
    )
    req = urllib.request.Request(
        f"http://127.0.0.1:{rest_engine.port}/",
        data=json.dumps(
            [{"ts": "2024-01-01 00:00:00", "v": 1.5}, {"ts": "2024-01-01 00:01:00", "v": 2.5}]
        ).encode(),
        headers={"topic": "readings"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        out = json.loads(resp.read())
    assert out == {"ingested": 2, "table": "iot.meter", "topic": "readings"}
    rows = eng.run('sql iot "select ts, value from meter order by ts"').collect()
    assert [r.value for r in rows] == [1.5, 2.5]
    assert rows[0].ts.isoformat() == "2024-01-01T00:00:00"
    # unknown topic → 400
    req = urllib.request.Request(
        f"http://127.0.0.1:{rest_engine.port}/",
        data=b"{}", headers={"topic": "nope"}, method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
