"""TEST output format (Header/Output/Stat sections) + source= golden
compare — the reference's built-in QA harness format."""

import json
from datetime import datetime

import pytest

from edgelake_spark.engine import EdgeLakeEngine
from edgelake_spark.output import analyze_test_output
from tests.conftest import SF_DIR


@pytest.fixture()
def engine(spark):
    return EdgeLakeEngine(spark, SF_DIR, now=datetime(2024, 2, 1))


QUERY = 'sql d format = test title = qa1 "select event_type, count(*) as n from events group by event_type order by event_type"'


def test_test_format_sections(engine):
    out = engine.run(QUERY)
    assert isinstance(out, str)
    seps = [ln for ln in out.splitlines() if ln.startswith("=====")]
    assert len(seps) == 4  # header box + stat box
    assert "Title:      qa1" in out
    assert "Format:     table" in out
    assert any(ln.startswith("Rows:") for ln in out.splitlines())


def test_golden_compare_pass_and_fail(engine, tmp_path):
    golden = tmp_path / "golden.out"
    cmd = (
        f'sql d format = test title = qa1 dest = file:{golden} '
        '"select event_type, count(*) as n from events group by event_type order by event_type"'
    )
    engine.run(cmd)
    # same query validated against its own golden → Passed
    verdict = json.loads(
        engine.run(
            f'sql d format = test title = qa1 source = {golden} '
            '"select event_type, count(*) as n from events group by event_type order by event_type"'
        )
    )
    assert verdict["result"] == "Passed" and verdict["title"] == "qa1"
    # different query → Failed with a line diff
    verdict = json.loads(
        engine.run(
            f'sql d format = test source = {golden} '
            '"select event_type, count(*) as n from events group by event_type order by event_type desc"'
        )
    )
    assert verdict["result"] == "Failed"
    assert "line" in verdict["reason"] or "Rows" in verdict["reason"]


def test_analyze_ignores_date_and_runtime():
    a = "==============================\nDate:       2024-01-01\n==============================\nrow1\n==============================\nRows:     1\nRun Time: 0.5\n====================="
    b = "==============================\nDate:       2099-09-09\n==============================\nrow1\n==============================\nRows:     1\nRun Time: 9.9\n====================="
    assert analyze_test_output(a, b)["result"] == "Passed"


def test_pass_through_streams_same_bytes(engine):
    """Pass-through queries stream via toLocalIterator; output must be
    byte-identical to the collect path."""
    import json as _json

    cmd = 'sql d format = json "select event_id, event_type from events where event_id < 5"'
    streamed = engine.run(cmd)
    assert engine._last_pass_through
    forced = engine.run(
        'sql d format = json pass_through = false '
        '"select event_id, event_type from events where event_id < 5"'
    )
    assert streamed == forced
    assert len(_json.loads(streamed)["Query"]) == 5


def test_agg_query_not_pass_through(engine):
    engine.run('sql d format = json "select count(*) as n from events"')
    assert not engine._last_pass_through
