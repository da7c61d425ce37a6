"""Operator node (`run operator`, ingest/operator.py) and the round-5
command batch: delete archive, flush buffers, connect/disconnect dbms,
drop table, drop policy. Reference: members/aloperator.py,
member_cmd.py:21740/17312/21420/20899."""

from __future__ import annotations

import gzip
import json
from datetime import datetime

import pytest

from edgelake_spark.engine import EdgeLakeEngine

NOW = datetime(2024, 2, 1, 10, 0, 0)


def _write_rows(path, rows):
    path.write_text("".join(json.dumps(r) + "\n" for r in rows))


def test_run_operator_watch_dir_to_query(spark, tmp_path):
    """Watch-dir JSON (TSD naming) → typed table rows with tsd system
    columns → dialect query; source file archived gzipped; TSD row
    registered."""
    eng = EdgeLakeEngine(spark, now=NOW)
    (tmp_path / "watch").mkdir()
    eng.run(
        f"run operator where watch_dir = {tmp_path}/watch and "
        f"err_dir = {tmp_path}/err and archive_dir = {tmp_path}/archive"
    )
    name = "iot.sensorlog.dev7.abcd1234.0.240201095500.json"
    _write_rows(
        tmp_path / "watch" / name,
        [
            {"ts": "2024-02-01 09:55:00", "value": 3.5},
            {"ts": "2024-02-01 09:56:00", "value": 4.5},
        ],
    )

    results = eng.operator.process_once()
    assert results == {name: "ok: 2 rows"}

    out = eng.query(
        "select count(*) as n, max(value) as mx from iot.sensorlog"
    ).collect()[0]
    assert (out.n, out.mx) == (2, 4.5)
    # system columns stamped from the TSD entry
    row = eng.query("select tsd_name, tsd_id from sensorlog limit 1").collect()[0]
    assert row.tsd_name.startswith("tsd_") and row.tsd_id >= 1
    # provenance row
    tsd = eng.run("time file get").collect()
    assert tsd[0].file_name == name and tsd[0].status1 == "2"
    # archived gzipped under YY/MM/DD
    day = tmp_path / "archive" / "24" / "02" / "01"
    assert (day / (name + ".gz")).exists()
    with gzip.open(day / (name + ".gz")) as fh:
        assert b"3.5" in fh.read()
    # a second file ACCUMULATES rows
    _write_rows(
        tmp_path / "watch" / "iot.sensorlog.dev7.ef995678.0.240201095700.json",
        [{"ts": "2024-02-01 09:57:00", "value": 9.0}],
    )
    eng.operator.process_once()
    assert eng.query("select count(*) as n from sensorlog").collect()[0].n == 3
    st = eng.run("get operator").collect()[0]
    assert (st.files_processed, st.rows_ingested) == (2, 3)


def test_operator_error_path_and_bare_names(spark, tmp_path):
    eng = EdgeLakeEngine(spark, now=NOW)
    (tmp_path / "w").mkdir()
    eng.run(
        f"run operator where watch_dir = {tmp_path}/w and err_dir = {tmp_path}/e "
        f"and archive_dir = {tmp_path}/a and compress_json = false"
    )
    # bare dbms.table.json accepted, no TSD row
    _write_rows(tmp_path / "w" / "d.optab.json", [{"k": 1}])
    # broken file → err dir
    (tmp_path / "w" / "bad.broken.json").write_text("{not json")
    results = eng.operator.process_once()
    assert results["d.optab.json"] == "ok: 1 rows"
    assert results["bad.broken.json"].startswith("err")
    assert (tmp_path / "e" / "err_bad.broken.json").exists()
    assert eng.query("select k from d.optab").collect()[0].k == 1
    assert eng.run("time file get").collect() == []  # bare name: no TSD
    # uncompressed archive
    assert (tmp_path / "a" / "24" / "02" / "01" / "d.optab.json").exists()


def test_delete_archive_by_days(spark, tmp_path):
    eng = EdgeLakeEngine(spark, now=NOW)
    (tmp_path / "w").mkdir()
    eng.run(
        f"run operator where watch_dir = {tmp_path}/w and err_dir = {tmp_path}/e "
        f"and archive_dir = {tmp_path}/a"
    )
    # fabricate archive days: old and recent
    for day in (("24", "01", "01"), ("24", "01", "31"), ("24", "02", "01")):
        d = tmp_path / "a" / day[0] / day[1] / day[2]
        d.mkdir(parents=True)
        (d / "x.json.gz").write_bytes(b"z")

    deleted = eng.run("delete archive where days = 7").collect()
    assert [r.deleted_day for r in deleted] == ["2024-01-01"]  # 01-31 is 1 day old: kept
    assert not (tmp_path / "a" / "24" / "01" / "01").exists()
    assert (tmp_path / "a" / "24" / "01" / "31" / "x.json.gz").exists()
    assert (tmp_path / "a" / "24" / "02" / "01" / "x.json.gz").exists()

    deleted = eng.run("delete archive where days = 0").collect()
    assert [r.deleted_day for r in deleted] == ["2024-01-31"]  # today retained


def test_flush_buffers_ticks_operator(spark, tmp_path):
    eng = EdgeLakeEngine(spark, now=NOW)
    (tmp_path / "w").mkdir()
    eng.run(
        f"run operator where watch_dir = {tmp_path}/w and err_dir = {tmp_path}/e "
        f"and archive_dir = {tmp_path}/a"
    )
    _write_rows(tmp_path / "w" / "d.flushtab.json", [{"k": 5}])
    flushed = eng.run("flush buffers").collect()[0].flushed
    assert flushed >= 1
    assert eng.query("select k from d.flushtab").collect()[0].k == 5


def test_connect_disconnect_dbms(spark, tmp_path):
    # a "remote engine" directory with one parquet table
    spark.range(4).selectExpr("id as k").write.parquet(str(tmp_path / "store" / "items.parquet"))
    eng = EdgeLakeEngine(spark, now=NOW)
    row = eng.run(
        f"connect dbms edgex where type = sqlite and path = {tmp_path}/store"
    ).collect()[0]
    assert (row.dbms, row.n_tables) == ("edgex", 1)
    assert eng.query("select count(*) as n from edgex.items").collect()[0].n == 4

    out = eng.run("disconnect dbms edgex").collect()[0]
    assert out.n_tables == 1
    with pytest.raises(Exception):
        eng.query("select count(*) as n from edgex.items").collect()


def test_drop_table_removes_managed_state(spark, tmp_path):
    eng = EdgeLakeEngine(spark, "/root/testdata/sf0.001", now=NOW, work_dir=str(tmp_path))
    eng.run('sql d "delete from events where value > 100.0"')
    assert "dml/events" in eng.tx_tables
    out = eng.run("drop table events").collect()[0]
    assert out.dropped
    assert "dml/events" not in eng.tx_tables
    # resolution falls back to the raw storage table
    n = eng.query("select count(*) as n from events").collect()[0].n
    assert n == 1000  # pre-DML row count at sf0.001


def test_drop_policy_by_id(spark):
    eng = EdgeLakeEngine(spark)
    eng.run('blockchain insert {"mapping": {"dbms": "d", "table": "t", "schema": {}}}')
    pol = eng.policy_store.policies[0]
    pid = pol["mapping"]["id"]
    out = eng.run(f"drop policy where id = {pid}").collect()[0]
    assert out.n_dropped == 1
    assert eng.policy_store.policies == []


def test_info_view_and_exists(spark):
    eng = EdgeLakeEngine(spark, "/root/testdata/sf0.001", now=NOW)
    eng.run("create view vdb.events ( device using event_type varchar, ts timestamp )")
    cols = {r[0] for r in eng.run("info view vdb events columns").collect()}
    assert "device" in cols
    assert eng.run("info view vdb events exists").collect()[0].table_exists
    assert not eng.run("info table vdb nope exists").collect()[0].table_exists


def test_backup_table_roundtrip(spark, tmp_path):
    eng = EdgeLakeEngine(spark, "/root/testdata/sf0.001", now=NOW)
    out = eng.run(
        f"backup table where dbms = d and table = nation and dest = {tmp_path}/bk"
    ).collect()[0]
    assert out.n_rows == 25
    lines = [json.loads(line) for line in open(out.dest)]
    assert len(lines) == 25 and all(l["n_name"].startswith("NATION_") for l in lines)
    # a backup restores through the operator watch-dir path
    (tmp_path / "w").mkdir()
    eng.run(
        f"run operator where watch_dir = {tmp_path}/w and err_dir = {tmp_path}/e "
        f"and archive_dir = {tmp_path}/a"
    )
    import shutil
    shutil.copy(out.dest, tmp_path / "w" / "d.nation_restored.json")
    eng.operator.process_once()
    assert eng.query("select count(*) as n from nation_restored").collect()[0].n == 25


def test_msg_client_alias_and_drop_dbms(spark, tmp_path):
    eng = EdgeLakeEngine(spark, now=NOW)
    eng.run(
        "run msg client where broker = 127.0.0.1 and port = 1883 and "
        'topic = (name = tele2 and dbms = d and table = tt and column.v.int = "bring [v]")'
    )
    assert eng.broker_consumers["tele2"]["transport"] == "mqtt"

    spark.range(2).selectExpr("id as k").write.parquet(str(tmp_path / "s" / "tab.parquet"))
    eng.run(f"connect dbms gone where type = psql and path = {tmp_path}/s")
    assert eng.query("select count(*) as n from gone.tab").collect()[0].n == 2
    eng.run("drop dbms gone")
    with pytest.raises(Exception):
        eng.query("select count(*) as n from gone.tab").collect()


def test_prepare_and_replace_policy(spark):
    import json as _json

    eng = EdgeLakeEngine(spark)
    out = eng.run('prepare policy {"sensor": {"company": "acme"}}').collect()[0]
    stamped = _json.loads(out.policy)
    assert stamped["sensor"]["id"] == out.policy_id and "date" in stamped["sensor"]
    assert eng.policy_store.policies == []  # prepared, NOT inserted

    eng.run('blockchain insert {"sensor": {"company": "acme"}}')
    pid = eng.policy_store.policies[0]["sensor"]["id"]
    eng.run(f'replace policy where id = {pid} with {{"sensor": {{"company": "bcme"}}}}')
    assert len(eng.policy_store.policies) == 1
    assert eng.policy_store.policies[0]["sensor"]["company"] == "bcme"


def test_create_work_directories(spark, tmp_path):
    eng = EdgeLakeEngine(spark, work_dir=str(tmp_path))
    rows = eng.run("create work directories").collect()
    assert {r.name for r in rows} == {"watch", "bwatch", "blobs", "archive", "err", "data", "scripts"}
    import os
    assert all(os.path.isdir(r.path) for r in rows)
    # dictionary names resolve (!watch_dir)
    assert eng.params["watch_dir"].endswith("/watch")


# ---------------------------------------------- review regression set


def test_drop_table_purges_qualified_alias(spark, tmp_path):
    """DML registers both `d.events` and `events` aliases; drop table
    must purge BOTH so qualified queries fall back to raw storage
    instead of resolving to a dropped temp view."""
    eng = EdgeLakeEngine(spark, "/root/testdata/sf0.001", now=NOW, work_dir=str(tmp_path))
    eng.run('sql d "delete from d.events where value > 100.0"')
    assert eng.views.get("d.events") == "__dml_events"
    eng.run("drop table events")
    assert "d.events" not in eng.views
    assert eng.query("select count(*) as n from d.events").collect()[0].n == 1000


def test_drop_dbms_forgets_dml_state_and_bare_alias(spark, tmp_path):
    eng = EdgeLakeEngine(spark, "/root/testdata/sf0.001", now=NOW, work_dir=str(tmp_path))
    eng.run('sql edgex "delete from edgex.events where value > 100.0"')
    assert "dml/events" in eng.tx_tables
    assert eng.views.get("events") == "__dml_events"
    eng.run("drop dbms edgex")
    assert "dml/events" not in eng.tx_tables
    assert "events" not in eng.views  # bare alias purged with the dbms
    assert eng.query("select count(*) as n from events").collect()[0].n == 1000


def test_disconnect_dbms_drops_attach_views(spark, tmp_path):
    spark.range(3).selectExpr("id as k").write.parquet(str(tmp_path / "s" / "tt.parquet"))
    eng = EdgeLakeEngine(spark, now=NOW)
    eng.run(f"connect dbms exx where type = psql and path = {tmp_path}/s")
    assert spark.catalog.tableExists("__dbms_exx_tt")
    eng.run("disconnect dbms exx")
    assert not spark.catalog.tableExists("__dbms_exx_tt")  # no session leak


def test_flush_buffers_survives_broken_watch_dir(spark, tmp_path):
    import shutil

    eng = EdgeLakeEngine(spark, now=NOW)
    (tmp_path / "w").mkdir()
    eng.run(
        f"run operator where watch_dir = {tmp_path}/w and err_dir = {tmp_path}/e "
        f"and archive_dir = {tmp_path}/a"
    )
    shutil.rmtree(tmp_path / "w")  # externally broken watch dir
    flushed = eng.run("flush buffers").collect()[0].flushed  # must not raise
    assert flushed == 0


def test_delete_archive_tolerates_stray_files(tmp_path):
    from edgelake_spark.ingest.operator import delete_archive_before

    a = tmp_path / "a"
    for day in (("24", "01", "01"), ("24", "01", "05")):
        d = a / day[0] / day[1] / day[2]
        d.mkdir(parents=True)
        (d / "x.gz").write_bytes(b"z")
    (a / "24" / "01" / "notes.txt").write_text("stray")  # file at day level
    (a / "24" / "README").write_text("stray")  # file at month level
    deleted = delete_archive_before(str(a), ("24", "01", "31"))
    assert deleted == ["2024-01-01", "2024-01-05"]
    assert (a / "24" / "01" / "notes.txt").exists()  # sweep completed around it


def test_operator_archive_failure_keeps_rows_single_ingest(spark, tmp_path):
    """Archive failing AFTER ingest must not route the file to the err
    replay path (rows are already live — a replay would double them)
    nor count the file as errored."""
    eng = EdgeLakeEngine(spark, now=NOW)
    (tmp_path / "w").mkdir()
    (tmp_path / "blockfile").write_text("")  # archive parent is a FILE
    eng.run(
        f"run operator where watch_dir = {tmp_path}/w and err_dir = {tmp_path}/e "
        f"and archive_dir = {tmp_path}/blockfile/arch"
    )
    _write_rows(tmp_path / "w" / "d.archfail.json", [{"k": 1}, {"k": 2}])
    results = eng.operator.process_once()
    assert results["d.archfail.json"].startswith("ok: 2")
    assert (eng.operator.files_processed, eng.operator.files_errored) == (1, 0)
    assert "archive failed" in eng.operator.last_error
    assert (tmp_path / "e" / "archived_failed_d.archfail.json").exists()
    eng.operator.process_once()  # second tick: nothing left to re-ingest
    assert eng.query("select count(*) as n from d.archfail").collect()[0].n == 2


def test_operator_stuck_file_not_reingested(spark, tmp_path, monkeypatch):
    """If archive AND err-move AND unlink all fail (watch dir gone
    read-only), the file's rows are live — later ticks must skip it,
    not re-union the same rows every tick."""
    import edgelake_spark.ingest.operator as op_mod

    eng = EdgeLakeEngine(spark, now=NOW)
    (tmp_path / "w").mkdir()
    (tmp_path / "blockfile").write_text("")  # archive parent is a FILE
    eng.run(
        f"run operator where watch_dir = {tmp_path}/w and err_dir = {tmp_path}/e "
        f"and archive_dir = {tmp_path}/blockfile/arch"
    )
    _write_rows(tmp_path / "w" / "d.stucktab.json", [{"k": 1}, {"k": 2}])

    real_move, real_unlink = op_mod.shutil.move, op_mod.os.unlink

    def deny_move(src, dst):
        if "stucktab" in str(src):
            raise PermissionError("read-only")
        return real_move(src, dst)

    def deny_unlink(p):
        if "stucktab" in str(p):
            raise PermissionError("read-only")
        return real_unlink(p)

    monkeypatch.setattr(op_mod.shutil, "move", deny_move)
    monkeypatch.setattr(op_mod.os, "unlink", deny_unlink)
    results = eng.operator.process_once()
    assert results["d.stucktab.json"].startswith("ok: 2")
    assert (eng.operator.files_processed, eng.operator.files_errored) == (1, 0)
    # the file is still in the watch dir, but the second tick skips it
    assert (tmp_path / "w" / "d.stucktab.json").exists()
    monkeypatch.undo()
    eng.operator.process_once()
    assert eng.query("select count(*) as n from d.stucktab").collect()[0].n == 2
