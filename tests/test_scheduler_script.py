"""Scheduler + command-script family (reference member_cmd.py:11961
`run scheduler` / :11996 `schedule` / :12070 task ops / :16011
`get scheduler` / :13318 `process <file>`; task_scheduler.py;
sche_task.py)."""

from datetime import datetime, timedelta

import pytest

from edgelake_spark.engine import EdgeLakeEngine
from edgelake_spark.scheduler import TaskScheduler, parse_interval_seconds
from edgelake_spark.script import ScriptRunner

SF_DIR = "/root/testdata/sf0.001"

T0 = datetime(2024, 2, 1)


@pytest.fixture()
def engine(spark):
    eng = EdgeLakeEngine(spark, SF_DIR, now=T0)
    # deterministic: no background thread; tests drive .tick()
    eng.scheduler_wake_seconds = 0
    return eng


# ------------------------------------------------------- interval parse


def test_parse_interval_seconds():
    assert parse_interval_seconds("10 seconds") == 10
    assert parse_interval_seconds("1 minute") == 60
    assert parse_interval_seconds("2 hours") == 7200
    assert parse_interval_seconds("42") == 42
    with pytest.raises(ValueError):
        parse_interval_seconds("soon")
    with pytest.raises(ValueError):
        parse_interval_seconds("5 fortnights")


# ---------------------------------------------------------- TaskScheduler


def test_tick_runs_due_tasks_and_reschedules():
    ran = []
    sched = TaskScheduler(runner=ran.append, clock=lambda: T0)
    sched.add_task("get status", repeat_seconds=60, name="probe")
    assert sched.tick(T0) and ran == ["get status"]
    # not due again until +60s
    assert sched.tick(T0 + timedelta(seconds=30)) == []
    assert len(sched.tick(T0 + timedelta(seconds=61))) == 1
    task = sched.get_task(name="probe")
    assert task.run_counter == 2 and task.run_status == "Success"


def test_task_error_is_captured_and_task_keeps_scheduling():
    def boom(cmd):
        raise RuntimeError("nope")

    sched = TaskScheduler(runner=boom, clock=lambda: T0)
    sched.add_task("bad cmd", repeat_seconds=10, name="bad")
    sched.tick(T0)
    task = sched.get_task(name="bad")
    assert task.run_counter == 1 and "nope" in task.run_status
    assert len(sched.tick(T0 + timedelta(seconds=11))) == 1  # still scheduled


def test_stop_resume_remove_and_slot_reuse():
    sched = TaskScheduler(runner=lambda c: None, clock=lambda: T0)
    sched.add_task("a", 10, name="t1")
    sched.add_task("b", 10, name="t2")
    sched.change_mode("stop", name="t1")
    assert [t.name for t in sched.tick(T0)] == ["t2"]
    sched.change_mode("resume", name="t1")
    assert len(sched.tick(T0 + timedelta(seconds=11))) == 2
    # removed slots are reused (reference task_scheduler.py:264-273)
    sched.change_mode("remove", name="t1")
    t3 = sched.add_task("c", 10, name="t3")
    assert t3.task_id == 1
    assert sched.get_task(name="t1") is None


def test_duplicate_name_rejected():
    sched = TaskScheduler(runner=lambda c: None, clock=lambda: T0)
    sched.add_task("a", 10, name="x")
    with pytest.raises(ValueError, match="Duplicate"):
        sched.add_task("b", 10, name="x")


def test_start_modifier_and_forced_run():
    sched = TaskScheduler(runner=lambda c: None, clock=lambda: T0)
    sched.add_task("a", 3600, name="later", start="+1d")
    assert sched.tick(T0) == []  # not due for a day
    sched.change_mode("run", name="later")  # task run = due now
    assert len(sched.tick(T0)) == 1


# ------------------------------------------------------- engine commands


def test_engine_schedule_and_get_scheduler(engine):
    row = engine.run(
        'schedule time = 1 minute and name = "rows probe" task '
        "get rows count where table = events"
    ).collect()[0]
    assert row.task_id == 1 and row.name == "rows probe"
    sched = engine.schedulers[1]
    ran = sched.tick(T0)
    assert len(ran) == 1
    # the scheduled command produced a real DataFrame result
    assert ran[0].last_result.collect()[0].n_rows > 0
    got = engine.run("get scheduler").collect()
    assert len(got) == 1 and got[0].run_counter == 1
    assert got[0].run_status == "Success"
    assert got[0].task.startswith("get rows count")


def test_engine_task_ops_and_exit(engine):
    engine.run('schedule time = 10 seconds and name = "a" task get status')
    engine.run('schedule time = 10 seconds and name = "b" task get status')
    engine.run('task stop where scheduler = 1 and name = "a"')
    modes = {r.name: r.mode for r in engine.run("get scheduler 1").collect()}
    assert modes == {"a": "Stopped", "b": "Active"}
    engine.run("task remove where scheduler = 1 and id = 2")
    left = engine.run("get scheduler").collect()
    assert [r.name for r in left] == ["a"]
    with pytest.raises(ValueError):
        engine.run('task stop where scheduler = 1 and name = "a" and id = 1')
    status = engine.run("exit scheduler").collect()[0]
    assert status.status in ("stopped", "not running")


def test_run_scheduler_tick_driven(engine):
    row = engine.run("run scheduler").collect()[0]
    # wake_seconds = 0 → no thread; registration only
    assert row.status == "started" and not engine.schedulers[1].running


# ------------------------------------------------------------- scripts


def run_script(lines, runner=None, values=None):
    log = []
    res = ScriptRunner(runner or (lambda c: log.append(c) or f"<{c}>")).run(
        "\n".join(lines), values=values
    )
    return res, log


def test_script_sequential_and_comments():
    res, log = run_script(["# comment", "", "get status", "get streaming"])
    assert res.error is None and log == ["get status", "get streaming"]


def test_script_variables_and_substitution():
    res, log = run_script(
        [
            "variables (dbms, tbl)",
            'set fmt = "json"',
            "get rows count where dbms = !dbms and table = !tbl and format = !fmt",
        ],
        values=["iot", "events"],
    )
    assert res.error is None
    assert log[-1] == "get rows count where dbms = iot and table = events and format = json"


def test_script_missing_variables_error():
    res, _ = run_script(["variables (a, b)"], values=["only-one"])
    assert res.error and "requires 2" in res.error


def test_script_assignment_from_command_and_literal():
    res, _ = run_script(["n = 42", 'name = "abc"', "out = get status"])
    assert res.variables["n"] == "42"
    assert res.variables["name"] == "abc"
    assert res.variables["out"] == "<get status>"


def test_script_if_then_and_goto_loop():
    # a counted goto loop: `i = incr !i` routes through the runner (the
    # reference's pattern of assigning a command's output to a variable)
    steps = []

    def runner(cmd):
        if cmd.startswith("incr "):
            return str(int(cmd.split()[1]) + 1)
        steps.append(cmd)
        return ""

    res = ScriptRunner(runner).run(
        "\n".join(
            [
                "i = 0",
                ":loop:",
                "if !i == 3 then goto done",
                "step !i",
                "i = incr !i",
                "goto loop",
                ":done:",
                "finish",
            ]
        )
    )
    assert res.error is None
    assert steps == ["step 0", "step 1", "step 2", "finish"]
    assert res.variables["i"] == "3"


def test_script_goto_skips_and_end_script():
    res, log = run_script(
        ["goto tail", "get status", ":tail:", "get streaming", "end script", "never"]
    )
    assert res.error is None and res.ended_early
    assert log == ["get streaming"]


def test_script_if_comparisons():
    r = ScriptRunner(lambda c: c)
    assert r._compare("3", ">=", "2")
    assert r._compare("abc", "contains", "b")
    assert not r._compare("3", "==", "4")
    res, log = run_script(
        ['x = "yes"', "if !x == yes then get status", "if !x != yes then never"]
    )
    assert log == ["get status"]


def test_script_on_error_goto():
    def runner(cmd):
        if cmd == "bad":
            raise RuntimeError("kapow")
        return cmd

    res = ScriptRunner(runner).run(
        "\n".join(
            ["on error goto handler", "bad", "never", ":handler:", "get status"]
        )
    )
    assert res.error is None
    assert [c for _, c, _ in res.executed] == ["get status"]
    assert "kapow" in res.variables["error_message"]


def test_script_unknown_goto_and_duplicate_label():
    res, _ = run_script(["goto nowhere"])
    assert "without declared label" in res.error
    res, _ = run_script([":a:", ":a:"])
    assert "duplicate label" in res.error


def test_script_multiline_join():
    res, log = run_script(["<get rows count", "where table = events>"])
    assert res.error is None
    assert log == ["get rows count where table = events"]


def test_script_step_cap():
    res, _ = run_script([":a:", "goto a"])
    assert "step limit" in res.error


def test_engine_process_file(engine, tmp_path):
    script = tmp_path / "boot.an"
    script.write_text(
        "# boot script\n"
        "variables (tbl)\n"
        "counts = get rows count where table = !tbl\n"
        "get scheduler\n"
        'schedule time = 1 minute and name = "from script" task get status\n'
    )
    out = engine.run(f"process {script} events").collect()
    assert len(out) == 3
    assert engine.schedulers[1].get_task(name="from script") is not None


def test_engine_process_missing_file(engine):
    with pytest.raises((RuntimeError, OSError)):
        engine.run("process /nonexistent/path.an")


def test_scheduled_repeatable_query_to_table(engine):
    """The reference's flagship scheduler use: a repeatable query whose
    result lands in a named table (member_cmd.py:11993 example)."""
    engine.run(
        'schedule time = 1 minute and name = "repeat q" task '
        'sql iot table = latest "SELECT max(ts) AS max_ts FROM events"'
    )
    engine.schedulers[1].tick(T0)
    got = engine.spark.table("query_latest").collect()
    assert len(got) == 1 and got[0].max_ts is not None


# ------------------------------------------------- echo / get processes


def test_echo_and_scheduled_echo(engine):
    assert engine.run('echo "scheduled message"').collect()[0].echo == "scheduled message"
    engine.run('schedule time = 10 seconds and name = "e" task echo ping')
    ran = engine.schedulers[1].tick(T0)
    assert ran[0].last_result.collect()[0].echo == "ping"


def test_get_processes_statuses(engine):
    rows = {r.process: r for r in engine.run("get processes").collect()}
    assert rows["Query Pool"].status == "Running"
    assert rows["Operator"].status == "Not declared"  # no operator ingest loop declared
    assert rows["TCP"].status == "Not declared"
    assert rows["Scheduler"].status == "Not declared"
    engine.run("run scheduler")
    engine.run("data monitor where dbms = iot and table = t and value_column = v")
    rows = {r.process: r for r in engine.run("get processes").collect()}
    # wake=0 → tick-driven, registered but no thread
    assert rows["Scheduler 1"].status == "Declared"
    assert rows["Data Monitor"].status == "Running"
    assert "iot.t" in rows["Data Monitor"].details


# ------------------------------------------------------ node dictionary


def test_set_get_dictionary_and_substitution(engine):
    engine.run('set my_table = "events"')
    d = {r.key: r.value for r in engine.run("get dictionary").collect()}
    assert d["my_table"] == "events" and d["ip"] == "127.0.0.1"
    # !name resolves inside any command (reference params substitution)
    got = engine.run("get rows count where table = !my_table").collect()
    assert got[0].table_name == "events" and got[0].n_rows == 1000
    # != in SQL never matches the substitution pattern
    n = engine.run(
        'sql iot "SELECT count(*) AS n FROM !my_table WHERE event_type != \'click\'"'
    ).collect()[0].n
    assert 0 < n < 1000
    # empty value removes the key; unknown keys pass through untouched
    engine.run('set my_table = ""')
    assert "my_table" not in {
        r.key for r in engine.run("get dictionary").collect()
    }


def test_script_writes_node_dictionary(engine, tmp_path):
    script = tmp_path / "vars.an"
    script.write_text('set landing = "/tmp/x"\nn_docs = echo 42\n')
    engine.run(f"process {script}")
    d = {r.key: r.value for r in engine.run("get dictionary").collect()}
    assert d["landing"] == "/tmp/x" and d["n_docs"] == "42"
    # and interactive commands see script-written vars
    assert engine.run("echo !landing").collect()[0].echo == "/tmp/x"


# ---------------------------------------------------- do / else / bare if


def test_script_bare_if_do_else():
    res, log = run_script(
        [
            "if 2 > 1",
            "do get status",
            "else get streaming",
            "if 1 > 2",
            "do get never",
            "else get fallback",
        ]
    )
    assert res.error is None
    assert log == ["get status", "get fallback"]


def test_script_if_then_sets_do_else_state():
    # the then-form also records the result for a following do/else
    res, log = run_script(
        [
            "if 1 == 1 then get first",
            "do get second",
            "if 1 == 2 then get never",
            "else get third",
        ]
    )
    assert res.error is None
    assert log == ["get first", "get second", "get third"]


def test_script_do_wraps_conditional_and_goto():
    res, log = run_script(
        [
            "if 1 == 1",
            "do goto done",
            "get skipped",
            ":done:",
            "get end",
        ]
    )
    assert res.error is None
    assert log == ["get end"]


# ------------------------------------------------------- call / return


def test_script_call_and_return():
    res, log = run_script(
        [
            "call sub",
            "get after-call",
            "end script",
            ":sub:",
            "get inside-sub",
            "return",
        ]
    )
    assert res.error is None
    assert log == ["inside-sub".join(["get ", ""]), "get after-call"]
    assert res.ended_early


def test_script_return_from_root_ends():
    res, log = run_script(["get one", "return", "get never"])
    assert res.error is None
    assert log == ["get one"]


def test_script_call_unknown_label_errors():
    res, _ = run_script(["call nowhere"])
    assert res.error and "call without declared label" in res.error


# --------------------------------------------------------------- wait


def test_script_wait_sleeps_and_condition_skips():
    slept = []
    runner_log = []
    r = ScriptRunner(lambda c: runner_log.append(c), sleep=slept.append)
    res = r.run(
        "\n".join(
            [
                "set ready = yes",
                "wait 7",
                "wait 5 for !ready",
                "wait 3 for !missing",
                "wait 4 for 2 > 1",
            ]
        )
    )
    assert res.error is None
    # bare wait always sleeps; met conditions skip; unresolved !missing
    # and the satisfied comparison behave per reference semantics
    assert slept == [7, 3]


# ------------------------------------------------------- print / incr


def test_engine_print_and_incr(engine):
    assert engine.run('print "hello world"').collect()[0].print == "hello world"
    engine.run("set who = nodeA")
    # print substitutes dictionary values like the reference _print
    assert engine.run("print !who ready").collect()[0].print == "nodeA ready"
    assert engine.run("incr 41").collect()[0].incr == 42
    assert engine.run("incr 40 2").collect()[0].incr == 42
    import pytest as _pytest

    with _pytest.raises(Exception):
        engine.run("incr notanint")


def test_script_incr_counter_loop(engine, tmp_path):
    # the reference's canonical counter idiom: x = incr !x inside a
    # goto loop, terminated by a bare if + do
    script = tmp_path / "count.an"
    script.write_text(
        "\n".join(
            [
                "set n = 0",
                ":loop:",
                "n = incr !n",
                "if !n < 3 then goto loop",
                'print "done !n"',
            ]
        )
    )
    engine.run(f"process {script}")
    d = {r.key: r.value for r in engine.run("get dictionary").collect()}
    assert d["n"] == "3"


def test_event_runs_registered_script(engine, tmp_path):
    script = tmp_path / "on_file.an"
    script.write_text(
        "variables (fname)\nset last_file = !fname\n"
    )
    engine.run(f"set file_processed = {script}")
    engine.run("event file_processed batch-17.json")
    d = {r.key: r.value for r in engine.run("get dictionary").collect()}
    assert d["last_file"] == "batch-17.json"
    import pytest as _pytest

    with _pytest.raises(Exception):
        engine.run("event unknown_event")


# ------------------------------------------- malformed-command surface


def test_malformed_commands_raise_clean_errors(engine):
    """Every command family rejects malformed input with a typed,
    message-bearing error (ValueError family or a clean analysis
    exception) — never an internal AttributeError/KeyError/IndexError
    crash from half-parsed state (reference: member_cmd error paths
    return error strings, not tracebacks)."""
    from pyspark.errors.exceptions.base import AnalysisException

    clean = (ValueError, KeyError, OSError, AnalysisException)
    bad = [
        'sql iot format=xml "select 1"',
        'sql iot "select increments(eon,1,ts), count(*) from events"',
        'sql iot "select period(eon, 1, now(), ts) from events"',
        "backup table where table = events",        # missing dest
        "replace policy where id = x",              # missing with
        "schedule time = soon task echo hi",        # bad interval
        "task stop where nothing = x",              # no name/id selector
        "file store where dbms = d",                # missing table/file
        "file retrieve where dbms = d",             # missing table
        "partition d events using nosuchcol by 1 eon",  # bad unit
        'sql iot "select * from nosuchtable"',
        "incr notanint",
        "connect dbms broken where path = /nonexistent/dir",
        "run operator where err_dir = /tmp/x",      # missing watch_dir
        "delete archive where days = soon",
        "info table d nosuchtable columns",
    ]
    for cmd in bad:
        try:
            out = engine.run(cmd)
            # a DataFrame-returning "not found/empty" answer is fine;
            # force evaluation so analysis errors surface
            if hasattr(out, "collect"):
                out.collect()
        except clean as exc:
            assert str(exc), f"empty error message for: {cmd}"
        except Exception as exc:  # pragma: no cover - the assertion target
            raise AssertionError(
                f"unclean {type(exc).__name__} for {cmd!r}: {exc}"
            ) from exc
