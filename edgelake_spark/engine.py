"""EdgeLakeEngine — the query entry point.

Replaces the reference's whole query lifecycle (parse → per-operator
fan-out → scratch-table unify → format; edge_lake/cmd/member_cmd.py:5187
_issue_sql, edge_lake/job/job_instance.py) with: dialect rewrite →
ONE Spark plan → optional presentation transforms. Catalyst supplies
predicate pushdown, partial/final aggregation, partition pruning and
AQE; nothing is hand-scheduled, so the same code path scales from
local[32] to a 1000-executor cluster.
"""

from __future__ import annotations

import itertools
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from edgelake_spark import catalog
from edgelake_spark.dialect.casting import TZ_NAMES, apply_castings
from edgelake_spark.dialect.options import SqlCommand, parse_sql_command
from edgelake_spark.dialect.rewriter import rewrite_select
from edgelake_spark.output import format_result

_view_counter = itertools.count()
_job_counter = itertools.count()


class EdgeLakeEngine:
    """One engine per (SparkSession, data directory).

    ``now`` pins the rewrite-time clock (the reference resolves now()/
    date() to fixed literals at rewrite, unify_results.py:876-881) —
    inject a datetime for deterministic tests/oracles.
    """

    #: default blob-export cap for `file retrieve` without a unique key:
    #: exporting a whole blob table streams through the driver, so an
    #: unbounded default is an OOM path at 1M-blob tables. An explicit
    #: `limit = 0` opts back into unlimited (paged via toLocalIterator).
    RETRIEVE_CAP = 1000

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        now: datetime | None = None,
        node_identity: dict | None = None,
        work_dir: str | None = None,
    ):
        self.spark = spark
        # harden against driver-supplied sessions missing our configs
        # (UTC tz, nanos-as-long, Arrow) — see catalog._REQUIRED_CONFS
        catalog.ensure_session_confs(spark)
        self.now = now
        # stand-in identity for the single "operator node" — the
        # reference prepends these via extend=(@ip, @port, ...)
        self.node_identity = node_identity or {
            "ip": "127.0.0.1",
            "port": 32048,
            "dbms_name": "",
        }
        #: qualified name → Spark view name, for `create view` mappings
        self.views: dict[str, str] = {}
        #: table name → partitioned dataset path (attach_partitioned)
        self.partitioned_paths: dict[str, str] = {}
        #: topic name → parsed `run kafka consumer` config
        self.broker_consumers: dict[str, dict] = {}
        #: StreamIngest pipelines registered on this node (for
        #: `get streaming` counters)
        self.stream_ingests: list = []
        #: "dbms.table" → streaming conditions / data monitors, consumed
        #: by broker/file ingest pipelines targeting that table
        self.streaming_conditions: dict[str, list] = {}
        self.monitors: dict[str, object] = {}
        #: the node's policy ledger (reference: blockchain file/master)
        from edgelake_spark.policies import PolicyStore

        self.policy_store = PolicyStore()
        self._last_pass_through = False
        #: dest = buffer:<key> rendered outputs (reference assign_key /
        #: "buffer" destination, output_data.py:37-60)
        self.buffers: dict[str, str] = {}
        #: (dbms, table) → blobs temp view, fed by `file store`
        #: (reference bucket_dbms.py:110 store_file / :220 retrieve_files)
        self.blob_views: dict[tuple[str, str], str] = {}
        #: (dbms, table) → {blob_hash: row tuple} — driver-side source of
        #: truth for the blobs store; the temp view is ONE createDataFrame
        #: over these rows (no per-store union lineage, O(1) dup checks)
        self.blob_rows: dict[tuple[str, str], dict[str, tuple]] = {}
        #: sched_id → TaskScheduler (reference task_scheduler.py's
        #: per-id task arrays); wake<=0 keeps schedulers tick-driven
        #: (deterministic — tests call .tick() with an explicit now)
        self.schedulers: dict[int, object] = {}
        self.scheduler_wake_seconds: float = 10.0
        #: EdgeLakeRestServer sets this on construction (`get processes`)
        self.rest_server = None
        #: the node dictionary (reference generic/params.py user_defined:
        #: `!name` substitution in every command, `set name = value`,
        #: `get dictionary`); seeded with the node identity like the
        #: reference seeds ip/port at boot
        self.params: dict[str, str] = {
            "ip": str(self.node_identity.get("ip", "")),
            "port": str(self.node_identity.get("port", "")),
        }
        #: per-query audit: statement, rewritten SQL, wall seconds
        #: (reference `query status/explain` — member_cmd.py:21665,
        #: job_instance bookkeeping). Bounded ring, newest last.
        self.query_log: list[dict] = []
        #: node event/error rings (reference generic/process_log.py):
        #: `get event log` / `get error log`, keyword filter, dedup fold
        from edgelake_spark.eventlog import EventLog

        self.event_log = EventLog()
        #: transactional table layer (txlog.TxTable): DML and the
        #: log-backed blob store commit versioned parquet snapshots
        #: here. An EXPLICIT work_dir makes the node durable — a new
        #: engine on the same work_dir reloads committed state (the
        #: reference's operator node persists in its local SQL engine);
        #: without one, a throwaway temp dir is created on first use.
        self._work_dir_path = work_dir
        self._durable = work_dir is not None
        self.tx_tables: dict[str, object] = {}
        self.sf_dir = sf_dir
        if sf_dir:
            catalog.register_sf_tables(spark, sf_dir)
        if self._durable:
            # re-attach DML state committed by a previous engine on this
            # work_dir — without this a restarted node would silently
            # resolve queries to the raw storage tables (pre-DML data)
            self._load_dml_tables()

    def _resolve(self, name: str) -> str:
        if name in self.views:
            return self.views[name]
        short = catalog.view_name(name)
        return self.views.get(short, short)

    def _purge_doomed_views(self, doomed) -> list[str]:
        """Drop the given temp views and EVERY remaining alias that
        still points at one of them — shared by drop table and
        disconnect/drop dbms so no alias can dangle at a dropped view
        instead of falling back to raw storage. Returns the purged
        alias names."""
        for v in doomed:
            try:
                self.spark.catalog.dropTempView(v)
            except Exception:
                pass
        purged = [a for a, t in self.views.items() if t in doomed]
        for alias in purged:
            self.views.pop(alias)
        return purged

    @staticmethod
    def _entry_plan(entry: dict) -> str:
        """Formatted physical plan for a query_log entry; cached so the
        DataFrame reference can be dropped once an entry is no longer
        the newest (avoids pinning checkpoint blocks — see _execute)."""
        if entry.get("plan") is None:
            df = entry["df"]
            entry["plan"] = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        return entry["plan"]

    @staticmethod
    def _plan_destinations(plan: str) -> list[dict]:
        """File-scan destinations from a formatted physical plan: one
        dict per scan with the location root, the table name (path
        basename), and the scan-time pruning predicates. Non-file scans
        (checkpointed intermediates, in-memory relations) are reported
        as a single ``memory`` destination so a query never vanishes
        from the report."""
        import re as _re

        out: list[dict] = []
        # formatted explain prints per-node detail blocks; Location
        # lines carry "<FileIndexCls> [path1, path2, ...]" (paths may be
        # elided with "..." beyond the first few)
        blocks = _re.split(r"\n\s*\n", plan)
        for block in blocks:
            for loc in _re.finditer(r"Location:\s*\S+\s*\[([^\]]*)\]", block):
                first_path = loc.group(1).split(",")[0].strip()
                if not first_path:
                    continue
                table = first_path.rstrip("/").rsplit("/", 1)[-1]
                table = _re.sub(r"\.(parquet|csv|json|orc)$", "", table)
                filters = []
                for key in ("PartitionFilters", "PushedFilters"):
                    # capture to end-of-line: predicates like
                    # In(value, [1,2,3]) nest brackets, so a
                    # first-']' match would truncate them
                    fm = _re.search(rf"{key}:\s*(\[.*?)\s*$", block, _re.MULTILINE)
                    if fm and fm.group(1) != "[]":
                        filters.append(f"{key}={fm.group(1)}")
                out.append(
                    {
                        "location": first_path,
                        "table": table,
                        "filters": "; ".join(filters),
                    }
                )
        if not out:
            kind = "memory" if "Scan ExistingRDD" in plan else "local"
            out.append({"location": kind, "table": "", "filters": ""})
        return out

    # ------------------------------------------------------------ public

    def run(self, command: str):
        """Execute an EdgeLake command: ``sql <dbms> [options]
        "SELECT ..."`` or an admin command (`create view`,
        `get rows count`, `info table ... columns`).

        Returns a DataFrame for format=dataframe (default), else a
        rendered string (json / json:list / table).
        """
        # the canonical CLI prefix: `run client () <command>` routes the
        # command to query nodes (reference member_cmd.py:21027-21037);
        # single-engine here, so strip and run locally
        import re as _re

        command = _re.sub(r"^\s*run\s+client\s*\([^)]*\)\s*", "", command)
        # node-dictionary substitution (reference params.py
        # get_value_if_available): known `!name` keys resolve anywhere
        # in the command; unknown keys pass through untouched. `!=`
        # never matches (the char after `!` must start an identifier).
        command = _re.sub(
            r"!([A-Za-z_]\w*)",
            lambda m: self.params.get(m.group(1), m.group(0)),
            command,
        )
        try:
            admin_result = self._try_admin(command)
        except Exception as exc:
            # reference logs command failures to the error ring
            # (process_log.add is called from error paths node-wide)
            self.event_log.add("Error", f"{type(exc).__name__}: {exc}")
            raise
        if admin_result is not None:
            return admin_result
        try:
            cmd = parse_sql_command(command)
            self._last_pass_through = False
            df = self._execute(cmd)
        except Exception as exc:
            self.event_log.add("Error", f"{type(exc).__name__}: {exc}")
            raise
        if cmd.options.get("table"):
            # repeatable query → named result (reference
            # member_cmd.py:115-117, system_query.<name>)
            df.createOrReplaceTempView(f"query_{cmd.options['table']}")
        dest = cmd.options.get("dest", "")
        if cmd.fmt == "test" or cmd.options.get("test"):
            # TEST format: Header/Output/Stat sections; with source=
            # compare against the golden file and return the verdict
            # (reference member_cmd.py:124-127, output_data.py:209-262)
            import json as _json

            from edgelake_spark.output import analyze_test_output, format_test_output

            rendered = format_test_output(
                df,
                "table",
                title=cmd.options.get("title", ""),
                command=cmd.statement,
                dbms=cmd.dbms,
                now=self.now,
            )
            if dest.startswith("file:"):
                with open(dest[5:], "w") as fh:
                    fh.write(rendered)
            src = cmd.options.get("source")
            if src:
                with open(src) as fh:
                    trusted = fh.read()
                return _json.dumps(analyze_test_output(trusted, rendered))
            return rendered
        if dest.startswith("kafka@"):
            # dest = kafka@ip:port — publish result rows as JSON messages
            # (reference dest_values member_cmd.py:142-148)
            from edgelake_spark.streaming.broker import write_query_to_broker

            write_query_to_broker(df, dest)
            return df
        if dest.startswith("buffer:") or dest == "buffer":
            # dest = buffer[:key] — rendered output kept engine-side
            # under a key (reference assign_key "buffer" destination,
            # output_data.py:37-60; read back with !key)
            key = dest[7:] or "last"
            fmt = cmd.fmt if cmd.fmt != "dataframe" else "json"
            self.buffers[key] = format_result(
                df, fmt, stat=cmd.options.get("stat", False)
            )
            return df
        if dest.startswith("file:"):
            # dest = file:<path> — reference routes formatted output to a
            # file (dest_values member_cmd.py:142-148; OutputManager).
            # Distributed write for parquet/json paths, driver-rendered
            # text otherwise.
            path = dest[5:]
            if path.endswith(".parquet"):
                df.write.mode("overwrite").parquet(path)
            elif path.endswith(".json"):
                df.write.mode("overwrite").json(path)
            else:
                fmt = cmd.fmt if cmd.fmt != "dataframe" else "json"
                stat = cmd.options.get("stat", False)
                with open(path, "w") as fh:
                    if self._last_pass_through and not stat and fmt != "table":
                        # stream chunks straight to the file — constant
                        # driver memory for arbitrarily wide scans
                        from edgelake_spark.output import stream_result

                        for chunk in stream_result(df, fmt):
                            fh.write(chunk)
                    else:
                        fh.write(format_result(df, fmt, stat=stat))
            return df
        if cmd.fmt == "dataframe":
            return df
        return format_result(
            df,
            cmd.fmt,
            stat=cmd.options.get("stat", False),
            pass_through=self._last_pass_through,
        )

    def query(self, statement: str, **options) -> DataFrame:
        """Run a dialect SELECT with keyword options; returns DataFrame."""
        cmd = SqlCommand(dbms=options.pop("dbms", ""), options=options, statement=statement)
        return self._execute(cmd)

    # ------------------------------------------------------------ admin

    def _try_admin(self, command: str):
        """Dispatch admin commands; None if `command` is a sql command.
        (Reference command tree: member_cmd.py:21051-21090, 16740.)"""
        import re as _re

        from edgelake_spark import admin

        text = command.strip()
        m = _re.match(r"create\s+view\s+(\S+)\s*\((.*)\)\s*$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            qualified, spec = m.group(1), m.group(2)
            source = catalog.view_name(qualified)
            columns = admin.parse_view_columns(spec)
            view_name = f"__el_view_{len(self.views)}"
            self.spark.sql(admin.create_view_sql(columns, source)).createOrReplaceTempView(
                view_name
            )
            self.views[qualified] = view_name
            return self.spark.table(view_name)
        m = _re.match(r"get\s+rows\s+count(\s+where\s+(.*))?$", text, _re.IGNORECASE)
        if m:
            tables = None
            estimate = False
            if m.group(2):
                tm = _re.search(r"table\s*=\s*(\S+)", m.group(2))
                if tm:
                    tables = [self._resolve(tm.group(1))]
                estimate = bool(
                    _re.search(r"estimate\s*=\s*true", m.group(2), _re.IGNORECASE)
                )
            if tables is None:
                tables = [t for t in catalog.TESTDATA_TABLES if self.spark.catalog.tableExists(t)]
            if estimate and self.sf_dir:
                from edgelake_spark.admin import rows_count_estimate

                rows = rows_count_estimate(self.sf_dir, tables)
                return self.spark.createDataFrame(
                    rows or [], "table_name string, n_rows long"
                )
            from edgelake_spark.admin import rows_count

            return rows_count(self.spark, tables)
        m = _re.match(r"info\s+(?:table|view)\s+(\S+)\s+(\S+)\s+columns$", text, _re.IGNORECASE)
        if m:
            # `info view` (member_cmd.py:20984) shares the resolver:
            # `create view` mappings live in self.views like tables —
            # try the dbms-qualified name first (create view registers
            # `vdb.events`, not the bare short name)
            from edgelake_spark.admin import info_table_columns

            return info_table_columns(
                self.spark, self._resolve(f"{m.group(1)}.{m.group(2)}")
            )
        m = _re.match(r"info\s+(?:table|view)\s+(\S+)\s+(\S+)\s+exists$", text, _re.IGNORECASE)
        if m:
            # exists iff a query on <dbms>.<table> would resolve — the
            # engine's table namespace is dbms-agnostic for registered
            # tables (sql <any-dbms> "... from events" works), so the
            # short-name fallback is deliberate, not a qualifier leak
            exists = self.spark.catalog.tableExists(
                self._resolve(f"{m.group(1)}.{m.group(2)}")
            )
            return self.spark.createDataFrame(
                [(m.group(2), exists)], "table_name string, table_exists boolean"
            )
        m = _re.match(
            r"backup\s+table\s+where\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL
        )
        if m:
            # reference member_cmd.py:21135 backup table: write the
            # table's data to `dest` as JSON (one file; the reference
            # writes per partition — one logical snapshot here)
            import os as _os

            opts = {k.lower(): v for k, v in _re.findall(r"(\w+)\s*=\s*(\S+)", m.group(1))}
            if "table" not in opts or "dest" not in opts:
                raise ValueError("backup table needs table = ... and dest = ...")
            resolved = self._resolve(
                f"{opts['dbms']}.{opts['table']}" if opts.get("dbms") else opts["table"]
            )
            df = self.spark.table(resolved)
            _os.makedirs(opts["dest"], exist_ok=True)
            out = _os.path.join(opts["dest"], f"{opts['table']}.backup.json")
            # toJSON streams executor-side partitions; the driver writes
            # line by line (operator-facing export, like file retrieve)
            n = 0
            with open(out, "w") as fh:
                for line in df.toJSON().toLocalIterator():
                    fh.write(line + "\n")
                    n += 1
            self.event_log.add("File", f"backup table {opts['table']}")
            return self.spark.createDataFrame(
                [(opts["table"], out, n)], "table_name string, dest string, n_rows bigint"
            )
        m = _re.match(r"get\s+table\s+versions(\s+where\s+(.*))?$", text, _re.IGNORECASE)
        if m:
            # commit-log history of log-backed tables (txlog.py): one
            # row per committed version (Delta `DESCRIBE HISTORY` shape)
            flt = self._meta_filters(m.group(2))
            rows = []
            for key, tx in sorted(self.tx_tables.items()):
                kind, _, name = key.partition("/")
                if flt.get("table"):
                    # blob-store keys are "dbms.table"; match the short
                    # table name as well as the full key
                    want = flt["table"]
                    short = name.rsplit(".", 1)[-1]
                    if catalog.view_name(want) not in (name, short):
                        continue
                for man in tx.history():
                    rows.append(
                        (kind, name, man["version"], man["op"],
                         man["timestamp"], len(man["files"]))
                    )
            return self.spark.createDataFrame(
                rows or [],
                "store string, table_name string, version int, op string, "
                "committed_at string, n_files int",
            )
        m = _re.match(r"get\s+partitions(\s+where\s+(.*))?$", text, _re.IGNORECASE)
        if m:
            from edgelake_spark.admin import get_partitions

            table = None
            if m.group(2):
                tm = _re.search(r"table\s*=\s*(\S+)", m.group(2))
                if tm:
                    table = tm.group(1)
            from edgelake_spark.ingest.partitions import tx_partitions
            from edgelake_spark.txlog import TxTable

            rows = []
            for name, path in sorted(self.partitioned_paths.items()):
                if table and catalog.view_name(name) != catalog.view_name(table):
                    continue
                buckets = (
                    tx_partitions(TxTable(path))
                    if TxTable.exists(path)
                    else get_partitions(path)
                )
                for bucket in buckets:
                    rows.append((name, bucket))
            return self.spark.createDataFrame(
                rows or [], "table_name string, partition string"
            )
        m = _re.match(
            r"set\s+streaming\s+conditions?\s+where\s+(.*?)\s+(if\s+.*)$",
            text,
            _re.IGNORECASE | _re.DOTALL,
        )
        if m:
            # reference member_cmd.py:18886 set streaming condition
            from edgelake_spark.streaming.conditions import StreamingCondition

            head, rule = m.group(1), m.group(2)
            opts = dict(_re.findall(r"\b(dbms|table|limit)\s*=\s*(\S+)", head, _re.IGNORECASE))
            key = f"{opts.get('dbms', '')}.{opts.get('table', '*')}"
            cond = StreamingCondition.parse(rule, limit=int(opts.get("limit", 0)))
            self.streaming_conditions.setdefault(key, []).append(cond)
            return self.spark.createDataFrame(
                [(key, len(self.streaming_conditions[key]) - 1, rule.strip())],
                "table_key string, condition_id int, rule string",
            )
        m = _re.match(
            r"get\s+streaming\s+conditions(\s+where\s+(.*))?$", text, _re.IGNORECASE
        )
        if m:
            filt = dict(_re.findall(r"\b(dbms|table)\s*=\s*(\S+)", m.group(2) or "", _re.IGNORECASE))
            rows = []
            for key, conds in sorted(self.streaming_conditions.items()):
                dbms, _, table = key.partition(".")
                if filt.get("dbms") and filt["dbms"] != dbms:
                    continue
                if filt.get("table") and filt["table"] != table:
                    continue
                for i, c in enumerate(conds):
                    rows.append((key, i, c.column, c.op, c.value, c.action, c.limit))
            return self.spark.createDataFrame(
                rows or [],
                "table_key string, condition_id int, column string, op string, "
                "value string, action string, limit int",
            )
        m = _re.match(
            r"reset\s+streaming\s+conditions?\s+where\s+(.*)$", text, _re.IGNORECASE
        )
        if m:
            # reference member_cmd.py:18743 reset streaming condition
            opts = m.group(1)
            ids = [int(v) for v in _re.findall(r"\bid\s*=\s*(\d+)", opts)]
            kv = dict(_re.findall(r"\b(dbms|table)\s*=\s*(\S+)", opts, _re.IGNORECASE))
            key = f"{kv.get('dbms', '')}.{kv.get('table', '*')}"
            removed = 0
            if key in self.streaming_conditions:
                if ids:
                    conds = self.streaming_conditions[key]
                    self.streaming_conditions[key] = [
                        c for i, c in enumerate(conds) if i not in ids
                    ]
                    removed = len(conds) - len(self.streaming_conditions[key])
                else:
                    removed = len(self.streaming_conditions.pop(key))
            return self.spark.createDataFrame([(removed,)], "removed int")
        m = _re.match(r"data\s+monitor\s+where\s+(.*)$", text, _re.IGNORECASE)
        if m:
            # reference data_monitor.py:16-20 `data monitor where dbms=..
            # and intervals=N and time=K unit and value_column=v`
            from edgelake_spark.streaming.monitor import DataMonitor

            opts = dict(
                _re.findall(
                    r"\b(dbms|table|intervals|time|value_column)\s*=\s*"
                    r"(\S+(?:\s+(?!and\b)\w+)?)",
                    m.group(1),
                    _re.IGNORECASE,
                )
            )
            tm = _re.match(r"(\d+)(?:\s+(\w+))?", opts.get("time", "1 minute"))
            secs = int(tm.group(1)) * {"second": 1, "minute": 60, "hour": 3600}.get(
                (tm.group(2) or "minute").rstrip("s"), 60
            )
            key = f"{opts.get('dbms', '')}.{opts.get('table', '*')}"
            self.monitors[key] = DataMonitor(
                value_column=opts.get("value_column", "value"),
                intervals=int(opts.get("intervals", 10)),
                interval_seconds=secs,
            )
            return self.spark.createDataFrame(
                [(key, int(opts.get("intervals", 10)), secs)],
                "table_key string, intervals int, interval_seconds int",
            )
        m = _re.match(r"get\s+data\s+monitor(\s+where\s+(.*))?$", text, _re.IGNORECASE)
        if m:
            filt = dict(_re.findall(r"\b(dbms|table)\s*=\s*(\S+)", m.group(2) or "", _re.IGNORECASE))
            rows = []
            for key, mon in sorted(self.monitors.items()):
                dbms, _, table = key.partition(".")
                if filt.get("dbms") and filt["dbms"] != dbms:
                    continue
                if filt.get("table") and filt["table"] != table:
                    continue
                for s in mon.snapshot():
                    rows.append(
                        (key, s["interval"], s["count"], s["min"], s["max"], s["sum"])
                    )
            return self.spark.createDataFrame(
                rows or [],
                "table_key string, interval int, count bigint, min double, max double, sum double",
            )
        if _re.fullmatch(r"get\s+status", text, _re.IGNORECASE):
            # reference `get status` liveness probe (member_cmd.py:15830
            # reply "<node name> running") — single-engine answer keeps
            # the Spark app coordinates as extra columns
            sc = self.spark.sparkContext
            name = self.params.get("node_name", "edgelake-spark")
            return self.spark.createDataFrame(
                [(f"{name} running", sc.appName, sc.master, sc.defaultParallelism)],
                "status string, app string, master string, parallelism int",
            )
        m = _re.match(r"query\s+destination(\s+(\S+))?$", text, _re.IGNORECASE)
        if m:
            # reference `query destination [all/ID]` (member_cmd.py:13191
            # get_query_dest): per job, the (Job, Destination, DBMS,
            # Table, Command) rows naming which nodes served the query.
            # Single-engine Spark has no peer nodes; the faithful answer
            # is which STORAGE each job actually read — the file-scan
            # locations from the captured physical plan, with the
            # scan-time pruning predicates (partition + pushed filters)
            # that decided how much of the table was touched.
            sel = (m.group(2) or "").strip().lower()
            if self.query_log:
                if sel == "all":
                    entries = list(self.query_log)
                elif sel.isdigit():
                    # an unknown job id yields an EMPTY result — falling
                    # back to the latest entry would silently report a
                    # different job's destinations
                    entries = [
                        e for e in self.query_log if e["job_id"] == int(sel)
                    ]
                else:
                    entries = [self.query_log[-1]]
            else:
                entries = []
            rows = []
            for e in entries:
                for dest in self._plan_destinations(self._entry_plan(e)):
                    rows.append(
                        (
                            e["job_id"],
                            dest["location"],
                            e.get("dbms") or "",
                            dest["table"],
                            dest["filters"],
                            e["statement"],
                        )
                    )
            return self.spark.createDataFrame(
                rows or [],
                "job_id bigint, destination string, dbms string, "
                "table_name string, scan_filters string, statement string",
            )
        m = _re.match(r"query\s+(status|explain)(\s+(\S+))?$", text, _re.IGNORECASE)
        if m:
            # reference `query status/explain` (member_cmd.py:21665,
            # _query_status :7332): show the source statement, the
            # rewritten local SQL, and (explain) the physical plan
            which = m.group(1).lower()
            sel = m.group(3)
            if which == "status":
                rows = [
                    (e["job_id"], e["statement"], e["rewritten_sql"], e["pass_through"])
                    for e in self.query_log
                ]
                return self.spark.createDataFrame(
                    rows or [],
                    "job_id bigint, statement string, rewritten_sql string, pass_through boolean",
                )
            if not self.query_log:
                return self.spark.createDataFrame([], "job_id bigint, plan string")
            if sel and sel.strip().isdigit():
                entry = next(
                    (e for e in self.query_log if e["job_id"] == int(sel)), self.query_log[-1]
                )
            else:  # non-numeric / "last" selectors fall back to latest
                entry = self.query_log[-1]
            return self.spark.createDataFrame(
                [(entry["job_id"], self._entry_plan(entry))], "job_id bigint, plan string"
            )
        m = _re.match(
            r"test\s+table\s+(\S+)\s+where\s+dbms\s*=\s*(\S+)\s*$", text, _re.IGNORECASE
        )
        if m:
            # reference member_cmd.py:14816 test_table — ledger schema
            # vs live schema consistency check
            rows = admin.test_table_schema(
                self.spark, self.policy_store, m.group(2), m.group(1), self._resolve
            )
            return self.spark.createDataFrame(
                rows, "dbms string, table_name string, result string"
            )
        if _re.fullmatch(r"get\s+streaming", text, _re.IGNORECASE):
            # reference streaming_data.py:713 show_info — flush
            # thresholds + per-stream counters; live micro-batch stats
            # come from Spark's own streaming progress
            from edgelake_spark.streaming.ingest import (
                DEFAULT_MAX_TIME_SEC,
                DEFAULT_MAX_VOLUME_BYTES,
            )

            rows = [
                ("config", "threshold_time_sec", str(DEFAULT_MAX_TIME_SEC)),
                ("config", "threshold_volume_bytes", str(DEFAULT_MAX_VOLUME_BYTES)),
            ]
            for ing in self.stream_ingests:
                rows.append(
                    ("ingest", ing.target_dir, f"flushed_rows={ing.rows_flushed}")
                )
            for topic, cfg in sorted(self.broker_consumers.items()):
                rows.append(
                    ("consumer", topic, f"{cfg['topic'].dbms}.{cfg['topic'].table}")
                )
            for q in self.spark.streams.active:
                p = q.lastProgress
                n = p["numInputRows"] if p else 0
                rows.append(("stream", q.name or q.id, f"active input_rows={n}"))
            return self.spark.createDataFrame(
                rows, "scope string, item string, value string"
            )
        if _re.fullmatch(r"test\s+node", text, _re.IGNORECASE):
            # reference test_node: validate the node's own services; here
            # the checks are catalog reachability and ledger integrity
            checks = []
            try:
                n = len(self.spark.catalog.listTables())
                checks.append(("catalog", f"Passed ({n} tables)"))
            except Exception as exc:
                checks.append(("catalog", f"Failed: {exc}"))
            checks.append(("ledger", f"Passed ({len(self.policy_store.policies)} policies)"))
            checks.append(
                ("sql", "Passed" if self.spark.sql("SELECT 1").collect()[0][0] == 1 else "Failed")
            )
            return self.spark.createDataFrame(checks, "service string, result string")
        m = _re.match(r"blockchain\s+(insert|get|load|save)\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            return self._blockchain_cmd(m.group(1).lower(), m.group(2).strip())
        m = _re.match(
            r"create\s+policy\s+(\w+)(\s+with\s+defaults)?(?:\s+where\s+(.*))?$",
            text,
            _re.IGNORECASE | _re.DOTALL,
        )
        if m:
            return self._create_policy(
                m.group(1).lower(), bool(m.group(2)), m.group(3)
            )
        m = _re.match(
            r"get\s+data\s+nodes(\s+where\s+(.*))?$", text, _re.IGNORECASE | _re.DOTALL
        )
        if m:
            from edgelake_spark.admin import get_data_nodes

            return get_data_nodes(self.spark, self.policy_store, **self._meta_filters(m.group(2)))
        m = _re.match(
            r"get\s+virtual\s+tables(\s+info)?(\s+where\s+(.*))?$",
            text,
            _re.IGNORECASE | _re.DOTALL,
        )
        if m:
            from edgelake_spark.admin import get_virtual_tables

            return get_virtual_tables(
                self.spark,
                self.policy_store,
                with_info=bool(m.group(1)),
                **self._meta_filters(m.group(3)),
            )
        m = _re.match(
            r"run\s+(kafka\s+consumer|mqtt\s+client|msg\s+client)\s+where\s+(.*)$",
            text,
            _re.IGNORECASE | _re.DOTALL,
        )
        if m:
            # registers the consumer config; BrokerConsumer.start runs
            # the stream. `run msg client` (member_cmd.py:21408 — the
            # reference's current name), its older `run mqtt client`
            # spelling (mqtt_client.py:2128) and `run kafka consumer`
            # (member_cmd.py:21481) share the same topic→bring mapping
            # semantics, so one parser serves all three; the transport
            # kind is kept so BrokerConsumer picks the MQTT socket
            # subscriber (streaming/mqtt.py) vs the Kafka source.
            from edgelake_spark.streaming.broker import parse_kafka_consumer_command

            cfg = parse_kafka_consumer_command(text)
            cfg["transport"] = (
                "kafka" if m.group(1).lower().startswith("kafka") else "mqtt"
            )
            # attach any conditions/monitor registered for the target
            # table, so the consumer topology picks them up at start
            tkey = f"{cfg['topic'].dbms}.{cfg['topic'].table}"
            cfg["conditions"] = self.streaming_conditions.get(tkey, [])
            cfg["monitor"] = self.monitors.get(tkey)
            self.broker_consumers[cfg["topic"].name] = cfg
            return self.spark.createDataFrame(
                [(cfg["topic"].name, f"{cfg['ip']}:{cfg['port']}", cfg["reset"])],
                "topic string, bootstrap string, reset string",
            )
        m = _re.match(
            r"drop\s+partition\s+where\s+table\s*=\s*(\S+)\s+and\s+date\s*<\s*'?([\w-]+)'?$",
            text,
            _re.IGNORECASE,
        )
        if m:
            from edgelake_spark.ingest.partitions import (
                drop_partitions_before,
                drop_partitions_before_tx,
            )
            from edgelake_spark.txlog import TxTable

            table, cutoff = m.group(1), m.group(2)
            path = self.partitioned_paths[table]
            if TxTable.exists(path):
                # log-backed dataset: the drop is a manifest edit (no
                # file deletes); prior versions still read the buckets
                dropped = drop_partitions_before_tx(TxTable(path), cutoff)
            else:
                dropped = drop_partitions_before(self.spark, path, cutoff)
                # the temp view's cached file index still lists the
                # deleted files — refresh or the next query on the
                # table dies with FileNotFoundException
                self.spark.catalog.refreshByPath(path)
            self.attach_partitioned(table, path)
            return self.spark.createDataFrame(
                [(b,) for b in dropped] or [], "dropped_partition string"
            )
        m = _re.match(r"run\s+message\s+broker(\s+where\s+(.*))?$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference member_cmd.py:21457 `run message broker where
            # internal_ip/internal_port`: the node's local broker that
            # MQTT devices publish into (tcpip/message_server.py). Here
            # it starts the real-framing broker doubles — MQTT 3.1.1 and
            # Kafka wire protocol — so `run kafka consumer` /
            # `run mqtt client` round-trip over genuine sockets.
            opts = {
                k.lower(): v
                for k, v in _re.findall(r"(\w+)\s*=\s*(\S+)", m.group(2) or "")
            }
            host = opts.get("internal_ip", opts.get("ip", "127.0.0.1"))
            port = int(opts.get("internal_port", opts.get("port", 0)))
            proto = opts.get("protocol", "mqtt").lower()
            if proto == "kafka":
                from edgelake_spark.streaming.kafka import KafkaBroker

                broker = KafkaBroker(host, port).start()
            else:
                from edgelake_spark.streaming.mqtt import MqttBroker

                broker = MqttBroker(host, port).start()
            self.message_brokers = getattr(self, "message_brokers", [])
            self.message_brokers.append(broker)
            self.event_log.add("Event", f"Message broker declared ({proto})")
            return self.spark.createDataFrame(
                [(proto, broker.host, broker.port)],
                "protocol string, ip string, port int",
            )
        m = _re.match(r"run\s+rest\s+server(\s+where\s+(.*))?$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference member_cmd.py:21323 `run rest server where
            # internal_ip = .. and internal_port = .. [user/password]`;
            # SSL termination is a deployment-proxy concern here
            from edgelake_spark.api.rest import EdgeLakeRestServer

            opts = {
                k.lower(): v
                for k, v in _re.findall(r"(\w+)\s*=\s*(\S+)", m.group(2) or "")
            }
            basic = None
            if "user" in opts or "password" in opts:
                basic = (opts.get("user", ""), opts.get("password", ""))
            server = EdgeLakeRestServer(
                self,
                host=opts.get("internal_ip", opts.get("ip", "127.0.0.1")),
                port=int(opts.get("internal_port", opts.get("port", 0))),
                auth_token=opts.get("token"),
                basic_auth=basic,
            ).start()
            self.event_log.add("Event", "REST server declared")
            return self.spark.createDataFrame(
                [(server.host, server.port, basic is not None or bool(opts.get("token")))],
                "ip string, port int, auth boolean",
            )
        m = _re.match(r"run\s+operator\s+where\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference member_cmd.py:21740 / members/aloperator.py:
            # watch-dir → table ingest loop; tick-driven here
            import os as _os

            from edgelake_spark.ingest.operator import OperatorNode

            opts = {k.lower(): v for k, v in _re.findall(r"(\w+)\s*=\s*(\S+)", m.group(1))}

            def flag(key: str, default: bool) -> bool:
                return opts.get(key, str(default)).lower() in ("true", "1")

            if "watch_dir" not in opts:
                raise ValueError("run operator needs watch_dir = ...")
            self.operator = OperatorNode(
                engine=self,
                watch_dir=opts["watch_dir"],
                err_dir=opts.get("err_dir", _os.path.join(opts["watch_dir"], "..", "err")),
                archive_dir=opts.get(
                    "archive_dir", _os.path.join(opts["watch_dir"], "..", "archive")
                ),
                create_table=flag("create_table", True),
                update_tsd_info=flag("update_tsd_info", True),
                archive_json=flag("archive_json", True),
                compress_json=flag("compress_json", True),
            )
            self.event_log.add("Event", "Operator declared")
            return self.spark.createDataFrame(
                [(opts["watch_dir"], self.operator.create_table, self.operator.update_tsd_info)],
                "watch_dir string, create_table boolean, update_tsd_info boolean",
            )
        m = _re.match(r"get\s+operator\s*$", text, _re.IGNORECASE)
        if m:
            if getattr(self, "operator", None) is None:
                raise ValueError("no operator is running")
            return self.spark.createDataFrame(
                [self.operator.status()],
                "files_processed bigint, files_errored bigint, rows_ingested bigint, last_error string",
            )
        m = _re.match(r"delete\s+archive\s+where\s+days\s*=\s*(\d+)\s*$", text, _re.IGNORECASE)
        if m:
            # reference member_cmd.py:17312: drop archive day dirs older
            # than N days (applies to both archivers' trees)
            from datetime import timedelta

            from edgelake_spark.ingest.operator import delete_archive_before

            cutoff_dt = (self.now or __import__("datetime").datetime.utcnow()) - timedelta(
                days=int(m.group(1))
            )
            key = cutoff_dt.strftime("%y%m%d")
            cutoff = (key[0:2], key[2:4], key[4:6])
            deleted = []
            for holder in (getattr(self, "archiver", None), getattr(self, "operator", None)):
                if holder is not None:
                    deleted += delete_archive_before(holder.archive_dir, cutoff)
            return self.spark.createDataFrame(
                [(d,) for d in sorted(set(deleted))] or [], "deleted_day string"
            )
        m = _re.match(r"flush\s+buffers\s*$", text, _re.IGNORECASE)
        if m:
            # reference flush_memory_buffs: force buffered streaming
            # data to disk ignoring thresholds → drain every active
            # Structured Streaming query + one operator/archiver tick
            drained = 0
            for q in self.spark.streams.active:
                try:
                    q.processAllAvailable()
                    drained += 1
                except Exception:  # a dying query must not block a flush
                    continue
            for holder in (getattr(self, "operator", None), getattr(self, "archiver", None)):
                if holder is not None:
                    try:
                        holder.process_once()
                        drained += 1
                    except Exception:  # same policy as the queries: a
                        continue       # broken watch dir must not block

            self.event_log.add("Event", "Buffers flushed")
            return self.spark.createDataFrame([(drained,)], "flushed int")
        m = _re.match(
            r"connect\s+dbms\s+(\S+)\s+where\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL
        )
        if m:
            # reference member_cmd.py:20899 `connect dbms <name> where
            # type = sqlite/psql/..`: declare a logical dbms. Here every
            # engine type maps to the parquet layer; `path = <dir>`
            # attaches the directory's parquet files as <name>.<table>
            import os as _os

            name = m.group(1)
            opts = {k.lower(): v for k, v in _re.findall(r"(\w+)\s*=\s*(\S+)", m.group(2))}
            if not hasattr(self, "connected_dbms"):
                self.connected_dbms: dict[str, list[str]] = {}
            attached = []
            path = opts.get("path")
            if path:
                for f in sorted(_os.listdir(path)):
                    if f.endswith(".parquet"):
                        t = f[: -len(".parquet")]
                        view = f"__dbms_{name}_{t}"
                        catalog.load_parquet(
                            self.spark, _os.path.join(path, f)
                        ).createOrReplaceTempView(view)
                        self.views[f"{name}.{t}"] = view
                        attached.append(t)
            self.connected_dbms[name] = [f"{name}.{t}" for t in attached]
            self.event_log.add("Event", f"DBMS {name} connected")
            return self.spark.createDataFrame(
                [(name, opts.get("type", "parquet"), len(attached))],
                "dbms string, type string, n_tables int",
            )
        m = _re.match(r"(?:disconnect|drop)\s+dbms\s+(\S+)\s*$", text, _re.IGNORECASE)
        if m:
            # disconnect keeps the storage; drop additionally forgets
            # any managed/DML state of the dbms's tables (the raw
            # parquet inputs are immutable and never deleted)
            import shutil as _shutil

            drop = text.lower().startswith("drop")
            name = m.group(1)
            dropped = getattr(self, "connected_dbms", {}).pop(name, [])
            doomed_views: set[str] = set()
            for qualified in dropped:
                target = self.views.pop(qualified, None)
                # the attach-time temp views are per-dbms; drop them so
                # repeated connect/disconnect cycles don't leak one
                # cached view per table for the session lifetime
                if target and target.startswith(f"__dbms_{name}_"):
                    doomed_views.add(target)
            if drop:
                for qualified in [k for k in self.views if k.startswith(f"{name}.")]:
                    target = self.views.pop(qualified)
                    if target.startswith("__"):  # engine-managed only —
                        # a `create view` alias may target a base table
                        doomed_views.add(target)
                    # managed/DML state of this dbms's tables: the
                    # commit log is keyed by short name (`dml/<t>`);
                    # find it through the qualified alias target
                    short = qualified.split(".", 1)[1]
                    tx = self.tx_tables.pop(f"dml/{catalog.view_name(short)}", None)
                    if tx is not None:
                        _shutil.rmtree(tx.path, ignore_errors=True)
                for key in [k for k in self.tx_tables if k.startswith(f"blobs/{name}.")]:
                    tx = self.tx_tables.pop(key)
                    _shutil.rmtree(tx.path, ignore_errors=True)
                # the blob registry and its temp views must go with the
                # logs, or `file retrieve` would scan the rmtree'd path
                # and re-stores would hit stale duplicate-hash checks
                for bkey in [k for k in self.blob_views if k[0] == name]:
                    doomed_views.add(self.blob_views.pop(bkey))
                    self.blob_rows.pop(bkey, None)
                self.event_log.add("Event", f"DBMS {name} dropped")
            # purge the doomed temp views and every remaining alias
            # (bare short names included) that still points at them
            self._purge_doomed_views(doomed_views)
            return self.spark.createDataFrame(
                [(name, len(dropped))], "dbms string, n_tables int"
            )
        m = _re.match(
            r"(replace|prepare)\s+policy\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL
        )
        if m:
            # prepare policy: stamp id/date WITHOUT inserting (reference
            # prepares a policy for a later blockchain insert); replace
            # policy where id = X with <json>: drop old, insert new
            import json as _json

            from edgelake_spark.policies.bring import stamp_policy

            verb, rest = m.group(1).lower(), m.group(2).strip()
            if verb == "prepare":
                stamped = stamp_policy(_json.loads(rest))
                body = next(iter(stamped.values()))
                return self.spark.createDataFrame(
                    [(_json.dumps(stamped), body.get("id", ""))],
                    "policy string, policy_id string",
                )
            rm = _re.match(r"where\s+id\s*=\s*(\S+)\s+with\s+(.*)$", rest, _re.IGNORECASE | _re.DOTALL)
            if not rm:
                raise ValueError("replace policy where id = <id> with <json>")
            old_id = rm.group(1).strip("'\"")
            n_removed = self.policy_store.remove_by_id(old_id)
            self.policy_store.add(_json.loads(rm.group(2)))
            return self.spark.createDataFrame(
                [(old_id, n_removed)],
                "replaced_id string, n_policies int",
            )
        m = _re.match(
            r"create\s+work\s+directories(\s+where\s+root\s*=\s*(\S+))?\s*$",
            text,
            _re.IGNORECASE,
        )
        if m:
            # reference utils_io._create_anylog_dirs: the operator node's
            # standard directory tree; root defaults to the engine work
            # dir so a durable node gets its dirs beside the commit logs
            import os as _os

            root = m.group(2) or self._work_dir()
            names = ("watch", "bwatch", "blobs", "archive", "err", "data", "scripts")
            made = []
            for n in names:
                p = _os.path.join(root, n)
                _os.makedirs(p, exist_ok=True)
                self.params[f"{n}_dir"] = p  # !watch_dir etc. resolve
                made.append(p)
            return self.spark.createDataFrame(
                [(n, p) for n, p in zip(names, made)], "name string, path string"
            )
        m = _re.match(
            r"drop\s+table\s+(\S+)(?:\s+where\s+dbms\s*=\s*(\S+))?\s*$", text, _re.IGNORECASE
        )
        if m:
            # reference drop table: remove the operator-local table.
            # Drops the view mappings and the table's commit log (the
            # raw sf_dir parquet is immutable input, never deleted).
            import shutil as _shutil

            table, dbms = m.group(1), m.group(2)
            key = catalog.view_name(table)
            removed = []
            for alias in [table, key] + ([f"{dbms}.{table}"] if dbms else []):
                if self.views.pop(alias, None) is not None:
                    removed.append(alias)
            tx = self.tx_tables.pop(f"dml/{key}", None)
            if tx is not None:
                _shutil.rmtree(tx.path, ignore_errors=True)
            removed += self._purge_doomed_views({f"__dml_{key}", f"__ingest_{key}"})
            self.event_log.add("Event", f"Table {table} dropped")
            return self.spark.createDataFrame(
                [(table, bool(removed or tx))], "table_name string, dropped boolean"
            )
        m = _re.match(
            r"(?:drop|delete)\s+policy\s+where\s+id\s*=\s*(\S+)\s*$", text, _re.IGNORECASE
        )
        if m:
            # reference drop policy / blockchain delete policy
            pid = m.group(1).strip("'\"")
            n = self.policy_store.remove_by_id(pid)
            return self.spark.createDataFrame([(pid, n)], "policy_id string, n_dropped int")
        m = _re.match(r"run\s+blobs\s+archiver\s+where\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference alarchiver.data_archiver flags (member_cmd:
            # `run blobs archiver where dbms = true and folder = true and
            # compress = false and reuse_blobs = true`); tick-driven here
            # (archiver.process_once()) like the task scheduler
            import os as _os

            from edgelake_spark.ingest.archiver import BlobArchiver

            opts = {k.lower(): v for k, v in _re.findall(r"(\w+)\s*=\s*(\S+)", m.group(1))}

            def flag(key: str, default: bool) -> bool:
                return opts.get(key, str(default)).lower() in ("true", "1")

            for req in ("bwatch_dir", "blobs_dir", "archive_dir"):
                if req not in opts:
                    raise ValueError(f"run blobs archiver needs {req} = ...")
            self.archiver = BlobArchiver(
                engine=self,
                bwatch_dir=opts["bwatch_dir"],
                blobs_dir=opts["blobs_dir"],
                archive_dir=opts["archive_dir"],
                watch_dir=opts.get(
                    "watch_dir", _os.path.join(opts["archive_dir"], "..", "watch")
                ),
                err_dir=opts.get(
                    "err_dir", _os.path.join(opts["archive_dir"], "..", "err")
                ),
                update_dbms=flag("dbms", True),
                archive_folder=flag("folder", True),
                compress=flag("compress", True),
                reuse_blobs=flag("reuse_blobs", False),
            )
            self.event_log.add("Event", "Blobs archiver declared")
            return self.spark.createDataFrame(
                [(self.archiver.status(),)], "archiver string"
            )
        m = _re.match(r"get\s+archived\s+files(\s+([\d-]+))?\s*$", text, _re.IGNORECASE)
        if m:
            if getattr(self, "archiver", None) is None:
                raise ValueError("no blobs archiver is running")
            rows = self.archiver.archived_files(m.group(2))
            return self.spark.createDataFrame(
                rows or [],
                "archive_date string, file_name string, n_bytes bigint, compressed boolean",
            )
        m = _re.match(r"file\s+store\s+where\s+(.*)$", text, _re.IGNORECASE)
        if m:
            self.event_log.add("File", f"file store where {m.group(1)}")
            return self._file_store(m.group(1))
        m = _re.match(r"file\s+retrieve\s+where\s+(.*)$", text, _re.IGNORECASE)
        if m:
            self.event_log.add("File", f"file retrieve where {m.group(1)}")
            return self._file_retrieve(m.group(1))
        m = _re.match(r"get\s+files\s+count(\s+where\s+(.*))?$", text, _re.IGNORECASE)
        if m:
            self._load_all_blobs()
            flt = self._meta_filters(m.group(2))
            rows = []
            for (dbms, table), view in sorted(self.blob_views.items()):
                if flt.get("dbms") and dbms != flt["dbms"]:
                    continue
                if flt.get("table") and table != flt["table"]:
                    continue
                rows.append((dbms, table, len(self.blob_rows.get((dbms, table), ()))))
            return self.spark.createDataFrame(
                rows or [], "dbms string, table_name string, n_files bigint"
            )
        m = _re.match(r"set\s+([A-Za-z_]\w*)\s*=\s*(.*)$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # node dictionary write (reference params.add_param,
            # params.py:231): empty value removes the key. `set
            # streaming condition ...` never reaches here (no `=` after
            # the first word) and is handled above.
            key, value = m.group(1), m.group(2).strip()
            if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
                value = value[1:-1]
            if value:
                self.params[key] = value
                action = "set"
            else:
                self.params.pop(key, None)
                action = "removed"
            return self.spark.createDataFrame(
                [(key, value, action)], "key string, value string, action string"
            )
        if _re.fullmatch(r"get\s+dictionary(\s+where\s+.*)?", text, _re.IGNORECASE):
            # reference member_cmd.py:17191 `get dictionary`
            rows = sorted(self.params.items())
            return self.spark.createDataFrame(
                rows or [], "key string, value string"
            )
        m = _re.match(r"echo\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference _echo (member_cmd.py:7484): write a message to
            # the node console/echo queue — the scheduler examples use
            # `task echo "..."`; here the message is the result row
            msg = m.group(1).strip()
            if len(msg) >= 2 and msg[0] == msg[-1] and msg[0] in "\"'":
                msg = msg[1:-1]
            self.event_log.add("Event", msg)
            return self.spark.createDataFrame([(msg,)], "echo string")
        m = _re.match(r"print\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference _print (member_cmd.py `print` command): console
            # output with `!name` dictionary substitution — the global
            # substitution above already resolved known keys
            msg = m.group(1).strip()
            if len(msg) >= 2 and msg[0] == msg[-1] and msg[0] in "\"'":
                msg = msg[1:-1]
            return self.spark.createDataFrame([(msg,)], "print string")
        m = _re.match(
            r"monitor\s+(\w+)\s+where\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL
        )
        if m:
            # reference monitor.monitor_info (`monitor <topic> where
            # ip = .. and name = .. and info = {json}`): nodes push
            # status structs per topic; `get monitored [topic]` reads
            # them back with the update time
            import json as _json
            from datetime import datetime as _dt

            topic = m.group(1).lower()
            rest = m.group(2)
            im = _re.search(r"info\s*=\s*(\{.*\})\s*$", rest, _re.DOTALL)
            if not im:
                raise ValueError("monitor: info = {json} is required")
            info = _json.loads(im.group(1))
            opts = {
                k.lower(): v.strip("'\"")
                for k, v in _re.findall(
                    r"(\w+)\s*=\s*(\"[^\"]*\"|'[^']*'|\S+)", rest[: im.start()]
                )
            }
            node = opts.get("name") or opts.get("ip") or "local"
            if opts.get("name") and opts.get("ip"):
                node = f"{opts['name']}@{opts['ip']}"
            if not hasattr(self, "monitor_status"):
                self.monitor_status = {}
            stamp = (self.now or _dt.now()).strftime("%Y-%m-%d %H:%M:%S")
            self.monitor_status.setdefault(topic, {})[node] = {
                **info,
                "Update time": stamp,
            }
            return self.spark.createDataFrame(
                [(topic, node, len(info))], "topic string, node string, n_keys int"
            )
        m = _re.match(r"get\s+monitored(?:\s+(\w+))?$", text, _re.IGNORECASE)
        if m:
            import json as _json

            store = getattr(self, "monitor_status", {})
            if not m.group(1):
                return self.spark.createDataFrame(
                    [(t,) for t in sorted(store)] or [], "topic string"
                )
            topic = m.group(1).lower()
            if topic not in store:
                raise ValueError(f"get monitored: topic not monitored: {topic}")
            rows = [
                (node, _json.dumps(info, separators=(",", ":")))
                for node, info in sorted(store[topic].items())
            ]
            return self.spark.createDataFrame(rows, "node string, info string")
        m = _re.match(
            r"stream\s+(\{.*\}|\[.*\])\s+where\s+(.*)$", text, _re.IGNORECASE | _re.DOTALL
        )
        if m:
            # reference stream_data (`stream [json] where dbms = .. and
            # table = ..`): push rows into the table's ingest buffer —
            # the command-line door into the same path REST PUT uses
            # (rows type-inferred, unioned into the __ingest_<table>
            # view the query layer resolves)
            import json as _json

            opts = {
                k.lower(): v.strip("'\"")
                for k, v in _re.findall(r"(\w+)\s*=\s*(\"[^\"]*\"|'[^']*'|\S+)", m.group(2))
            }
            if "table" not in opts:
                raise ValueError("stream: table = is required")
            payload = _json.loads(m.group(1))
            rows = payload if isinstance(payload, list) else [payload]
            from edgelake_spark.ingest.infer import rows_to_dataframe

            df = rows_to_dataframe(self.spark, rows)
            table = opts["table"]
            name = f"{opts['dbms']}.{table}" if opts.get("dbms") else table
            view = f"__ingest_{table}"
            if self.spark.catalog.tableExists(view):
                df = self.spark.table(view).unionByName(df, allowMissingColumns=True)
            df.createOrReplaceTempView(view)
            self.views[name] = view
            self.views[table] = view
            return self.spark.createDataFrame(
                [(len(rows), name)], "ingested int, table string"
            )
        m = _re.match(r"from\s+(\{.*\})\s+(bring\b.*)$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference _execute_from (`from [json] bring [paths] …`):
            # the bring language over an arbitrary JSON object — the
            # scripts' standard way to pull fields out of a policy
            # variable (`ip_port = from !selected_operator bring
            # ['operator']['ip'] ":" ['operator']['port']`). Reuses the
            # ledger's bring evaluator on a one-object list.
            import json as _json

            obj = _json.loads(m.group(1))
            result = self.policy_store.run_bring([obj], m.group(2), "*")
            if isinstance(result, list):
                result = "".join(str(v) for v in result)
            return self.spark.createDataFrame([(str(result),)], "from string")
        m = _re.match(r"time\s+file\s+(\w+)(?:\s+(.*))?$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            return self._time_file(m.group(1).lower(), (m.group(2) or "").strip())
        m = _re.match(r"help(?:\s+(.*))?$", text, _re.IGNORECASE)
        if m:
            # reference _print_help (`help [prefix]`): command inventory
            # with usage strings, filtered by prefix
            prefix = (m.group(1) or "").strip().lower()
            rows = [
                (c, u) for c, u in _COMMAND_HELP if not prefix or c.startswith(prefix)
            ]
            return self.spark.createDataFrame(
                rows or [], "command string, usage string"
            )
        m = _re.match(
            r"generate\s+insert\s+from\s+json\s+where\s+(.*)$",
            text,
            _re.IGNORECASE | _re.DOTALL,
        )
        if m:
            return self._generate_insert(m.group(1))
        m = _re.match(
            r"config\s+from\s+policy\s+where\s+id\s*=\s*(\S+)\s*$",
            text,
            _re.IGNORECASE,
        )
        if m:
            # reference config_from_policy: apply a config policy's
            # key-values to the node settings (here: the dictionary,
            # which every later command resolves through `!name`)
            pid = m.group(1).strip("'\"")
            for p in self.policy_store.policies:
                ptype = next(iter(p)) if len(p) == 1 else None
                body = p.get(ptype, {}) if ptype else {}
                if str(body.get("id", "")) == pid:
                    applied = []
                    for k, v in body.items():
                        if k in ("id", "date"):
                            continue
                        self.params[str(k)] = str(v)
                        applied.append((str(k), str(v)))
                    return self.spark.createDataFrame(
                        applied or [], "key string, value string"
                    )
            raise ValueError(f"config from policy: no policy with id {pid}")
        m = _re.match(r"json\s+(.*?)(\s+test)?\s*$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference _to_json (`json [obj] [test]`): validate a JSON
            # structure (dictionary `!name`s already substituted by the
            # global pass). `test` returns true/false; the plain form
            # returns the normalized JSON string (assignment form
            # `cluster = json !my_policy` stores it).
            import json as _json

            payload, is_test = m.group(1).strip(), bool(m.group(2))
            try:
                normalized = _json.dumps(_json.loads(payload), separators=(",", ":"))
            except ValueError:
                if is_test:
                    return self.spark.createDataFrame([("false",)], "json string")
                raise ValueError(f"json: not a valid JSON structure: {payload[:80]!r}")
            return self.spark.createDataFrame(
                [("true" if is_test else normalized,)], "json string"
            )
        m = _re.match(r"python\s+(.+)$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference _python: evaluate a Python expression over
            # dictionary values (`new_dir = python !watch_dir.rsplit(…)`)
            # — here SANDBOXED to pure expressions: no builtins, no
            # dunder access, str/int/float/len/min/max/abs/round only
            # (the reference eval()s arbitrary code; an analytics engine
            # should not)
            expr = m.group(1).strip()
            if "__" in expr or "import" in expr:
                raise ValueError("python: only pure expressions are allowed")
            safe = {
                "__builtins__": {},
                "str": str, "int": int, "float": float, "len": len,
                "min": min, "max": max, "abs": abs, "round": round,
            }
            try:
                value = eval(expr, safe, {})  # noqa: S307 — sandboxed above
            except Exception as exc:
                raise ValueError(f"python: {exc}")
            return self.spark.createDataFrame([(str(value),)], "python string")
        m = _re.match(r"incr\s+(\S+)(?:\s+(-?\d+))?\s*$", text, _re.IGNORECASE)
        if m:
            # reference _incr (member_cmd.py:12305): treat the operand as
            # an integer, add the value (default 1). Scripts use the
            # assignment form `x = incr !x 2`; `!x` resolves before this
            # handler, so the operand arrives as a numeric string.
            try:
                base = int(m.group(1))
            except ValueError:
                raise ValueError(
                    f"incr: operand is not an integer: {m.group(1)!r}"
                )
            return self.spark.createDataFrame(
                [(base + int(m.group(2) or 1),)], "incr bigint"
            )
        m = _re.match(r"get\s+status\s+where\s+(.*)$", text, _re.IGNORECASE)
        if m:
            # reference member_cmd.py:15855 get_status where-form:
            # `format = json` returns the status struct with `include =`
            # dictionary pulls. The reference writes `include = !key`;
            # here the engine's global `!name` substitution runs before
            # dispatch, so the bare-key form `include = key` is
            # canonical (a `!key` for an UNDEFINED key also works)
            name = self.params.get("node_name", "edgelake-spark")
            opts = m.group(1)
            fm = _re.search(r"format\s*=\s*(\S+)", opts)
            if fm and fm.group(1) != "json":
                raise ValueError(
                    "Wrong format in 'get status' command (use 'json')"
                )
            reply = {"assigned_name": name, "status": "running"}
            for key in _re.findall(r"include\s*=\s*!?(\w+)", opts):
                reply[key] = self.params.get(key, "")
            import json as _json

            return _json.dumps(reply)
        m = _re.match(
            r"get\s+(event|error|file|query|streaming)\s+log(\s+where\s+(.*))?$",
            text,
            _re.IGNORECASE,
        )
        if m:
            # reference show_events (process_log.py:137): ring contents
            # oldest-first, optional keyword filter over Type and Text
            keys = (m.group(3) or "").split() or None
            rows = self.event_log.show(m.group(1).lower(), keys)
            return self.spark.createDataFrame(
                rows or [],
                "id long, count long, thread string, time string, "
                "type string, text string",
            )
        m = _re.match(
            r"reset\s+(event|error|file|query|streaming)\s+log$", text, _re.IGNORECASE
        )
        if m:
            # reference reset_events (process_log.py:201)
            n = self.event_log.reset(m.group(1).lower())
            return self.spark.createDataFrame(
                [(m.group(1).lower(), n)], "log string, entries_cleared long"
            )
        if _re.fullmatch(r"get\s+processes(\s+where\s+.*)?", text, _re.IGNORECASE):
            # reference get_processes_stat (member_cmd.py:8521): the
            # node's service table with Running / Not declared status.
            # Single-engine equivalents where they exist; networking
            # services stay "Not declared" with the README rationale
            sc = self.spark.sparkContext
            rows = [
                ("Query Pool", "Running", f"SQL engine on {sc.master} ({sc.defaultParallelism} cores)"),
                ("TCP", "Not declared", "single-engine build: no peer networking (README non-goals)"),
                (
                    "REST",
                    "Running" if self.rest_server else "Not declared",
                    f"http://{self.rest_server.host}:{self.rest_server.port}" if self.rest_server else "start via edgelake_spark.api.rest",
                ),
                ("Blockchain Sync", "Not declared", f"local policy ledger ({len(self.policy_store.policies)} policies)"),
            ]
            for sid, sched in sorted(self.schedulers.items()):
                n_tasks = len([t for t in sched.tasks if t.mode != "Removed"])
                rows.append(
                    (f"Scheduler {sid}", "Running" if sched.running else "Declared", f"{n_tasks} task(s)")
                )
            if not self.schedulers:
                rows.append(("Scheduler", "Not declared", "run scheduler"))
            mqtt = [t for t, c in self.broker_consumers.items() if c.get("transport") == "mqtt"]
            kafka = [t for t, c in self.broker_consumers.items() if c.get("transport") != "mqtt"]
            rows.append(("MQTT", "Running" if mqtt else "Not declared", ", ".join(sorted(mqtt))))
            rows.append(("Kafka Consumer", "Running" if kafka else "Not declared", ", ".join(sorted(kafka))))
            rows.append(
                ("Streamer", "Running" if self.stream_ingests else "Not declared",
                 f"{len(self.stream_ingests)} ingest pipeline(s)" if self.stream_ingests else "")
            )
            rows.append(
                ("Data Monitor", "Running" if self.monitors else "Not declared",
                 ", ".join(sorted(self.monitors)) if self.monitors else "")
            )
            rows.append(
                ("Blobs Store", "Running" if self.blob_views else "Not declared",
                 f"{len(self.blob_views)} table(s)" if self.blob_views else "")
            )
            op = getattr(self, "operator", None)
            rows.append(
                ("Operator", "Running" if op else "Not declared",
                 f"{op.files_processed} file(s), {op.rows_ingested} row(s)" if op else "")
            )
            arch = getattr(self, "archiver", None)
            rows.append(
                ("Blobs Archiver", "Running" if arch else "Not declared",
                 arch.status() if arch else "")
            )
            return self.spark.createDataFrame(
                rows, "process string, status string, details string"
            )
        # --- scheduler / script family (reference member_cmd.py:11961
        # `run scheduler`, :11996 `schedule`, :12070 task ops, :16011
        # `get scheduler`, :13318 `process <file>`) ---
        m = _re.match(r"run\s+scheduler(\s+(\d+))?$", text, _re.IGNORECASE)
        if m:
            sched = self._get_scheduler(int(m.group(2)) if m.group(2) else 1)
            already = sched.running
            if not already and self.scheduler_wake_seconds > 0:
                sched.start(self.scheduler_wake_seconds)
            return self.spark.createDataFrame(
                [(sched.sched_id, "already running" if already else "started")],
                "scheduler_id int, status string",
            )
        m = _re.match(r"exit\s+scheduler(\s+(\d+))?$", text, _re.IGNORECASE)
        if m:
            sched_id = int(m.group(2)) if m.group(2) else 1
            sched = self.schedulers.get(sched_id)
            if sched:
                sched.stop()
            return self.spark.createDataFrame(
                [(sched_id, "stopped" if sched else "not running")],
                "scheduler_id int, status string",
            )
        m = _re.match(r"get\s+scheduler(\s+(\d+))?$", text, _re.IGNORECASE)
        if m:
            from edgelake_spark.scheduler import TaskScheduler  # noqa: F401

            which = int(m.group(2)) if m.group(2) else None
            rows = []
            for sid, sched in sorted(self.schedulers.items()):
                if which is not None and sid != which:
                    continue
                rows.extend(sched.snapshot())
            return self.spark.createDataFrame(
                rows or [],
                "scheduler_id int, task_id int, mode string, name string, "
                "run_counter bigint, run_status string, start_time string, "
                "repeat_seconds bigint, task string",
            )
        m = _re.match(r"schedule\s+(.*?)\s+task\s+(.+)$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            from edgelake_spark.scheduler import parse_interval_seconds

            conds, task_cmd = m.group(1), m.group(2).strip()
            tm = _re.search(
                r"\btime\s*=\s*(\d+\s*[a-zA-Z]*)", conds, _re.IGNORECASE
            )
            if not tm:
                raise ValueError("schedule: missing time = <interval>")
            nm = _re.search(r"\bname\s*=\s*(\"[^\"]*\"|\S+)", conds, _re.IGNORECASE)
            sm = _re.search(r"\bscheduler\s*=\s*(\d+)", conds, _re.IGNORECASE)
            st = _re.search(r"\bstart\s*=\s*(\"[^\"]*\"|\S+)", conds, _re.IGNORECASE)
            sched = self._get_scheduler(int(sm.group(1)) if sm else 1)
            task = sched.add_task(
                task_cmd,
                parse_interval_seconds(tm.group(1)),
                name=nm.group(1).strip('"') if nm else None,
                start=st.group(1).strip('"') if st else None,
            )
            return self.spark.createDataFrame(
                [(sched.sched_id, task.task_id, task.name or "", task.repeat_seconds)],
                "scheduler_id int, task_id int, name string, repeat_seconds bigint",
            )
        m = _re.match(
            r"task\s+(stop|resume|remove|init|run)\s+where\s+(.*)$",
            text,
            _re.IGNORECASE | _re.DOTALL,
        )
        if m:
            op, conds = m.group(1).lower(), m.group(2)
            sm = _re.search(r"\bscheduler\s*=\s*(\d+)", conds, _re.IGNORECASE)
            nm = _re.search(r"\bname\s*=\s*(\"[^\"]*\"|\S+)", conds, _re.IGNORECASE)
            im = _re.search(r"\bid\s*=\s*(\d+)", conds, _re.IGNORECASE)
            st = _re.search(r"\bstart\s*=\s*(\"[^\"]*\"|\S+)", conds, _re.IGNORECASE)
            if bool(nm) == bool(im):
                raise ValueError("task: provide exactly one of name= or id=")
            sched = self._get_scheduler(int(sm.group(1)) if sm else 1)
            task = sched.change_mode(
                op,
                name=nm.group(1).strip('"') if nm else None,
                task_id=int(im.group(1)) if im else None,
                start=st.group(1).strip('"') if st else None,
            )
            return self.spark.createDataFrame(
                [(sched.sched_id, task.task_id, task.name or "", task.mode)],
                "scheduler_id int, task_id int, name string, mode string",
            )
        m = _re.match(r"event\s+(\S+)(?:\s+(.*))?$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            # reference _event_trigger: an event name resolves through
            # the node dictionary to a script file, which runs with the
            # event's arguments as positional values
            import shlex as _shlex

            script = self.params.get(m.group(1))
            if not script:
                raise ValueError(f"Missing script for event: {m.group(1)}")
            return self.run(
                "process " + script + (" " + " ".join(_shlex.split(m.group(2))) if m.group(2) else "")
            )
        m = _re.match(r"process\s+(\S+)(\s+(.*))?$", text, _re.IGNORECASE)
        if m and (m.group(1).startswith(("/", "./", "~")) or "." in m.group(1)):
            from edgelake_spark.script import run_script_file

            values = m.group(3).split() if m.group(3) else None
            result = run_script_file(
                self.run, m.group(1), values=values, variables=self.params
            )
            if result.error:
                raise RuntimeError(f"script failed: {result.error}")
            rows = [
                (ln, cmd, type(r).__name__) for ln, cmd, r in result.executed
            ]
            return self.spark.createDataFrame(
                rows or [], "line int, command string, result_type string"
            )
        return None

    def _get_scheduler(self, sched_id: int):
        """Lazily create the task scheduler for an id (reference
        task_scheduler.set_scheduler)."""
        from edgelake_spark.scheduler import TaskScheduler

        if sched_id not in self.schedulers:
            self.schedulers[sched_id] = TaskScheduler(
                sched_id, runner=self.run, clock=(lambda: self.now) if self.now else None
            )
        return self.schedulers[sched_id]

    # ------------------------------------------------------------ blobs

    def _blob_view(self, dbms: str, table: str) -> str:
        return f"__blobs_{dbms}_{table}".replace(".", "_")

    def _load_blobs(self, dbms: str, table: str) -> None:
        """Durable engines (explicit work_dir): lazily re-attach a blob
        table committed by a previous engine on the same work_dir. The
        view reads the committed parquet executor-side; only the hash
        set (the dup-check index) is collected."""
        if not self._durable or (dbms, table) in self.blob_views:
            return
        tx = self._tx_table("blobs", f"{dbms}.{table}")
        if not tx.latest_version():
            return
        view = self._blob_view(dbms, table)
        tx.read(self.spark).createOrReplaceTempView(view)
        self.blob_views[(dbms, table)] = view
        self.blob_rows[(dbms, table)] = {
            r.blob_hash: None
            for r in tx.read(self.spark).select("blob_hash").collect()
        }

    def _load_dml_tables(self) -> None:
        """Durable restart: re-register every committed DML table's
        managed view so queries, time travel, and `get table versions`
        see the committed state, not the raw storage table."""
        import os as _os

        root = _os.path.join(self._work_dir(), "dml")
        if not _os.path.isdir(root):
            return
        for name in sorted(_os.listdir(root)):
            tx = self._tx_table("dml", name)
            if not tx.latest_version():
                continue
            managed = f"__dml_{name}"
            tx.read(self.spark).createOrReplaceTempView(managed)
            self.views[name] = managed

    def _load_all_blobs(self) -> None:
        """Attach every blob table present under the durable work dir
        (for `get files count` on a freshly restarted node)."""
        import os as _os

        if not self._durable:
            return
        root = _os.path.join(self._work_dir(), "blobs")
        if not _os.path.isdir(root):
            return
        for entry in sorted(_os.listdir(root)):
            dbms, _, table = entry.rpartition(".")
            self._load_blobs(dbms, table)

    def _file_store(self, where: str):
        """`file store where dbms = X and table = Y [and hash = H] and
        file = PATH` — insert a file into the blobs store keyed by
        content hash (reference member_cmd.py:19225-19234 file_store,
        bucket_dbms.py:110 store_file; duplicate-hash handling
        bucket_dbms.py:205-214)."""
        import re as _re

        from edgelake_spark.functions import multimodal

        opts = {k.lower(): v for k, v in _re.findall(r"(\w+)\s*=\s*(\S+)", where)}
        if "table" not in opts or "file" not in opts:
            raise ValueError("file store needs table = ... and file = ...")
        dbms, table = opts.get("dbms", ""), opts["table"]
        self._load_blobs(dbms, table)
        row = multimodal.file_to_blob_row(opts["file"], opts.get("hash"))
        view = self._blob_view(dbms, table)
        rows = self.blob_rows.setdefault((dbms, table), {})
        if row[0] in rows:
            # reference: duplicate key is an error unless
            # ignore_duplicate (multiple rows may point at one blob)
            if opts.get("ignore", "").lower() in ("true", "1"):
                return self.spark.createDataFrame(
                    [(dbms, table, row[0], row[4], False)],
                    "dbms string, table_name string, blob_hash string, n_bytes bigint, stored boolean",
                )
            raise ValueError(f"duplicate blob hash {row[0]} in {dbms}.{table}")
        if self._durable:
            # log-backed blob store: each store is an atomic O(1 blob)
            # append commit; the view reads the committed parquet
            # (executor-side), so the driver-side dict keeps only the
            # dup-check hash key — never the content bytes
            rows[row[0]] = None
            tx = self._tx_table("blobs", f"{dbms}.{table}")
            tx.append(self.spark.createDataFrame([row], schema=multimodal.BLOB_SCHEMA))
            # every append adds a scan-union branch to the snapshot
            # read; fold the small stages once the chain is deep
            # (size-gated compact_small — the Delta OPTIMIZE analogue,
            # not a per-write table rewrite)
            latest = tx.manifest(tx.latest_version())
            if len({f.split("/", 2)[1] for f in latest["files"]}) > 64:
                tx.compact_small(self.spark)
            tx.read(self.spark).createOrReplaceTempView(view)
        else:
            rows[row[0]] = row
            df = self.spark.createDataFrame(
                list(rows.values()), schema=multimodal.BLOB_SCHEMA
            )
            df.createOrReplaceTempView(view)
        self.blob_views[(dbms, table)] = view
        return self.spark.createDataFrame(
            [(dbms, table, row[0], row[4], True)],
            "dbms string, table_name string, blob_hash string, n_bytes bigint, stored boolean",
        )

    def _file_retrieve(self, where: str):
        """`file retrieve where dbms = X and table = Y and hash = H and
        dest = PATH` (also `name = <source name>`, `limit = n`) — write
        matching blob content to dest (reference member_cmd.py:19377,
        bucket_dbms.py:220 retrieve_files: hash/name are unique keys →
        one file; otherwise dest is a directory)."""
        import os
        import re as _re

        opts = {k.lower(): v for k, v in _re.findall(r"(\w+)\s*=\s*(\S+)", where)}
        dbms, table = opts.get("dbms", ""), opts.get("table", "")
        self._load_blobs(dbms, table)
        view = self.blob_views.get((dbms, table))
        if view is None:
            raise ValueError(f"no blobs stored for {dbms}.{table}")
        if opts.get("version"):
            if not self._durable:
                # returning the latest blobs here would silently answer a
                # time-travel request with wrong data
                raise ValueError(
                    "file retrieve with 'version =' requires a durable "
                    "node (log-backed blob store); this engine has no "
                    "work_dir, so no snapshot history exists"
                )
            # time-travel retrieve from the log-backed blob store: the
            # same commit-log versioning the DML layer exposes
            df = self._tx_table("blobs", f"{dbms}.{table}").read(
                self.spark, version=int(opts["version"])
            )
        else:
            df = self.spark.table(view)
        unique_key = False
        if opts.get("hash"):
            df = df.filter(F.col("blob_hash") == opts["hash"])
            unique_key = True
        if opts.get("name"):
            df = df.filter(F.col("source_name") == opts["name"])
            unique_key = True
        # no unique key → whole-table export: cap at RETRIEVE_CAP by
        # default so a many-blob table cannot OOM the driver; an explicit
        # `limit = n` overrides (still bounded by the user's number)
        limit = int(opts.get("limit", 1 if unique_key else self.RETRIEVE_CAP))
        if limit:
            df = df.limit(limit)
        dest = opts.get("dest", "")
        out = []
        # toLocalIterator: one partition of blob rows in driver memory at
        # a time, not the whole (capped) result set at once. The one-row
        # look-ahead decides file-vs-directory dest: exactly one result
        # and a non-directory dest → write that file; otherwise dest is
        # a directory with one file per blob (the pre-cap behavior).
        it = df.toLocalIterator()
        first = next(it, None)
        second = next(it, None) if first is not None else None

        def rows():
            if first is not None:
                yield first
            if second is not None:
                yield second
            yield from it

        single_dest = bool(
            first is not None and second is None and dest and not os.path.isdir(dest)
        )
        for r in rows():
            if single_dest:
                path = dest
            else:  # multiple files (or dest is a dir): one file per blob
                os.makedirs(dest or ".", exist_ok=True)
                path = os.path.join(dest or ".", r.source_name)
            with open(path, "wb") as f:
                f.write(bytes(r.content))
            out.append((r.blob_hash, r.source_name, r.n_bytes, path))
        return self.spark.createDataFrame(
            out or [], "blob_hash string, source_name string, n_bytes bigint, dest string"
        )

    @staticmethod
    def _meta_filters(where: str | None) -> dict:
        """company/dbms/table equality filters of the metadata commands."""
        import re as _re

        out = {}
        for k, v in _re.findall(r"\b(company|dbms|table)\s*=\s*(\S+)", where or ""):
            out[k] = v
        return out

    _TSD_SCHEMA = (
        "tsd_table string, row_id int, dbms string, table_name string, "
        "source string, hash string, instructions string, file_time string, "
        "file_name string, status1 string, status2 string"
    )

    def _time_file(self, verb: str, rest: str):
        """`time file rename/new/add/update/get/delete/drop` — TSD
        provenance (see edgelake_spark/tsd.py; reference
        member_cmd.py:18540). The entries are what the tsd_name/tsd_id
        system columns on ingested rows point back to."""
        import os as _os
        import re as _re
        import shlex as _shlex

        from edgelake_spark import tsd as _tsd

        self.tsd()

        def rows_df(entries):
            rows = [
                (
                    e.table, e.row_id, e.dbms, e.table_name, e.source,
                    e.hash, e.instructions, e.file_time, e.file_name,
                    e.status1, e.status2,
                )
                for e in entries
            ]
            return self.spark.createDataFrame(rows or [], self._TSD_SCHEMA)

        if verb == "rename":
            m = _re.match(r"(\S+)\s+to\s+(.*)$", rest, _re.DOTALL)
            if not m:
                raise ValueError("time file rename <path> to dbms = .. and table = ..")
            opts = {
                k.lower(): v.strip("'\"")
                for k, v in _re.findall(r"(\w+)\s*=\s*(\"[^\"]*\"|'[^']*'|\S+)", m.group(2))
            }
            if "dbms" not in opts or "table" not in opts:
                raise ValueError("time file rename: dbms = and table = are required")
            new_path = _tsd.rename_to_convention(
                m.group(1),
                opts["dbms"],
                opts["table"],
                source=opts.get("source", "0"),
                hash_value=opts.get("hash"),
                instructions=opts.get("instructions", "0"),
                now=self.now,
            )
            return self.spark.createDataFrame([(new_path,)], "file string")
        if verb in ("new", "add"):
            parts = _shlex.split(rest)
            if not parts:
                raise ValueError(f"time file {verb} [file name] [status1] [status2]")
            fname = parts[0]
            if verb == "add" and not _os.path.exists(fname):
                raise ValueError(f"time file add: file does not exist: {fname}")
            entry = self.tsd_store.register(
                fname,
                status1=parts[1] if len(parts) > 1 else "",
                status2=parts[2] if len(parts) > 2 else "",
            )
            return rows_df([entry])
        if verb == "update":
            parts = _shlex.split(rest)
            if not parts:
                raise ValueError("time file update [hash] [status1] [status2]")
            n = self.tsd_store.update(
                parts[0],
                parts[1] if len(parts) > 1 else None,
                parts[2] if len(parts) > 2 else None,
            )
            return self.spark.createDataFrame([(n,)], "updated int")
        if verb == "delete":
            m = _re.match(r"(\d+)\s+from\s+(\S+)$", rest)
            if not m:
                raise ValueError("time file delete [row id] from [tsd table]")
            n = self.tsd_store.delete(int(m.group(1)), m.group(2))
            return self.spark.createDataFrame([(n,)], "deleted int")
        if verb == "drop":
            what = rest.strip() or "all"
            n = self.tsd_store.drop(what)
            return self.spark.createDataFrame([(n,)], "dropped int")
        if verb == "get":
            entries = self.tsd_store.entries
            m = _re.match(r"where\s+(.*)$", rest, _re.DOTALL)
            if m:
                flt = {
                    k.lower(): v.strip("'\"")
                    for k, v in _re.findall(r"(\w+)\s*=\s*(\"[^\"]*\"|'[^']*'|\S+)", m.group(1))
                }
                entries = [
                    e
                    for e in entries
                    if all(
                        str(getattr(e, {"table": "table_name"}.get(k, k), "")) == v
                        for k, v in flt.items()
                    )
                ]
            return rows_df(entries)
        raise ValueError(f"time file: unknown method {verb!r}")

    def _generate_insert(self, where: str):
        """`generate insert from json where dbms_name = .. and
        table_name = .. and json_file = .. [and sql_dir = ..]`
        (reference member_cmd.py _map_json_to_insert /
        json_to_sql/map_json_to_insert.py): each JSON-lines row becomes
        an INSERT statement, typed by the same inference lattice as
        `suggest create`; `sql_dir` also writes the .sql file the
        reference drops for its SQL loader."""
        import json as _json
        import os as _os
        import re as _re

        opts = {
            k.lower(): v.strip("'\"")
            for k, v in _re.findall(r"(\w+)\s*=\s*(\"[^\"]*\"|'[^']*'|\S+)", where)
        }
        for req in ("dbms_name", "table_name", "json_file"):
            if req not in opts:
                raise ValueError(f"generate insert from json: missing {req} =")
        with open(opts["json_file"]) as fh:
            rows = [_json.loads(ln) for ln in fh if ln.strip()]
        if not rows:
            raise ValueError("generate insert from json: empty json file")
        from edgelake_spark.ingest.infer import infer_schema

        schema = infer_schema(rows)
        target = f"{opts['dbms_name']}.{opts['table_name']}"
        stmts = []
        for row in rows:
            cols, vals = [], []
            for col, el_type in schema.items():
                if col not in row or row[col] is None:
                    continue
                cols.append(col)
                v = row[col]
                if el_type in ("INT", "BIGINT", "FLOAT", "DECIMAL", "BOOLEAN"):
                    vals.append(str(v).lower() if el_type == "BOOLEAN" else str(v))
                else:
                    vals.append("'" + str(v).replace("'", "''") + "'")
            stmts.append(
                f"INSERT INTO {target} ({', '.join(cols)}) VALUES ({', '.join(vals)});"
            )
        if opts.get("sql_dir"):
            base = _os.path.splitext(_os.path.basename(opts["json_file"]))[0]
            path = _os.path.join(opts["sql_dir"], base + ".sql")
            _os.makedirs(opts["sql_dir"], exist_ok=True)
            with open(path, "w") as fh:
                fh.write("\n".join(stmts) + "\n")
        return self.spark.createDataFrame(
            [(s,) for s in stmts], "insert_statement string"
        )

    #: per-type defaults for `create policy … with defaults` (reference
    #: members/policies.py:212 default_values_: ip/internal_ip resolve
    #: through the node dictionary, ports are the reference's fixed
    #: per-role defaults)
    _POLICY_DEFAULTS = {
        "master": (("port", 32048), ("rest_port", 32049)),
        "operator": (("port", 32148), ("rest_port", 32149)),
        "query": (("port", 32348), ("rest_port", 32349)),
        "publisher": (("port", 32248), ("rest_port", 32249)),
    }

    def _create_policy(self, ptype: str, defaults: bool, where: str | None):
        """`create policy <type> [with defaults] where k = v and …`
        (reference member_cmd.py:12231 create_policy): builds
        ``{type: {k: v}}``; `with defaults` fills the per-role
        ip/port defaults AND inserts into the ledger (id/date stamped
        by PolicyStore.add); without defaults the policy is only
        rendered, so the assignment form `x = create policy …` stores
        the JSON in the node dictionary."""
        import json as _json
        import re as _re

        inner: dict = {}
        if where:
            for k, v in _re.findall(
                r"(\w+)\s*=\s*(\"[^\"]*\"|'[^']*'|\S+)", where
            ):
                inner[k] = v.strip("'\"")
        if defaults:
            for key, src in (("ip", "external_ip"), ("internal_ip", "ip")):
                if key not in inner and self.params.get(src):
                    inner[key] = str(self.params[src]).lower()
            for key, value in self._POLICY_DEFAULTS.get(ptype, ()):
                inner.setdefault(key, value)
        policy = {ptype: inner}
        if defaults:
            self.policy_store.add(policy)
            policy = self.policy_store.policies[-1]  # id/date-stamped form
        return self.spark.createDataFrame(
            [(_json.dumps(policy, separators=(",", ":")),)], "policy string"
        )

    def _blockchain_cmd(self, verb: str, rest: str):
        """`blockchain insert/get/load/save` over the node's ledger
        (reference member_cmd.py:1614 blockchain_get; durable file
        ledger semantics via PolicyStore.save/load)."""
        import json as _json
        import re as _re

        if verb == "insert":
            m = _re.search(r"policy\s*=\s*(\{.*\})\s*$", rest, _re.DOTALL)
            payload = m.group(1) if m else rest
            self.policy_store.add(_json.loads(payload))
            return self.spark.createDataFrame([(len(self.policy_store.policies),)], "policies int")
        if verb == "load":
            from edgelake_spark.policies import PolicyStore

            self.policy_store = PolicyStore.load(rest)
            return self.spark.createDataFrame([(len(self.policy_store.policies),)], "policies int")
        if verb == "save":
            n = self.policy_store.save(rest)
            return self.spark.createDataFrame([(n,)], "policies int")
        # get: blockchain get <type> [where k = v and ...] [bring ...]
        m = _re.match(r"(\S+)(?:\s+where\s+(.*?))?(?:\s+(bring\b.*))?$", rest, _re.DOTALL)
        ptype, where_s, bring = m.group(1), m.group(2), m.group(3)
        where = None
        if where_s:
            where = {
                k: v.strip("'\"")
                for k, v in _re.findall(r"(\w+)\s*=\s*(\"[^\"]*\"|'[^']*'|\S+)", where_s)
            }
        result = self.policy_store.blockchain_get(ptype, where, bring)
        if bring:
            if isinstance(result, list) and all(isinstance(v, str) for v in result):
                # list-valued bring variants (list / ip_port / sorted
                # projections) render one value per row, matching the
                # reference's line-per-value output
                return self.spark.createDataFrame(
                    [(v,) for v in result] or [], "result string"
                )
            return self.spark.createDataFrame([(str(result),)], "result string")
        return self.spark.createDataFrame(
            [( _json.dumps(p, separators=(",", ":")),) for p in result] or [],
            "policy string",
        )

    def attach_partitioned(self, name: str, path: str) -> None:
        """Register a time-partitioned dataset (written via
        ingest.partitions.write_partitioned, or log-backed via
        write_partitioned_tx) under a table name."""
        from edgelake_spark.txlog import TxTable

        self.partitioned_paths[name] = path
        df = (
            TxTable(path).read(self.spark)
            if TxTable.exists(path)
            else self.spark.read.parquet(path)
        )
        df.createOrReplaceTempView(catalog.view_name(name))

    # ----------------------------------------------------------- internal

    _LEADING_RE = None  # compiled lazily

    def _substitute_leading_queries(self, statement: str) -> str:
        """``{<select ...> (<col>)}`` in WHERE: run the inner query
        first, substitute its scalar result as a literal — the
        reference's exact design (utils_sql.py:900-933
        get_leading_queries, job/leading_query.py), which also keeps
        plans cacheable because the outer query sees a constant."""
        import re as _re

        if EdgeLakeEngine._LEADING_RE is None:
            EdgeLakeEngine._LEADING_RE = _re.compile(
                r"\{\s*(select\b[^{}]*?)\((\w+)\)\s*\}", _re.IGNORECASE | _re.DOTALL
            )

        def _run(m: _re.Match) -> str:
            inner, _column = m.group(1).strip(), m.group(2)
            row = self.query(inner).collect()
            if not row or row[0][0] is None:
                return "NULL"
            value = row[0][0]
            if isinstance(value, (int, float)):
                return str(value)
            return f"'{value}'"

        return EdgeLakeEngine._LEADING_RE.sub(_run, statement)

    def _execute(self, cmd: SqlCommand) -> DataFrame:
        if "{" in cmd.statement:
            cmd.statement = self._substitute_leading_queries(cmd.statement)
        dml = self._try_dml(cmd.statement)
        if dml is not None:
            return dml
        leading_cols: list[str] = []
        resolver = self._resolve

        if cmd.include or cmd.extend:
            union_view, leading_cols = self._build_union_view(cmd)
            resolver = lambda name: union_view  # noqa: E731
        elif cmd.options.get("version") is not None or cmd.options.get("as_of"):
            resolver = self._time_travel_resolver(
                cmd.options.get("version"), cmd.options.get("as_of")
            )

        rewritten = rewrite_select(
            cmd.statement,
            table_resolver=resolver,
            now=self.now,
            leading_cols=leading_cols,
        )
        # pass-through (no agg/group/order/distinct): the formatter may
        # stream rows via toLocalIterator instead of collecting —
        # reference fast path job_instance.py:562-575. Users can force
        # it off per query with pass_through = false.
        self._last_pass_through = rewritten.pass_through and cmd.options.get(
            "pass_through", True
        )
        df = self.spark.sql(rewritten.sql)
        # only the newest entry keeps a live DataFrame reference: plans
        # over localCheckpoint RDDs would otherwise pin block-manager
        # blocks for up to 200 queries (the checkpoint-block pile-up
        # SCALE.md documents). Older entries carry the plan string.
        for e in self.query_log:
            if e.get("df") is not None:
                e["plan"] = self._entry_plan(e)
                e["df"] = None
        self.query_log.append(
            {
                "job_id": next(_job_counter),
                "statement": cmd.statement,
                "rewritten_sql": rewritten.sql,
                "pass_through": bool(self._last_pass_through),
                "dbms": cmd.dbms,
                "df": df,
            }
        )
        del self.query_log[:-200]  # bounded
        # mirror into the node query-log ring (`get query log` — the
        # reference routes query messages through process_log with the
        # "Query" info type)
        self.event_log.add("Query", cmd.statement)

        per_column = cmd.options.get("per_column")
        if per_column and cmd.options.get("limit"):
            # per-entity limit: with extended tables the limit applies
            # per source (reference unify_results.py:1325-1329)
            order_cols = [c for c in df.columns if c != per_column]
            w = Window.partitionBy(per_column).orderBy(*order_cols)
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= int(cmd.options["limit"]))
                .drop("__rn")
            )
            # the window shuffle broke the statement's ORDER BY —
            # re-apply it so the result keeps its total order
            if rewritten.order_items:
                sort_cols = []
                for item in rewritten.order_items:
                    if item.upper().endswith(" DESC"):
                        sort_cols.append(F.expr(item[:-5].strip()).desc())
                    else:
                        sort_cols.append(F.expr(item))
                df = df.orderBy(*sort_cols)
        elif cmd.options.get("limit"):
            df = df.limit(int(cmd.options["limit"]))

        # timezone BEFORE castings — the reference converts time columns
        # to the display zone first, then casts/formats
        # (utils_columns.py:1660-1705 change_columns_values)
        df = self._apply_timezone(df, cmd.timezone)
        df = apply_castings(df, rewritten.castings)
        return df

    # -------------------------------------------------------------- DML

    def tsd(self):
        """The node's TSD provenance store (lazy; tsd.py — reference
        tsd_info tables). Shared by `time file` commands and the blobs
        archiver."""
        from edgelake_spark import tsd as _tsd

        if not hasattr(self, "tsd_store"):
            self.tsd_store = _tsd.TsdStore()
        return self.tsd_store

    def _time_travel_resolver(self, version, as_of: str | None):
        """`sql <db> version = N "..."` / `as_of = <iso ts>`: resolve
        log-backed (DML-touched) tables to the requested committed
        snapshot instead of the latest. Tables without a commit log
        resolve normally — time travel only exists where commits do."""

        def resolve(name: str) -> str:
            key = catalog.view_name(name)
            tx = self.tx_tables.get(f"dml/{key}")
            if tx is None or not tx.latest_version():
                return self._resolve(name)
            snap = tx.read(
                self.spark,
                version=int(version) if version is not None else None,
                timestamp=as_of,
            )
            view = f"__dml_{key}_asof"
            snap.createOrReplaceTempView(view)
            return view

        return resolve

    def _work_dir(self) -> str:
        if self._work_dir_path is None:
            import atexit
            import shutil
            import tempfile

            self._work_dir_path = tempfile.mkdtemp(prefix="edgelake_tx_")
            # non-durable engines own their throwaway dir: reclaim it at
            # interpreter exit so repeated gate/bench runs don't leak
            # table-sized snapshots into /tmp across processes. NOT
            # GC-tied (weakref.finalize): DataFrames returned by a
            # short-lived engine lazily scan these files after the
            # engine is collected — deleting on GC broke every such
            # deferred read (measured: dml gate FileNotFoundException)
            atexit.register(shutil.rmtree, self._work_dir_path, ignore_errors=True)
        return self._work_dir_path

    def _tx_table(self, kind: str, key: str):
        """Lazily open the TxTable for (kind, key) under the work dir."""
        import os as _os

        from edgelake_spark.txlog import TxTable

        k = f"{kind}/{key}"
        t = self.tx_tables.get(k)
        if t is None:
            t = TxTable(_os.path.join(self._work_dir(), kind, key))
            self.tx_tables[k] = t
        return t

    def _managed_snapshot(self, table: str) -> str:
        """Copy-on-first-write onto the transactional table layer: the
        first DML snapshots the underlying table as version 1 of a
        log-backed TxTable (txlog.py); every DML statement is then an
        atomic parquet commit — crash-consistent, with time travel via
        the `version =` / `as_of =` query options and history via
        `get table versions`. (Reference: DML runs on the operator's
        local DB — member_cmd.py:159-165 sql_commands; durability
        re-expressed as snapshot isolation over immutable parquet.)"""
        resolved = self._resolve(table)
        managed = f"__dml_{catalog.view_name(table)}"
        tx = self._tx_table("dml", catalog.view_name(table))
        if (
            tx.latest_version() == 0
            and resolved != managed
            and self.spark.catalog.tableExists(resolved)
        ):
            tx.overwrite(self.spark.table(resolved), op="snapshot")
        if resolved != managed:
            self.views[table] = managed
            self.views[catalog.view_name(table)] = managed
        if tx.latest_version():
            tx.read(self.spark).createOrReplaceTempView(managed)
        return managed

    def _tx_commit(self, table: str, df: DataFrame, op: str, append: bool = False):
        """Commit one DML statement's result and refresh the managed
        view. ``append`` is the O(new rows) fast path (INSERT with a
        schema-conforming row); otherwise copy-on-write of the state."""
        tx = self._tx_table("dml", catalog.view_name(table))
        if append:
            tx.append(df, meta={"op": op})
            # long INSERT chains deepen the snapshot's scan union; fold
            # the SMALL stages once the chain is deep (compact_small is
            # O(small-file data), never a table rewrite — a full-compact
            # trigger would break the O(1 row) INSERT contract)
            latest = tx.manifest(tx.latest_version())
            if len({f.split("/", 2)[1] for f in latest["files"]}) > 64:
                tx.compact_small(self.spark)
        else:
            tx.overwrite(df, op=op)
        managed = f"__dml_{catalog.view_name(table)}"
        tx.read(self.spark).createOrReplaceTempView(managed)
        return self.spark.table(managed)

    def _try_dml(self, statement: str):
        import re as _re

        text = statement.strip().rstrip(";")
        m = _re.match(
            r"insert\s+into\s+(\S+)\s*\(([^)]*)\)\s*values\s*\((.*)\)\s*$",
            text,
            _re.IGNORECASE | _re.DOTALL,
        )
        if m:
            from edgelake_spark.dialect.parser import split_top_level

            table, cols, values = m.group(1), m.group(2), m.group(3)
            view = self._managed_snapshot(table)
            col_names = [c.strip() for c in cols.split(",")]
            exprs = ", ".join(
                f"{v.strip()} AS {c}" for c, v in zip(col_names, split_top_level(values))
            )
            row = self.spark.sql(f"SELECT {exprs}")
            if self.spark.catalog.tableExists(view):
                base = self.spark.table(view)
                # conform the row to the table schema (missing cols →
                # NULL, engine-coerced types); when that reproduces the
                # schema exactly, commit O(1 row) as an append — at a
                # 100 TB table an INSERT must never rewrite the table
                conformed = base.limit(0).unionByName(row, allowMissingColumns=True)
                if conformed.schema == base.schema:
                    return self._tx_commit(table, conformed, "insert", append=True)
                # schema evolution (new columns): copy-on-write
                return self._tx_commit(
                    table, base.unionByName(row, allowMissingColumns=True), "insert"
                )
            return self._tx_commit(table, row, "insert", append=True)
        m = _re.match(
            r"merge\s+into\s+(\S+)\s+using\s+\((.*)\)\s+on\s+([\w\s,]+)$",
            text,
            _re.IGNORECASE | _re.DOTALL,
        )
        if m:
            # superset of the reference DML (BASELINE north star —
            # Delta-style table management): full-row upsert, the CDC
            # MERGE special case. Matched keys are replaced by the
            # source row, unmatched source rows insert; file-granular
            # copy-on-write (txlog.merge_upsert).
            table, source_sql, keys = m.group(1), m.group(2), m.group(3)
            view = self._managed_snapshot(table)
            key_cols = [k.strip() for k in keys.split(",") if k.strip()]
            # the source subquery resolves through the engine (dialect
            # rewriting + managed-view indirection), so it sees DML'd
            # state, not the raw storage table
            source = self.query(source_sql)
            tx = self._tx_table("dml", catalog.view_name(table))
            tx.merge_upsert(self.spark, source, key_cols)
            tx.read(self.spark).createOrReplaceTempView(view)
            return self.spark.table(view)
        m = _re.match(r"delete\s+from\s+(\S+)(?:\s+where\s+(.*))?$", text, _re.IGNORECASE | _re.DOTALL)
        if m:
            table, cond = m.group(1), m.group(2)
            view = self._managed_snapshot(table)
            # file-granular copy-on-write (txlog.delete_where): only the
            # files holding matching rows are rewritten — a DELETE of
            # one partition's rows from a 100 TB table moves that
            # partition, not the table
            tx = self._tx_table("dml", catalog.view_name(table))
            tx.delete_where(self.spark, cond)
            tx.read(self.spark).createOrReplaceTempView(view)
            return self.spark.table(view)
        m = _re.match(
            r"update\s+(\S+)\s+set\s+(.*?)(?:\s+where\s+(.*))?$", text, _re.IGNORECASE | _re.DOTALL
        )
        if m:
            from edgelake_spark.dialect.parser import split_top_level

            table, sets, cond = m.group(1), m.group(2), m.group(3)
            view = self._managed_snapshot(table)
            # SQL UPDATE evaluates every RHS against the pre-update row:
            # txlog.update_where builds all assignments first and applies
            # them in ONE select (so `set a = b, b = a` swaps instead of
            # cascading), rewriting only the files with matching rows
            assignments = {}
            for assignment in split_top_level(sets):
                col, _, expr = assignment.partition("=")
                assignments[col.strip()] = expr.strip()
            tx = self._tx_table("dml", catalog.view_name(table))
            tx.update_where(self.spark, assignments, cond)
            tx.read(self.spark).createOrReplaceTempView(view)
            return self.spark.table(view)
        return None

    def _build_union_view(self, cmd: SqlCommand) -> tuple[str, list[str]]:
        """include=(dbms.table,...) → UNION ALL with NULL padding;
        extend=(@ip, @table_name as t, ...) → identity columns prepended
        per source (reference member_cmd.py:5330-5470 partition_query,
        unify_results.py:924-948 process_extended_columns).

        unionByName(allowMissingColumns=True) reproduces the reference's
        NULL padding of missing columns (get_adjusted_projection,
        member_cmd.py:5413).
        """
        from edgelake_spark.dialect.parser import parse_select

        primary = self._resolve(parse_select(cmd.statement).table)
        tables = [primary] + [self._resolve(t) for t in cmd.include]

        extend_specs = []  # (source_kind, alias)
        for spec in cmd.extend:
            spec = spec.strip()
            alias = None
            if " as " in spec:
                spec, alias = (s.strip() for s in spec.split(" as ", 1))
            if spec.startswith("@"):
                kind = spec[1:]
            elif spec.startswith("+"):
                kind = spec[1:]
            else:
                kind = spec
            extend_specs.append((kind, alias or kind.replace(".", "_")))

        parts = []
        for t in tables:
            df = self.spark.table(t)
            id_values = dict(self.node_identity)
            id_values["table_name"] = t
            id_values.setdefault("dbms_name", "")
            for kind, alias in reversed(extend_specs):
                value = id_values.get(kind, "")
                df = df.select(F.lit(value).alias(alias), "*")
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        view = f"__el_union_{next(_view_counter)}"
        out.createOrReplaceTempView(view)
        return view, [alias for _, alias in extend_specs]

    def _apply_timezone(self, df: DataFrame, tz: str) -> DataFrame:
        """Presentation-layer timezone conversion of result time columns
        only (reference utils_columns.py:1592-1658 utc_to_timezone)."""
        tz = (tz or "utc").lower()
        if tz in ("", "utc"):
            return df
        zone = TZ_NAMES.get(tz, tz)
        for f_ in df.schema.fields:
            if isinstance(f_.dataType, T.TimestampType):
                df = df.withColumn(f_.name, F.from_utc_timestamp(F.col(f_.name), zone))
        return df


#: `help [prefix]` inventory (reference _print_help): every command the
#: engine's _try_admin/_try_dml/query surface accepts, with the usage
#: shape. Kept flat so `help get` prefix-filters like the reference.
_COMMAND_HELP = [
    ("sql", 'sql <dbms> [format = ..][dest = ..][timezone = ..][extend = (..)][include = (..)][table = ..] "SELECT ..."'),
    ("blockchain get", "blockchain get <type> [where k = v and ..] [bring[.variant] [paths]]"),
    ("blockchain insert", "blockchain insert where policy = {..}"),
    ("blockchain load", "blockchain load <path>"),
    ("blockchain save", "blockchain save <path>"),
    ("create policy", "create policy <type> [with defaults] where k = v and .."),
    ("create view", "create view <dbms.view> (col type [as source], ..)"),
    ("create table", "create table <dbms.table> from suggest create / DDL"),
    ("config from policy", "config from policy where id = <policy id>"),
    ("get rows count", "get rows count [where dbms = .. and table = .. and group = table][estimate]"),
    ("get data nodes", "get data nodes [where company/dbms/table = ..]"),
    ("get virtual tables", "get virtual tables [info]"),
    ("get partitions", "get partitions [where dbms = .. and table = ..]"),
    ("get dictionary", "get dictionary"),
    ("get scheduler", "get scheduler [id]"),
    ("get processes", "get processes"),
    ("get status", "get status [where format = json and include = key]"),
    ("get streaming", "get streaming"),
    ("get files count", "get files count [where dbms = .. and table = ..]"),
    ("get event log", "get event log [where keyword]  (also error/file/query/streaming log; reset .. log)"),
    ("generate insert from json", "generate insert from json where dbms_name = .. and table_name = .. and json_file = .. [and sql_dir = ..]"),
    ("info table", "info table <dbms.table> columns"),
    ("suggest create", "suggest create <dbms.table> from <json file>"),
    ("file store", "file store where dbms = .. and table = .. and file = .."),
    ("file retrieve", "file retrieve where dbms = .. and table = .. [hash = ..][dest = ..]"),
    ("partition", "partition <dbms> <table> using <column> by <n> <unit>"),
    ("drop partition", "drop partition [where dbms = .. and table = ..]"),
    ("run scheduler", "run scheduler [where wake = Ns]"),
    ("run kafka consumer", "run kafka consumer where ip = .. and topic = (name = .. and dbms = .. and table = .. and column..)"),
    ("run rest server", "run rest server [where internal_ip = .. and internal_port = .. and user = .. and password = .. and token = ..]"),
    ("run message broker", "run message broker [where internal_ip = .. and internal_port = .. and protocol = mqtt|kafka]"),
    ("run mqtt client", "run mqtt client where broker = .. and topic = (..)"),
    ("schedule", "schedule time = <interval> [and name = ..] task <command>"),
    ("task", "task stop|resume|remove|init|run where name = .. | id = .."),
    ("process", "process <script file> [values..]"),
    ("event", "event <name> [args..]  (name resolves to a script via the dictionary)"),
    ("query status", "query status [all]"),
    ("query explain", "query explain [job|last]"),
    ("query destination", "query destination [all|ID]  (storage each job read + scan pruning)"),
    ("set", "set <name> = <value>  (empty value removes the key)"),
    ("echo", "echo <message>"),
    ("print", "print <text with !name substitution>"),
    ("incr", "incr <int operand> [value]  (assignment form: x = incr !x 2)"),
    ("json", "json <object> [test]"),
    ("python", "python <pure expression>  (sandboxed: no builtins/imports)"),
    ("wait", "wait <seconds> [for <condition>]  (scripts)"),
    ("time file", "time file rename|new|add|update|get|delete|drop .. (TSD provenance)"),
    ("run blobs archiver", "run blobs archiver where bwatch_dir = .. and blobs_dir = .. and archive_dir = .. [dbms|folder|compress|reuse_blobs = true/false]"),
    ("run operator", "run operator where watch_dir = .. [create_table|update_tsd_info|archive_json|compress_json = true/false]"),
    ("get operator", "get operator"),
    ("delete archive", "delete archive where days = N"),
    ("flush buffers", "flush buffers"),
    ("connect dbms", "connect dbms <name> where type = .. [and path = <parquet dir>]"),
    ("disconnect dbms", "disconnect dbms <name>"),
    ("drop table", "drop table <table> [where dbms = ..]"),
    ("drop policy", "drop policy where id = .."),
    ("drop dbms", "drop dbms <name> (forget managed state incl. DML commit logs; raw storage untouched)"),
    ("replace policy", "replace policy where id = <id> with <json>"),
    ("prepare policy", "prepare policy <json> (stamp id/date without insert)"),
    ("run msg client", "run msg client where broker = .. and port = .. and topic = (..) (alias of run mqtt client)"),
    ("create work directories", "create work directories [where root = <dir>]"),
    ("info view", "info view <dbms> <view> columns|exists"),
    ("backup table", "backup table where dbms = .. and table = .. and dest = <dir>"),
    ("get archived files", "get archived files [YYYY-MM-DD]"),
    ("get table versions", "get table versions [where table = ..] (commit-log history)"),
    ("stream", "stream <json row or array> where dbms = .. and table = .."),
    ("monitor", "monitor <topic> where ip = .. and name = .. and info = {json}"),
    ("get monitored", "get monitored [topic]"),
    ("from", "from <json> bring [paths] \"literals\" [separator = ..]"),
    ("test table", "test table <dbms.table> where .."),
    ("test node", "test node"),
    ("data monitor", "data monitor where dbms = .. and intervals = .. and time = .."),
    ("get data monitor", "get data monitor [where dbms = ..]"),
    ("exit scheduler", "exit scheduler [id]"),
    ("help", "help [command prefix]"),
]
