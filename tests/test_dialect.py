"""Unit tests for the dialect layer: time functions, parser, rewriter,
casting, options."""

from datetime import datetime

import pytest

from edgelake_spark.dialect.options import OptionError, parse_sql_command
from edgelake_spark.dialect.parser import parse_select, split_top_level
from edgelake_spark.dialect.rewriter import (
    RewriteError,
    plan_auto_increments,
    rewrite_select,
)
from edgelake_spark.dialect.timefns import (
    add_units,
    function_to_time,
    resolve_time_literals,
)

NOW = datetime(2024, 2, 1, 12, 0, 0)


class TestTimeFns:
    def test_now_literal(self):
        out = resolve_time_literals("ts >= now()", NOW)
        assert out == "ts >= '2024-02-01 12:00:00.000000'"

    def test_now_minus_day(self):
        out = resolve_time_literals("ts >= now() - 1 day", NOW)
        assert out == "ts >= '2024-01-31 12:00:00.000000'"

    def test_shorthand_units(self):
        out = resolve_time_literals("ts >= now() - 3d", NOW)
        assert out == "ts >= '2024-01-29 12:00:00.000000'"

    def test_chained_arithmetic(self):
        out = resolve_time_literals("ts >= now() - 1 day - 2 hours", NOW)
        assert out == "ts >= '2024-01-31 10:00:00.000000'"

    def test_date_function_modifiers(self):
        # reference example: date('now','start of month','+1 month','-1 day')
        out = function_to_time("'now','start of month','+1 month','-1 day'", NOW)
        assert out == "2024-02-29 00:00:00.000000"

    def test_month_clamping(self):
        assert add_units(datetime(2024, 1, 31), 1, "month") == datetime(2024, 2, 29)
        assert add_units(datetime(2023, 1, 31), 1, "month") == datetime(2023, 2, 28)

    def test_timestamp_literal_arg(self):
        out = function_to_time("'2024-01-10', '+5 days', 'start of day'", NOW)
        assert out == "2024-01-15 00:00:00.000000"


class TestParser:
    def test_split_top_level(self):
        assert split_top_level("a, f(x, y), 'p,q'") == ["a", "f(x, y)", "'p,q'"]

    def test_basic(self):
        ir = parse_select(
            "select a, max(b) as mb from t where a > 1 group by a order by a desc limit 5"
        )
        assert ir.projection == ["a", "max(b) as mb"]
        assert ir.table == "t"
        assert ir.where == "a > 1"
        assert ir.group_by == ["a"]
        assert ir.order_by == ["a"]
        assert not ir.ascending
        assert ir.limit == 5

    def test_distinct(self):
        ir = parse_select("select distinct a from t")
        assert ir.distinct and ir.projection == ["a"]

    def test_global_direction_flag(self):
        ir = parse_select("select a, b from t order by a, b desc")
        assert ir.order_by == ["a", "b"] and not ir.ascending


class TestRewriter:
    def test_increments_explicit(self):
        res = rewrite_select(
            "select increments(hour, 2, ts), max(v) as mx from t", now=NOW
        )
        assert "date_trunc('day', ts) AS increments_trunc" in res.sql
        assert "extract(HOUR FROM ts) AS INT) div 2" in res.sql
        assert "GROUP BY increments_trunc, increments_extract" in res.sql
        assert res.increments == ("hour", 2, "ts")

    def test_increments_year_no_trunc(self):
        res = rewrite_select("select increments(year, 1, ts), count(*) as n from t", now=NOW)
        assert "increments_trunc" not in res.sql
        assert "extract(YEAR FROM ts)" in res.sql

    def test_auto_increments_planner(self):
        # 30 days / 200 points = 12960 s → (hour, 4); default 1000 → (minute, 43)
        assert plan_auto_increments(30 * 86400, 200) == ("hour", 4)
        assert plan_auto_increments(30 * 86400, 1000) == ("minute", 43)
        assert plan_auto_increments(3600, 1000) == ("second", 4)
        assert plan_auto_increments(400 * 86400, 10) == ("month", 1)

    def test_auto_increments_requires_range(self):
        with pytest.raises(RewriteError):
            rewrite_select("select increments(ts), count(*) as n from t", now=NOW)

    def test_period_in_select_list_rejected(self):
        # period() is a WHERE-clause range function (reference
        # unify_results.py:695); in the projection it must fail as a
        # dialect error, not leak to Spark as UNRESOLVED_ROUTINE
        with pytest.raises(RewriteError, match="WHERE clause"):
            rewrite_select("select period(day, 1, now(), ts) from t", now=NOW)

    def test_period_rewrite(self):
        res = rewrite_select(
            "select count(*) as n from t where period(day, 3, '2024-01-15 00:00:00', ts)",
            now=NOW,
        )
        assert "SELECT MAX(ts) FROM t WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'" in res.sql
        assert "INTERVAL 3 DAY" in res.sql

    def test_period_week_to_days(self):
        res = rewrite_select(
            "select count(*) as n from t where period(week, 2, '2024-01-15', ts)", now=NOW
        )
        assert "INTERVAL 14 DAY" in res.sql

    def test_period_filter(self):
        res = rewrite_select(
            "select count(*) as n from t where period(hour, 6, now(), ts, and dev = 'x')",
            now=NOW,
        )
        assert res.sql.count("and dev = 'x'") == 3  # both anchors + outer

    def test_range_rewrite(self):
        res = rewrite_select("select range(v) as r from t", now=NOW)
        assert "abs(max(v) - min(v)) AS r" in res.sql

    def test_distinct_col_groups(self):
        res = rewrite_select("select distinct(dev) as dev from t", now=NOW)
        assert "GROUP BY dev" in res.sql

    def test_casting_extracted(self):
        res = rewrite_select("select v::float(2)::format(':,') as x from t", now=NOW)
        assert res.castings == [("x", ["float(2)", "format(':,')"])]
        assert "::" not in res.sql

    def test_leading_cols(self):
        res = rewrite_select(
            "select dev, count(*) as n from t group by dev",
            now=NOW,
            leading_cols=["table_name"],
        )
        assert res.sql.startswith("SELECT table_name, dev")
        assert "GROUP BY table_name, dev" in res.sql

    def test_pass_through_flag(self):
        assert rewrite_select("select a, b from t where a > 1", now=NOW).pass_through
        assert not rewrite_select("select max(a) as m from t", now=NOW).pass_through


class TestOptions:
    def test_full_command(self):
        cmd = parse_sql_command(
            'sql my_dbms format = json timezone = pt limit = 10 "select * from t"'
        )
        assert cmd.dbms == "my_dbms"
        assert cmd.fmt == "json"
        assert cmd.timezone == "pt"
        assert cmd.options["limit"] == 10
        assert cmd.statement == "select * from t"

    def test_extend_include_lists(self):
        cmd = parse_sql_command(
            "sql d extend = (@ip, @table_name as table) include = (d2.t2) select a from t"
        )
        assert cmd.extend == ["@ip", "@table_name as table"]
        assert cmd.include == ["d2.t2"]

    def test_bad_format_rejected(self):
        with pytest.raises(OptionError):
            parse_sql_command('sql d format = nope "select a from t"')


class TestRound2Fixes:
    def test_eqeq_inside_string_literal_preserved(self):
        res = rewrite_select("select a from t where note = 'a==b' and x == 1", now=NOW)
        assert "'a==b'" in res.sql
        assert "x = 1" in res.sql

    def test_is_true_inside_literal_preserved(self):
        res = rewrite_select(
            "select a from t where note = 'this is true' and ok is true", now=NOW
        )
        assert "'this is true'" in res.sql
        assert "ok = true" in res.sql

    def test_duplicate_alias_rejected(self):
        with pytest.raises(RewriteError, match="duplicate"):
            rewrite_select("select min(v) as m, max(v) as m from t", now=NOW)

    def test_duplicate_bare_column_rejected(self):
        with pytest.raises(RewriteError, match="duplicate"):
            rewrite_select("select a, a from t", now=NOW)

    def test_increments_grouped_total_order(self):
        res = rewrite_select(
            "select increments(day, 1, ts), event_type, count(*) as n "
            "from t group by event_type",
            now=NOW,
        )
        assert (
            "ORDER BY increments_trunc, increments_extract, event_type" in res.sql
        )

    def test_top_n_extracted(self):
        res = rewrite_select(
            "select top 5 event_id from t order by event_id", now=NOW
        )
        assert res.sql.endswith("LIMIT 5")
        assert "top" not in res.sql.lower()
        ir = parse_select("select distinct top 3 a from t")
        assert ir.limit == 3 and ir.distinct and ir.projection == ["a"]
