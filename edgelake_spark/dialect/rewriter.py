"""Rewrites EdgeLake-dialect SELECT statements into standard Spark SQL.

The reference's two-phase rewrite (per-operator remote query + query-node
unify query, edge_lake/dbms/unify_results.py:901-1353 make_sql_stmt)
collapses on Spark into ONE declarative statement: Catalyst performs the
partial/final aggregation split, predicate pushdown, and partition
pruning that EdgeLake hand-rolls. What remains is the dialect-specific
surface, translated here exactly as the reference defines it:

- ``increments(unit, n, time_col)``  →  ``date_trunc('<parent>', col)``
  + ``extract(<unit> FROM col) / n`` integer division, grouped by both
  (unify_results.py:482-583; parent-unit ladder utils_sql.py:18-26).
  Deliberately NOT Spark's ``window()``: EdgeLake buckets snap to the
  parent-unit truncation, window() snaps to the epoch — results differ.
- auto-increments ``increments([points,] col)``: pick unit and interval
  so the WHERE time range yields ≈points buckets (default 1000)
  (unify_results.py:339-462; thresholds utils_sql.py:28-36).
- ``period(unit, n, date, col[, filter])`` in WHERE  →  anchored
  trailing window via correlated MAX scalar subqueries
  (unify_results.py:695-838). Spark decorrelates these natively.
- ``now()/date()/timestamp()`` modifiers resolved to fixed UTC literals
  at rewrite time (see :mod:`edgelake_spark.dialect.timefns`).
- ``range(col)`` → ``abs(max-min)`` (unify_results.py:283-311),
  ``distinct(col)`` → group-by on the column (unify_results.py:78-114).
- ``::casting`` chains are *extracted* (applied later on the result
  DataFrame — presentation-layer in the reference too,
  utils_columns.py:1660 change_columns_values).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime

from edgelake_spark.dialect.parser import SelectIR, parse_select, split_top_level
from edgelake_spark.dialect.timefns import resolve_time_literals, utc_now

# parent-unit ladder (reference utils_sql.py:18-26 increment_date_types)
INCREMENT_PARENT_UNIT = {
    "second": "minute",
    "minute": "hour",
    "hour": "day",
    "day": "month",
    "week": "month",
    "month": "year",
    "year": "",
}

# human-unit thresholds for the auto-increments planner
# (reference utils_sql.py:28-36 increment_units_)
INCREMENT_UNITS = [
    ("year", 365.25 * 24 * 3600),
    ("month", 30.44 * 24 * 3600),
    ("week", 7 * 24 * 3600),
    ("day", 24 * 3600),
    ("hour", 3600),
    ("minute", 60),
    ("second", 1),
]

AGG_FUNCS = {"count", "min", "max", "sum", "avg"}


class RewriteError(ValueError):
    pass


@dataclass
class RewriteResult:
    sql: str
    castings: list[tuple[str, list[str]]] = field(default_factory=list)
    output_columns: list[str] = field(default_factory=list)
    increments: tuple | None = None  # (unit, interval, column) when used
    pass_through: bool = False  # no funcs/group/order → streamable
    #: final ORDER BY items as emitted (col [DESC]) — post-SQL operators
    #: (per-column limit) re-apply them after breaking the sort
    order_items: list[str] = field(default_factory=list)


def _strip_alias(item: str) -> tuple[str, str]:
    m = re.search(r"\s+as\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", item, re.IGNORECASE)
    if m:
        return item[: m.start()].strip(), m.group(1)
    return item.strip(), ""


def _split_castings(expr: str) -> tuple[str, list[str]]:
    """Split ``expr::cast1::cast2`` at depth 0 (casting dispatch:
    reference utils_columns.py:1963-1977)."""
    parts, buf, depth, quote, i = [], [], 0, None, 0
    while i < len(expr):
        ch = expr[i]
        if quote:
            if ch == quote:
                quote = None
            buf.append(ch)
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == ":" and depth == 0 and i + 1 < len(expr) and expr[i + 1] == ":":
            parts.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts[0].strip(), [p.strip() for p in parts[1:]]


def _claim_name(name: str, used: set[str]) -> str:
    """Explicit aliases and bare column names must be unique in the
    projection — the reference rejects duplicate output names
    (unify_results.py:1107-1112)."""
    if name in used:
        raise RewriteError(f"duplicate column name in projection: {name}")
    used.add(name)
    return name


def _auto_name(expr: str, used: set[str]) -> str:
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", expr):
        base = expr
    else:
        m = re.match(r"([a-zA-Z_]+)\s*\(\s*(distinct\s+)?(\*|[A-Za-z_][A-Za-z0-9_.]*)?", expr)
        if m:
            fn = m.group(1).lower()
            col = (m.group(3) or "all").replace("*", "all").replace(".", "_")
            base = f"{fn}_{col}" if fn not in ("", col) else col
        else:
            base = re.sub(r"[^A-Za-z0-9_]+", "_", expr).strip("_") or "col"
    name, k = base, 1
    while name in used:
        k += 1
        name = f"{base}_{k}"
    used.add(name)
    return name


# ---------------------------------------------------------------- where

_PERIOD_RE = re.compile(r"\bperiod\s*\(", re.IGNORECASE)


def _rewrite_period(where: str, table: str) -> str:
    """period(unit, n, date, col[, filter]) → correlated-MAX range
    condition (reference unify_results.py:695-838). ``week`` → 7 days
    (the reference's intended semantics, unify_results.py:710-714)."""
    while True:
        m = _PERIOD_RE.search(where)
        if not m:
            return where
        start = m.end()
        depth, i = 1, start
        while i < len(where) and depth:
            if where[i] == "(":
                depth += 1
            elif where[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise RewriteError("unbalanced parens in period()")
        args = split_top_level(where[start : i - 1])
        if len(args) not in (4, 5):
            raise RewriteError(f"period() needs 4 or 5 arguments, got {len(args)}")
        unit, count_s, date_s, col = (a.strip() for a in args[:4])
        filt = args[4].strip() if len(args) == 5 else ""
        if unit not in INCREMENT_PARENT_UNIT:
            raise RewriteError(f"period(): bad unit {unit}")
        count = int(count_s)
        if unit == "week":
            unit, count = "day", count * 7
        if not date_s.startswith("'"):
            date_s = f"'{date_s}'"
        filt_sql = f" {filt}" if filt else ""
        anchor = (
            f"(SELECT MAX({col}) FROM {table} "
            f"WHERE {col} <= TIMESTAMP {date_s}{filt_sql})"
        )
        cond = (
            f"({col} > {anchor} - INTERVAL {count} {unit.upper()} "
            f"AND {col} <= {anchor}{filt_sql})"
        )
        where = where[: m.start()] + cond + where[i:]


def _sub_outside_quotes(pattern: str, repl: str, text: str, flags: int = 0) -> str:
    """re.sub applied only to segments outside single/double quotes, so
    predicate normalization never corrupts string literals."""
    out, buf, quote = [], [], None
    rx = re.compile(pattern, flags)
    for ch in text:
        if quote:
            buf.append(ch)
            if ch == quote:
                out.append("".join(buf))
                buf = []
                quote = None
        elif ch in ("'", '"'):
            out.append(rx.sub(repl, "".join(buf)))
            buf = [ch]
            quote = ch
        else:
            buf.append(ch)
    out.append("".join(buf) if quote else rx.sub(repl, "".join(buf)))
    return "".join(out)


def _normalize_where(where: str) -> str:
    """EdgeLake predicate spellings → standard SQL
    (operator set: reference utils_columns.py:217-232). Quote-aware so
    ``note = 'a==b'`` keeps its literal intact."""
    where = _sub_outside_quotes(r"==", "=", where)
    where = _sub_outside_quotes(r"\bis\s+true\b", "= true", where, re.IGNORECASE)
    where = _sub_outside_quotes(r"\bis\s+false\b", "= false", where, re.IGNORECASE)
    return where


# ----------------------------------------------------------- increments

_TIME_LIT_RE = re.compile(r"'(\d{4}-\d{2}-\d{2}(?:[ T]\d{2}:\d{2}:\d{2}(?:\.\d+)?)?)'")


def _where_time_range_seconds(where: str) -> float | None:
    """Span of the time literals in WHERE, used by the auto-increments
    planner (reference utils_columns str_to_timediff over the where
    conditions)."""
    stamps = []
    for m in _TIME_LIT_RE.finditer(where):
        lit = m.group(1).replace("T", " ")
        if len(lit) == 10:
            lit += " 00:00:00"
        lit = lit.split(".")[0]
        stamps.append(datetime.strptime(lit, "%Y-%m-%d %H:%M:%S"))
    if len(stamps) < 2:
        return None
    return abs((max(stamps) - min(stamps)).total_seconds())


def plan_auto_increments(span_seconds: float, data_points: int = 1000) -> tuple[str, int]:
    """unit+interval so the range yields ≈data_points buckets
    (reference unify_results.py:448-462 increment_no_rows_count)."""
    interval_seconds = span_seconds / data_points
    for unit, unit_seconds in INCREMENT_UNITS:
        if interval_seconds >= unit_seconds:
            return unit, max(1, round(interval_seconds / unit_seconds))
    return "second", 1


def _increment_exprs(unit: str, interval: int, col: str, alias: str) -> tuple[list[str], list[str]]:
    """SQL projection items + group keys for one increments() call.

    Postgres form in the reference: ``date_trunc('<parent>',col),
    extract(<unit> FROM col)::int / n`` with GROUP BY 1,2
    (unify_results.py:562-583 get_remote_query_increment). ``::int /``
    is integer division; extract values are non-negative so truncating
    and floor division agree. Year has no parent truncation.
    """
    parent = INCREMENT_PARENT_UNIT[unit]
    t_name = f"{alias}_trunc"
    e_name = f"{alias}_extract"
    extract_expr = (
        f"CAST(CAST(extract({unit.upper()} FROM {col}) AS INT) div {interval} AS BIGINT) AS {e_name}"
    )
    if unit == "year":
        return [extract_expr], [e_name]
    trunc_expr = f"date_trunc('{parent}', {col}) AS {t_name}"
    return [trunc_expr, extract_expr], [t_name, e_name]


_INCR_RE = re.compile(r"^increments\s*\((.*)\)$", re.IGNORECASE | re.DOTALL)


# ------------------------------------------------------------- rewriter


def rewrite_select(
    sql: str,
    table_resolver=None,
    now: datetime | None = None,
    data_points_default: int = 1000,
    leading_cols: list[str] | None = None,
) -> RewriteResult:
    """EdgeLake-dialect SELECT text → Spark SQL text + post-ops.

    ``table_resolver(name) -> str`` maps the dialect's ``dbms.table``
    reference to the registered Spark view name. ``leading_cols`` are
    extend-columns: projected first and leading every GROUP BY/ORDER BY,
    matching the reference (unify_results.py:1240-1286, 1490-1545).
    """
    now = now or utc_now()
    ir = parse_select(sql)
    table = table_resolver(ir.table) if table_resolver else ir.table

    where = ir.where
    if where:
        where = resolve_time_literals(where, now)
        where = _normalize_where(where)
        where = _rewrite_period(where, table)

    used_names: set[str] = set()
    select_items: list[str] = []
    castings: list[tuple[str, list[str]]] = []
    out_cols: list[str] = []
    group_keys = list(ir.group_by)
    incr_group: list[str] = []
    incr_info = None
    has_agg = False

    for raw in ir.projection:
        expr, alias = _strip_alias(raw)
        expr, cast_chain = _split_castings(expr)

        m = _INCR_RE.match(expr)
        if m:
            details = [d.strip() for d in split_top_level(m.group(1))]
            if len(details) == 3:
                unit, interval_s, col = details
                unit = unit.lower()
                interval = int(interval_s)
            elif len(details) in (1, 2):
                # auto planner: increments(col) / increments(points, col)
                if len(details) == 2:
                    a, b = details
                    points, col = (int(a), b) if a.isdigit() else (int(b), a)
                else:
                    points, col = data_points_default, details[0]
                span = _where_time_range_seconds(where)
                if span is None:
                    raise RewriteError(
                        "increments() without explicit unit needs a WHERE time range"
                    )
                unit, interval = plan_auto_increments(span, points)
            else:
                raise RewriteError(f"bad increments() arguments: {m.group(1)}")
            if unit not in INCREMENT_PARENT_UNIT:
                raise RewriteError(f"increments(): bad unit {unit}")
            alias = alias or "increments"
            exprs, keys = _increment_exprs(unit, interval, col, alias)
            select_items.extend(exprs)
            incr_group.extend(keys)
            out_cols.extend(keys)
            for k in keys:
                used_names.add(k)
            incr_info = (unit, interval, col)
            continue

        # range(col) → abs(max-min) (reference unify_results.py:283-311)
        m = re.match(r"^range\s*\(\s*([^)]+?)\s*\)$", expr, re.IGNORECASE)
        if m:
            col = m.group(1)
            name = (
                _claim_name(alias, used_names)
                if alias
                else _auto_name(f"range_{col}", used_names)
            )
            select_items.append(f"abs(max({col}) - min({col})) AS {name}")
            out_cols.append(name)
            has_agg = True
            if cast_chain:
                castings.append((name, cast_chain))
            continue

        # distinct(col) → value column grouped on itself
        # (reference unify_results.py:78-114)
        m = re.match(r"^distinct\s*\(\s*([^)]+?)\s*\)$", expr, re.IGNORECASE)
        if m:
            col = m.group(1)
            name = _claim_name(alias or col, used_names)
            select_items.append(f"{col} AS {name}" if name != col else col)
            group_keys.append(col)
            out_cols.append(name)
            if cast_chain:
                castings.append((name, cast_chain))
            continue

        fn = re.match(r"^([a-zA-Z_]+)\s*\(", expr)
        if fn and fn.group(1).lower() in AGG_FUNCS:
            has_agg = True

        if expr == "*":
            select_items.append("*")
            continue
        if alias:
            name = _claim_name(alias, used_names)
        elif re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", expr):
            # bare column repeated → duplicate output name, rejected like
            # the reference; computed exprs still get auto-dedup names
            name = _claim_name(expr, used_names)
        else:
            name = _auto_name(expr, used_names)
        select_items.append(expr if (not alias and expr == name) else f"{expr} AS {name}")
        out_cols.append(name)
        if cast_chain:
            castings.append((name, cast_chain))

    if where:
        where = resolve_time_literals(where, now)  # fold period-introduced arith if any

    # implicit grouping: extend columns, then increments (and
    # distinct(col)) keys, lead every GROUP BY (reference
    # unify_results.py:1240-1286)
    leading = list(leading_cols or [])
    final_group = incr_group + [g for g in group_keys if g not in incr_group]
    if leading and (final_group or has_agg):
        # extended cols group implicitly even when the user query has no
        # GROUP BY — per-source aggregation is the point of extend
        final_group = leading + final_group
    if leading:
        select_items = leading + select_items
        out_cols[:0] = leading

    parts = ["SELECT"]
    if ir.distinct:
        parts.append("DISTINCT")
    parts.append(", ".join(select_items))
    parts.append(f"FROM {table}")
    if where:
        parts.append(f"WHERE {where}")
    if final_group:
        parts.append("GROUP BY " + ", ".join(final_group))

    order_items: list[str] = []
    direction = "" if ir.ascending else " DESC"
    if leading and (final_group or ir.order_by):
        order_items.extend(leading)
    for o in ir.order_by:
        order_items.append(o + direction)
    if incr_group:
        # increments ordering: user keys first, then trunc+extract
        # (reference unify_results.py:528-536). Append the remaining
        # group keys too so rows sharing a bucket have a total,
        # deterministic order (the oracle orders by every key).
        already = set(order_items) | set(ir.order_by)
        order_items.extend(k for k in incr_group if k not in already)
        order_items.extend(
            g for g in final_group if g not in incr_group and g not in already
        )
    if order_items:
        parts.append("ORDER BY " + ", ".join(order_items))
    if ir.limit:
        parts.append(f"LIMIT {ir.limit}")

    res = RewriteResult(
        sql=" ".join(parts),
        castings=castings,
        output_columns=out_cols,
        increments=incr_info,
        order_items=order_items,
    )
    # dialect functions that survived rewriting are in an illegal
    # position (e.g. period() in the SELECT list — it is a WHERE-clause
    # range function, reference unify_results.py:695): fail with a
    # dialect error instead of leaking an UNRESOLVED_ROUTINE from Spark
    leftover = re.search(r"\b(period|increments)\s*\(", res.sql, re.IGNORECASE)
    if leftover:
        raise RewriteError(
            f"{leftover.group(1)}() is only valid in the WHERE clause"
            if leftover.group(1).lower() == "period"
            else "increments() is only valid as a projection of a grouped select"
        )
    res.pass_through = not (has_agg or final_group or ir.order_by or ir.distinct)
    return res
