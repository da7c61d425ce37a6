"""EdgeLake date/time literal functions, evaluated at rewrite time.

The reference resolves ``now()``, ``date(...)`` and ``timestamp(...)``
(with SQLite-style modifier strings such as ``'start of month'``,
``'+1 month'``, ``'-2 hours'``) into **fixed UTC literals during query
rewrite**, not at execution (edge_lake/dbms/unify_results.py:651-693
al_timestamp_function/al_date_function;
edge_lake/generic/utils_columns.py:1488-1563 function_to_time /
apply_time_function). We reproduce that: deterministic plans, and the
same literal is seen by every partition of a 1000-executor job.

``now`` is injectable so tests and the oracle gate are deterministic.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

TIME_FORMAT = "%Y-%m-%d %H:%M:%S.%f"

#: unit name -> seconds, for the fixed-length units
_FIXED_UNITS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 7 * 86400,
}

_UNIT_ALIASES = {
    "s": "second",
    "m": "minute",
    "h": "hour",
    "d": "day",
    "w": "week",
}


def utc_now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def _norm_unit(unit: str) -> str:
    unit = unit.strip().lower()
    unit = _UNIT_ALIASES.get(unit, unit)
    if unit.endswith("s") and unit[:-1] in ("second", "minute", "hour", "day", "week", "month", "year"):
        unit = unit[:-1]
    return unit


def add_units(dt: datetime, n: int, unit: str) -> datetime:
    """dt + n*unit with calendar-aware month/year math (matches the
    reference's time_units_calculator behavior of shifting the month and
    clamping the day)."""
    unit = _norm_unit(unit)
    if unit in _FIXED_UNITS:
        return dt + timedelta(seconds=n * _FIXED_UNITS[unit])
    if unit == "month":
        total = dt.year * 12 + (dt.month - 1) + n
        year, month = divmod(total, 12)
        month += 1
        day = min(dt.day, _days_in_month(year, month))
        return dt.replace(year=year, month=month, day=day)
    if unit == "year":
        return add_units(dt, n * 12, "month")
    raise ValueError(f"unknown time unit: {unit}")


def _days_in_month(year: int, month: int) -> int:
    if month == 12:
        nxt = datetime(year + 1, 1, 1)
    else:
        nxt = datetime(year, month + 1, 1)
    return (nxt - timedelta(days=1)).day


def apply_time_modifier(dt: datetime, modifier: str) -> datetime:
    """One SQLite-style modifier: 'start of year|month|day', '+N unit',
    '-N unit' (reference utils_columns.py:1523-1563 apply_time_function)."""
    modifier = modifier.strip().strip("'\"")
    if modifier.startswith("start of"):
        what = modifier.split()[-1]
        if what == "year":
            return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
        if what == "month":
            return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        if what == "day":
            return dt.replace(hour=0, minute=0, second=0, microsecond=0)
        raise ValueError(f"unsupported modifier: {modifier}")
    m = re.fullmatch(r"([+-])\s*(\d+)\s*([a-zA-Z]+)", modifier)
    if not m:
        raise ValueError(f"unsupported time modifier: {modifier}")
    sign = -1 if m.group(1) == "-" else 1
    return add_units(dt, sign * int(m.group(2)), m.group(3))


_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?Z?$")


def function_to_time(args_str: str, now: datetime) -> str | None:
    """Evaluate the argument list of date()/timestamp(): first arg is
    'now' or a date/timestamp string, the rest are modifiers. Returns a
    ``YYYY-MM-DD HH:MM:SS.ffffff`` string or None if not parseable
    (reference utils_columns.py:1488 function_to_time)."""
    parts = [p.strip() for p in args_str.split(",")]
    if not parts or not parts[0]:
        return None
    first = parts[0].strip("'\"")
    if first.lower() == "now":
        dt = now
    elif _TS_RE.match(first):
        first = first.rstrip("Z").replace("T", " ")
        if len(first) == 10:
            first += " 00:00:00"
        if "." not in first:
            if len(first) == 16:
                first += ":00"
            first += ".0"
        dt = datetime.strptime(first, TIME_FORMAT)
    else:
        return None
    for mod in parts[1:]:
        dt = apply_time_modifier(dt, mod)
    return dt.strftime(TIME_FORMAT)


# --- rewrite-time folding over SQL text --------------------------------

_FN_RE = re.compile(r"\b(now|date|timestamp)\s*\(([^()]*)\)", re.IGNORECASE)
# literal +/- N unit (also bare shorthands like '- 3d'), folded after
# function substitution, mirroring the reference's pre-resolution of all
# date arithmetic into fixed literals
_ARITH_RE = re.compile(
    r"'(\d{4}-\d{2}-\d{2}[ T]?[\d:.]*)'\s*([+-])\s*(\d+)\s*"
    r"(seconds?|minutes?|hours?|days?|weeks?|months?|years?|[smhdwy])\b",
    re.IGNORECASE,
)


def resolve_time_literals(sql: str, now: datetime) -> str:
    """Replace now()/date()/timestamp() calls with UTC literals and fold
    ``'<literal>' +/- N unit`` arithmetic into single literals."""

    def _sub_fn(m: re.Match) -> str:
        fn = m.group(1).lower()
        args = m.group(2)
        if fn == "now" and not args.strip():
            return "'" + now.strftime(TIME_FORMAT) + "'"
        val = function_to_time(args, now)
        if val is None:
            return m.group(0)  # leave for Spark (e.g. date(col))
        if fn == "date":
            return "'" + val[:10] + "'"
        return "'" + val + "'"

    out = _FN_RE.sub(_sub_fn, sql)

    def _sub_arith(m: re.Match) -> str:
        lit = m.group(1).replace("T", " ")
        if len(lit) == 10:
            lit += " 00:00:00.0"
        dt = datetime.strptime(lit if "." in lit else lit + ".0", TIME_FORMAT)
        sign = -1 if m.group(2) == "-" else 1
        dt = add_units(dt, sign * int(m.group(3)), m.group(4))
        return "'" + dt.strftime(TIME_FORMAT) + "'"

    prev = None
    while prev != out:  # chains like now() - 1 day - 2 hours
        prev = out
        out = _ARITH_RE.sub(_sub_arith, out, count=1)
    return out
