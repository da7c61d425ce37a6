"""Apply EdgeLake ``::casting`` chains to a result DataFrame.

In the reference, castings run in the presentation layer after the unify
query, row by row in Python (edge_lake/generic/utils_columns.py:1660
change_columns_values; method table :1963-1977 casting_methods_). Here
each casting becomes a JVM-side column expression — vectorized,
whole-stage-codegen'd, and distributed, which is the scale-correct
placement for 100 TB results flowing to a sink.

Supported (mirroring casting_methods_):
``::int ::str ::float(n) ::float(%n) ::ljust(n) ::rjust(n)
::format(fmt) ::datetime(fmt) ::timezone('tz') ::lstrip ::rstrip
::replace(a by b) ::timediff(...)``
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# named zones accepted by the reference (utils_columns.py:106-111)
TZ_NAMES = {
    "utc": "UTC",
    "local": "UTC",  # single-cluster deployment: local == session tz (UTC)
    "pt": "America/Los_Angeles",
    "mt": "America/Denver",
    "ct": "America/Chicago",
    "et": "America/New_York",
}

# strftime → java.time format tokens (subset the reference uses)
_STRFTIME_MAP = [
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%f", "SSSSSS"),
]


def strftime_to_java(fmt: str) -> str:
    out = fmt
    for py, java in _STRFTIME_MAP:
        out = out.replace(py, java)
    return out


class CastingError(ValueError):
    pass


def _first_replace(col: Column, old: str, new: str) -> Column:
    """Replace the FIRST occurrence only (reference cast_by_replace uses
    str.replace(a, b, 1), utils_columns.py:1878)."""
    s = col.cast("string")
    pos = F.instr(s, F.lit(old))
    return F.when(pos == 0, s).otherwise(
        F.concat(
            F.substring(s, F.lit(1), pos - 1),
            F.lit(new),
            F.substring(s, pos + len(old), F.length(s)),
        )
    )


def casting_to_column(col: Column, casting: str) -> Column:
    c = casting.strip()
    low = c.lower()
    if low == "int":
        return col.cast("bigint")
    if low == "str":
        return col.cast("string")
    if low == "lstrip":
        return F.ltrim(col.cast("string"))
    if low == "rstrip":
        return F.rtrim(col.cast("string"))
    m = re.fullmatch(r"float\((%?)(\d+)\)", low)
    if m:
        digits = int(m.group(2))
        rounded = F.round(col.cast("double"), digits)
        if m.group(1) == "%":
            # "{:,.Nf}" — thousands separators (cast_to_float,
            # utils_columns.py:1746)
            return F.format_number(rounded, digits)
        return rounded
    if low == "float":
        return col.cast("double")
    m = re.fullmatch(r"(l|r)just\((\d+)\)", low)
    if m:
        width = int(m.group(2))
        s = col.cast("string")
        if m.group(1) == "l":
            # pad right, truncate keeping the left (cast_to_just)
            return F.substring(F.rpad(s, width, " "), 1, width)
        return F.when(
            F.length(s) > width, F.substring(s, -width, width)
        ).otherwise(F.lpad(s, width, " "))
    m = re.fullmatch(r"format\((.*)\)", c, flags=re.DOTALL)
    if m:
        fmt = m.group(1).strip().strip("'\"")
        # python "{:,}"-style grouping (cast_with_format)
        m2 = re.fullmatch(r":,(?:\.(\d+)f)?", fmt)
        if m2:
            return F.format_number(col.cast("double"), int(m2.group(1) or 0))
        m2 = re.fullmatch(r":\.(\d+)f", fmt)
        if m2:
            return F.format_string(f"%.{m2.group(1)}f", col.cast("double"))
        raise CastingError(f"unsupported ::format spec: {fmt}")
    m = re.fullmatch(r"function\((.*)\)", c, flags=re.DOTALL)
    if m:
        # ::function(<expr>) — the reference evals a Python expression
        # per row with [col] placeholders resolved against the RESULT
        # row (cast_by_function, utils_columns.py:1870-1881). Spark
        # -first: accept a SQL expression instead; [col] → result-row
        # column reference, compiled JVM-side (safe, vectorized — no
        # per-row eval). Placeholders name OUTPUT columns, as in the
        # reference.
        body = re.sub(r"\[(\w+)\]", r"`\1`", m.group(1).strip())
        return F.expr(body)
    m = re.fullmatch(r"datetime(?:\((.*)\))?", c, flags=re.DOTALL)
    if m:
        fmt = (m.group(1) or "%Y-%m-%d %H:%M:%S").strip().strip("'\"")
        return F.date_format(col.cast("timestamp"), strftime_to_java(fmt))
    m = re.fullmatch(r"timezone\((.*)\)", c, flags=re.DOTALL)
    if m:
        tz = m.group(1).strip().strip("'\"").lower()
        zone = TZ_NAMES.get(tz, tz)
        return F.date_format(
            F.from_utc_timestamp(col.cast("timestamp"), zone), "yyyy-MM-dd HH:mm:ss"
        )
    m = re.fullmatch(r"replace\((.*)\)", c, flags=re.DOTALL)
    if m:
        left, sep, right = m.group(1).partition(" by ")
        if not sep:
            raise CastingError(f"bad ::replace spec: {c}")
        return _first_replace(col, left.strip().strip("'\""), right.strip().strip("'\""))
    m = re.fullmatch(r"timediff\((.*)\)", c, flags=re.DOTALL)
    if m:
        # seconds between the column and another timestamp expression,
        # formatted HH:MM:SS.f (ret_time_diff, utils_columns.py:1902)
        other = m.group(1).strip()
        other_col = F.expr(other) if not re.fullmatch(r"'.*'", other) else F.lit(other.strip("'"))
        diff = F.abs(
            F.unix_micros(col.cast("timestamp")) - F.unix_micros(other_col.cast("timestamp"))
        ) / F.lit(1000000.0)
        hours = F.floor(diff / 3600)
        minutes = F.floor((diff % 3600) / 60)
        seconds = F.floor(diff % 60)
        frac = F.floor((diff % 1) * 100000)
        return F.format_string("%02d:%02d:%02d.%d", hours, minutes, seconds, frac)
    raise CastingError(f"unsupported casting: ::{casting}")


def apply_castings(df: DataFrame, castings: list[tuple[str, list[str]]]) -> DataFrame:
    for col_name, chain in castings:
        col = F.col(col_name)
        for casting in chain:
            col = casting_to_column(col, casting)
        df = df.withColumn(col_name, col)
    return df
