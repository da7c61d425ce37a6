"""Minimal SELECT parser for the EdgeLake dialect.

The reference normalizes the statement text and slices it into
projection / table / where / group / order / limit segments
(edge_lake/generic/utils_sql.py:708-868 format_select_sql,
edge_lake/generic/al_parser.py:17-93 SelectParsed). The recognized
clause keywords after the table name are exactly
``where|order|group|limit|join|inner|outer`` (utils_sql.py:37-44).
We parse the same narrow shape into a small IR; everything inside
expressions stays as text and is rewritten (not re-parsed) downstream.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero."""
    parts, buf, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
            buf.append(ch)
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _find_keyword(s: str, kw: str, start: int = 0) -> int:
    """Index of keyword at depth 0 outside quotes, -1 if absent."""
    pattern = re.compile(r"\b" + kw.replace(" ", r"\s+") + r"\b", re.IGNORECASE)
    depth, i, quote = 0, start, None
    while i < len(s):
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = pattern.match(s, i)
            if m:
                return i
        i += 1
    return -1


@dataclass
class SelectIR:
    distinct: bool = False
    projection: list[str] = field(default_factory=list)
    table: str = ""
    where: str = ""
    group_by: list[str] = field(default_factory=list)
    order_by: list[str] = field(default_factory=list)
    ascending: bool = True  # ONE direction for the whole clause (al_parser.py:38)
    limit: int = 0  # 0 = none
    join_str: str = ""  # tolerated, like the reference (utils_sql.py:823)


class ParseError(ValueError):
    pass


def parse_select(sql: str) -> SelectIR:
    text = re.sub(r"\s+", " ", sql.strip().rstrip(";")).strip()
    if not re.match(r"select\b", text, re.IGNORECASE):
        raise ParseError(f"not a SELECT statement: {text[:60]}")
    ir = SelectIR()
    body = text[6:].strip()
    # `distinct(col)` is the per-column distinct FUNCTION in EdgeLake
    # (unify_results.py:78-114), only bare `distinct ` is the keyword
    if re.match(r"distinct\b", body, re.IGNORECASE) and not re.match(
        r"distinct\s*\(", body, re.IGNORECASE
    ):
        ir.distinct = True
        body = body[8:].strip()

    # `TOP n` right after SELECT [DISTINCT] → limit (reference extracts
    # TOP from the text and carries it as the limit,
    # utils_sql.py:870-898 get_limit_by_top)
    m = re.match(r"top\s+(\d+)\s+", body, re.IGNORECASE)
    if m:
        ir.limit = int(m.group(1))
        body = body[m.end() :]

    from_pos = _find_keyword(body, "from")
    if from_pos < 0:
        raise ParseError("SELECT without FROM")
    ir.projection = split_top_level(body[:from_pos])
    rest = body[from_pos + 4 :].strip()

    # table name runs until the first clause keyword
    positions = {}
    for kw in ("where", "group by", "order by", "limit", "join", "inner", "outer"):
        p = _find_keyword(rest, kw)
        if p >= 0:
            positions[kw] = p
    table_end = min(positions.values()) if positions else len(rest)
    ir.table = rest[:table_end].strip()
    if not ir.table:
        raise ParseError("missing table name")

    def clause(kw: str, skip: int) -> str:
        if kw not in positions:
            return ""
        start = positions[kw] + skip
        end = len(rest)
        for other, p in positions.items():
            if p > positions[kw]:
                end = min(end, p)
        return rest[start:end].strip()

    ir.where = clause("where", 5)
    g = clause("group by", 8)
    if g:
        ir.group_by = split_top_level(g)
    o = clause("order by", 8)
    if o:
        # one asc/desc flag for the entire clause (reference behavior)
        m = re.search(r"\b(asc|desc)\s*$", o, re.IGNORECASE)
        if m:
            ir.ascending = m.group(1).lower() == "asc"
            o = o[: m.start()].strip().rstrip(",")
        ir.order_by = [c.strip().rstrip(",").replace(" asc", "").replace(" desc", "") for c in split_top_level(o)]
    lim = clause("limit", 5)
    if lim:
        m = re.match(r"(\d+)", lim)
        if not m:
            raise ParseError(f"bad LIMIT: {lim}")
        ir.limit = int(m.group(1))
    for kw in ("join", "inner", "outer"):
        if kw in positions:
            ir.join_str = rest[positions[kw] :]
            break
    return ir
