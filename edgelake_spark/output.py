"""Result rendering: json / json:list / table (+ stat footer).

Mirrors the reference's OutputManager formats
(edge_lake/generic/output_data.py:35; format enums
edge_lake/cmd/member_cmd.py:136-141). Rendering collects to the driver —
it is for interactive/REST-sized results, exactly like the reference's
query-node output stage; large results should go through DataFrame
writers instead (dest = file/kafka in the reference maps to df.write).
"""

from __future__ import annotations

import json
import time
from datetime import date, datetime

from pyspark.sql import DataFrame


def _json_default(v):
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def stream_result(df: DataFrame, fmt: str = "json"):
    """Generator of output chunks for pass-through queries — rows are
    pulled partition-by-partition via ``toLocalIterator`` so the driver
    never holds the whole result (the reference's pass-through fast
    path, job_instance.py:562-575 / unify_results.py:921: rows stream
    from operators straight to the caller without a scratch table).
    """
    if fmt in ("json", "json:output"):
        head, tail = '{"Query": [', "]}"
    elif fmt == "json:list":
        head, tail = "[", "]"
    else:
        raise ValueError(f"stream_result supports json formats, not {fmt}")
    yield head
    first = True
    for row in df.toLocalIterator():
        chunk = json.dumps(row.asDict(recursive=True), default=_json_default)
        yield chunk if first else ", " + chunk
        first = False
    yield tail


def format_result(
    df: DataFrame, fmt: str = "json", stat: bool = False, pass_through: bool = False
) -> str:
    t0 = time.time()
    if pass_through and not stat and fmt in ("json", "json:output", "json:list"):
        return "".join(stream_result(df, fmt))
    rows = [r.asDict(recursive=True) for r in df.collect()]
    elapsed = time.time() - t0

    if fmt in ("json", "json:output"):
        body = json.dumps({"Query": rows}, default=_json_default)
    elif fmt == "json:list":
        body = json.dumps(rows, default=_json_default)
    elif fmt == "table":
        body = _ascii_table(df.columns, rows)
    else:
        raise ValueError(f"unknown output format: {fmt}")

    if stat:
        # stat footer like the reference (output_data.py prints rows +
        # run time under 'stat = true', member_cmd.py:129)
        body += f"\n{{\"Statistics\":[{{\"Count\": {len(rows)}, \"Time\": \"{elapsed:.3f}\"}}]}}"
    return body


def _ascii_table(columns: list[str], rows: list[dict]) -> str:
    cells = [[("" if r.get(c) is None else str(r.get(c))) for c in columns] for r in rows]
    widths = [max(len(c), *(len(row[i]) for row in cells)) if cells else len(c) for i, c in enumerate(columns)]
    header = " | ".join(c.ljust(widths[i]) for i, c in enumerate(columns))
    sep = "-+-".join("-" * w for w in widths)
    lines = [header, sep]
    for row in cells:
        lines.append(" | ".join(v.ljust(widths[i]) for i, v in enumerate(row)))
    return "\n".join(lines)


# ------------------------------------------------------------ test format

_SECTION_SEP = "=" * 74


def format_test_output(
    df: DataFrame,
    fmt_type: str = "table",
    title: str = "",
    command: str = "",
    dbms: str = "",
    now: datetime | None = None,
) -> str:
    """The reference's TEST format: Header / Output / Stat sections
    separated by ``====`` lines, used by its built-in QA harness
    (output_data.py:209-262 output_test_header/footer; enabled with
    ``test = true``, member_cmd.py:124-127)."""
    t0 = time.time()
    body = format_result(df, fmt_type if fmt_type != "test" else "table")
    elapsed = time.time() - t0
    rows = body.count("\n") - 1 if fmt_type == "table" else body.count("{")

    header = [_SECTION_SEP]
    if title:
        header.append(f"Title:      {title}")
    header.append(f"Date:       {(now or datetime.utcnow()).strftime('%Y-%m-%d %H:%M:%S')}")
    if command:
        header.append(f"Command:    {command}")
    if dbms:
        header.append(f"DBMS:       {dbms}")
    header.append(f"Format:     {fmt_type}")
    header.append(_SECTION_SEP)

    footer = [_SECTION_SEP, f"Rows:     {df.count()}", f"Run Time: {elapsed:.3f}", _SECTION_SEP]
    return "\n".join(header) + "\n" + body + "\n" + "\n".join(footer)


def _test_sections(text: str) -> list[list[str]]:
    """Split TEST-format text into sections at ``====`` separator lines."""
    sections, current = [], []
    for line in text.splitlines():
        if line.startswith("======================="):
            sections.append(current)
            current = []
        else:
            current.append(line)
    sections.append(current)
    return [s for s in sections if s]


def analyze_test_output(trusted_text: str, validated_text: str) -> dict:
    """Compare a TEST-format output against a trusted (golden) file —
    the ``source = <file>`` validation path (reference
    utils_io.py:2887-2990 analyze_file). Data sections must match line
    by line; Date/Run Time lines are informational and ignored.

    Returns {"result": "Passed"|"Failed", "title", "reason", "diff"}.
    """
    t_sections = _test_sections(trusted_text)
    v_sections = _test_sections(validated_text)
    title = ""
    for line in (t_sections[0] if t_sections else []):
        if line.startswith("Title:"):
            title = line[6:].strip()
    if len(t_sections) < 2 or len(v_sections) < 2:
        return {"result": "Failed", "title": title, "reason": "missing data section", "diff": ""}
    t_data, v_data = t_sections[1], v_sections[1]
    for i, (t_line, v_line) in enumerate(zip(t_data, v_data), start=1):
        if t_line != v_line:
            return {
                "result": "Failed",
                "title": title,
                "reason": f"Failed compare in line {i}",
                "diff": f"trusted: {t_line!r} != validated: {v_line!r}",
            }
    if len(t_data) != len(v_data):
        return {
            "result": "Failed",
            "title": title,
            "reason": f"row count differs: {len(t_data)} vs {len(v_data)}",
            "diff": "",
        }
    # stat section: Rows must agree (Run Time is ignored)
    def _rows_of(sections):
        for line in (sections[2] if len(sections) > 2 else []):
            if line.startswith("Rows:"):
                return line.split(":", 1)[1].strip()
        return None

    if _rows_of(t_sections) != _rows_of(v_sections):
        return {
            "result": "Failed",
            "title": title,
            "reason": "Rows mismatch in stat section",
            "diff": f"{_rows_of(t_sections)} vs {_rows_of(v_sections)}",
        }
    return {"result": "Passed", "title": title, "reason": "", "diff": ""}
