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


def format_result(df: DataFrame, fmt: str = "json", stat: bool = False) -> str:
    t0 = time.time()
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
