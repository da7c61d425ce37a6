"""Option-block parser for the ``sql`` command.

Reference: ``sql <dbms> [key = value ...] "SELECT ..."`` — option keys
and value enums from edge_lake/cmd/member_cmd.py:110-158
(cmd_instructions / format_values / dest_values). Options recognized:

format (json | json:output | json:list | table | dataframe),
timezone (utc | local | pt | mt | ct | et | <iana>),
extend ((@ip, @port, @dbms_name, @table_name, +ip, ...)),
include ((dbms.table, ...)), table (repeatable-query target name),
drop (true/false), dest, stat, test, source, title, limit,
per_column, pass_through.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from edgelake_spark.dialect.parser import split_top_level

FORMAT_VALUES = {"json", "json:output", "json:list", "table", "dataframe", "test"}


@dataclass
class SqlCommand:
    dbms: str = ""
    options: dict = field(default_factory=dict)
    statement: str = ""

    @property
    def fmt(self) -> str:
        return self.options.get("format", "dataframe")

    @property
    def timezone(self) -> str:
        return self.options.get("timezone", "utc")

    @property
    def include(self) -> list[str]:
        return self.options.get("include", [])

    @property
    def extend(self) -> list[str]:
        return self.options.get("extend", [])


class OptionError(ValueError):
    pass


def parse_sql_command(command: str) -> SqlCommand:
    """Parse ``sql <dbms> <k = v ...> "<select ...>"`` (also accepts the
    statement unquoted — the reference tolerates both)."""
    text = command.strip()
    if re.match(r"^sql\b", text, re.IGNORECASE):
        text = text[3:].strip()
        m = re.match(r"([A-Za-z_][A-Za-z0-9_]*)\s+", text)
        if not m:
            raise OptionError("sql command missing dbms name")
        dbms = m.group(1)
        text = text[m.end() :].strip()
    else:
        dbms = ""

    cmd = SqlCommand(dbms=dbms)

    # options run until the quoted statement or the select keyword
    while text:
        if text[0] in ("'", '"'):
            cmd.statement = text[1:-1] if text[-1] == text[0] else text[1:]
            break
        if re.match(r"select\b", text, re.IGNORECASE):
            cmd.statement = text
            break
        m = re.match(r"([A-Za-z_:]+)\s*=\s*", text)
        if not m:
            raise OptionError(f"cannot parse options at: {text[:40]}")
        key = m.group(1).lower()
        rest = text[m.end() :]
        if rest.startswith("("):
            depth, i = 0, 0
            for i, ch in enumerate(rest):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
            value = rest[1:i]
            text = rest[i + 1 :].strip()
            cmd.options[key] = [v.strip() for v in split_top_level(value)]
        else:
            m2 = re.match(r"(\"[^\"]*\"|'[^']*'|\S+)", rest)
            value = m2.group(1).strip("'\"")
            text = rest[m2.end() :].strip()
            if key == "format":
                if value not in FORMAT_VALUES:
                    raise OptionError(f"bad format value: {value}")
                cmd.options[key] = value
            elif key in ("limit",):
                cmd.options[key] = int(value)
            elif key in ("drop", "stat", "test", "pass_through"):
                cmd.options[key] = value.lower() == "true"
            else:
                cmd.options[key] = value

    if not cmd.statement:
        raise OptionError("sql command has no SELECT statement")
    return cmd
