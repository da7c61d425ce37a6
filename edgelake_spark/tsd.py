"""TSD provenance — the reference's `time file` surface.

Reference behavior (edge_lake/cmd/member_cmd.py:18540 _time_file_methods;
edge_lake/dbms/db_info.py:1614 tsd_insert_entry; file naming convention
edge_lake/generic/utils_io.py:2453):

* every ingested source file is tracked in a per-source TSD table
  (``tsd_<member id>``) — file name, hash, row count, status fields;
* file names carry the metadata:
  ``[dbms].[table].[source].[hash].[instructions].[YYMMDDHHMMSS].json``;
* ``time file rename <path> to dbms = .. and table = ..`` converts an
  arbitrary file into the convention (hash defaults to the content
  md5); ``new``/``add`` register an entry parsed from the name (add
  validates the file exists); ``update <hash> [s1] [s2]`` edits the
  status fields; ``delete <row id> from <tsd table>`` and
  ``drop all/<table>`` remove entries.

These entries are what the ``tsd_name``/``tsd_id`` system columns
stamped by the ingest layer (ingest/infer.py rows_to_dataframe) point
back to — row-level lineage from any query result to the source file.
The reference's replication/HA uses of TSD are out of scope per
SURVEY.md §2.10; the local bookkeeping half lives here.
"""

from __future__ import annotations

import hashlib
import os
import re
from dataclasses import dataclass, field
from datetime import datetime


@dataclass
class TsdEntry:
    table: str  # tsd_<source>
    row_id: int
    dbms: str
    table_name: str
    source: str
    hash: str
    instructions: str
    file_time: str  # YYMMDDHHMMSS from the name
    file_name: str
    status1: str = ""
    status2: str = ""


_NAME_RE = re.compile(
    r"^(?P<dbms>[^.]+)\.(?P<table>[^.]+)\.(?P<source>[^.]+)\.(?P<hash>[^.]+)"
    r"\.(?P<instructions>[^.]+)\.(?P<time>\d{12})\.json$"
)


@dataclass
class TsdStore:
    entries: list[TsdEntry] = field(default_factory=list)
    _next_id: dict[str, int] = field(default_factory=dict)

    # ------------------------------------------------------------ write

    def register(self, file_name: str, status1: str = "", status2: str = "") -> TsdEntry:
        base = os.path.basename(file_name)
        m = _NAME_RE.match(base)
        if not m:
            raise ValueError(
                "time file: name does not follow the convention "
                "[dbms].[table].[source].[hash].[instructions].[YYMMDDHHMMSS].json: "
                + base
            )
        table = f"tsd_{m.group('source')}"
        rid = self._next_id.get(table, 1)
        self._next_id[table] = rid + 1
        entry = TsdEntry(
            table=table,
            row_id=rid,
            dbms=m.group("dbms"),
            table_name=m.group("table"),
            source=m.group("source"),
            hash=m.group("hash"),
            instructions=m.group("instructions"),
            file_time=m.group("time"),
            file_name=base,
            status1=status1,
            status2=status2,
        )
        self.entries.append(entry)
        return entry

    def update(self, hash_value: str, status1: str | None, status2: str | None) -> int:
        n = 0
        for e in self.entries:
            if e.hash == hash_value:
                if status1 is not None:
                    e.status1 = status1
                if status2 is not None:
                    e.status2 = status2
                n += 1
        return n

    def delete(self, row_id: int, table: str) -> int:
        before = len(self.entries)
        self.entries = [
            e for e in self.entries if not (e.table == table and e.row_id == row_id)
        ]
        return before - len(self.entries)

    def drop(self, what: str) -> int:
        before = len(self.entries)
        if what == "all":
            self.entries = []
            self._next_id = {}
        else:
            self.entries = [e for e in self.entries if e.table != what]
            self._next_id.pop(what, None)
        return before - len(self.entries)


def rename_to_convention(
    path: str,
    dbms: str,
    table: str,
    source: str = "0",
    hash_value: str | None = None,
    instructions: str = "0",
    now: datetime | None = None,
) -> str:
    """`time file rename <path> to dbms = .. and table = ..`: move the
    file to the convention name in the same directory; the hash
    defaults to the content md5 (the reference hashes the file to make
    delivery idempotent)."""
    if hash_value is None:
        with open(path, "rb") as fh:
            hash_value = hashlib.md5(fh.read()).hexdigest()
    stamp = (now or datetime.now()).strftime("%y%m%d%H%M%S")
    new_name = f"{dbms}.{table}.{source}.{hash_value}.{instructions}.{stamp}.json"
    new_path = os.path.join(os.path.dirname(path) or ".", new_name)
    os.rename(path, new_path)
    return new_path
