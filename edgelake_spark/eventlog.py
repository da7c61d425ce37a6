"""Node event/error log rings.

Mirrors the reference's in-memory process logs
(edge_lake/generic/process_log.py:21-231): fixed-size ring buffers per
log (event=100 entries; error/file/query/streaming=20), one global
monotonically increasing entry id, consecutive-duplicate folding (the
same message from the same thread bumps a Count instead of appending —
process_log.py:46-51), and keyword filtering over the Type and Text
fields on display (show_events, process_log.py:137-191).

Engine surface: ``get event log [where <keys>]``, ``get error log``,
``reset event log`` / ``reset error log`` (member_cmd.py command tree).
Driver-side state, like the reference — log rings are node diagnostics,
not data-path state, so a plain thread-safe Python structure is the
right tool (no Spark jobs involved).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

LOG_SIZES = {
    "event": 100,
    "error": 20,
    "file": 20,
    "query": 20,
    "streaming": 20,
}

#: info types that ALSO copy into a secondary log (reference
#: get_log_id: "Error" events mirror into the error log)
_SECONDARY = {"error": "error", "file": "file", "query": "query", "streaming": "streaming"}


@dataclass
class _Entry:
    id: int
    count: int
    thread: str
    ts: str
    info_type: str
    text: str


@dataclass
class EventLog:
    """All node log rings plus the shared id counter."""

    clock: object = time.ctime
    _rings: dict = field(default_factory=dict)
    _id: int = 0
    _mutex: threading.Lock = field(default_factory=threading.Lock)

    def _ring(self, name: str) -> list:
        return self._rings.setdefault(name, [])

    def add(self, info_type: str, text: str) -> None:
        """Append to the event log; Error/File/Query/Streaming types
        mirror into their secondary ring (reference process_log.add)."""
        if not isinstance(info_type, str) or not isinstance(text, str):
            info_type, text = "Error", "Non string object is added to log"
        thread = threading.current_thread().name
        ts = self.clock()
        with self._mutex:
            ring = self._ring("event")
            if ring and ring[-1].text == text and ring[-1].info_type == info_type \
                    and ring[-1].thread == thread:
                ring[-1].count += 1
                ring[-1].ts = ts
                return
            self._id += 1
            entry = _Entry(self._id, 1, thread, ts, info_type, text)
            self._append("event", entry)
            sec = _SECONDARY.get(info_type.lower())
            if sec:
                self._append(sec, _Entry(self._id, 1, thread, ts, info_type, text))

    def _append(self, name: str, entry: _Entry) -> None:
        ring = self._ring(name)
        ring.append(entry)
        limit = LOG_SIZES.get(name, 20)
        if len(ring) > limit:
            del ring[0 : len(ring) - limit]

    def show(self, name: str, keys: list[str] | None = None) -> list[tuple]:
        """Oldest-first entries, optionally keyword-filtered against the
        Type and Text fields (case-insensitive substring, any-match)."""
        with self._mutex:
            entries = list(self._ring(name))
        rows = []
        for e in entries:
            if keys:
                hay_t, hay_x = e.info_type.lower(), e.text.lower()
                if not any(k.lower() in hay_t or k.lower() in hay_x for k in keys):
                    continue
            rows.append((e.id, e.count, e.thread, e.ts, e.info_type, e.text))
        return rows

    def reset(self, name: str) -> int:
        with self._mutex:
            n = len(self._ring(name))
            self._rings[name] = []
        return n
