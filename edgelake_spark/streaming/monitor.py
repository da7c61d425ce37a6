"""Data monitor: ring buffer of tumbling-interval stats + alerts.

Reference: ``data monitor where dbms = D and table = T and intervals = N
and time = 1 minute and time_column = ts and value_column = v`` keeps N
intervals × {min, max, sum, count}; intervals are ARRIVAL-time sliced
(interval id = elapsed/interval_len — edge_lake/cmd/data_monitor.py:
16-20, 320-396), and ``set alert where ... min < 10`` raises on
interval stats.

Spark mapping: updated from foreachBatch per micro-batch. The per-batch
reduction (min/max/sum/count) runs as a JVM aggregation; only the tiny
4-number merge into the ring is Python — the faithful equivalent of the
reference's in-memory node-local ring, and O(1) state regardless of
stream volume.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class _Interval:
    id: int = -1
    min: float = 0.0
    max: float = 0.0
    sum: float = 0.0
    count: int = 0


@dataclass
class Alert:
    stat: str  # min | max | avg | count
    op: str  # '<' or '>'
    value: float

    def check(self, interval: _Interval) -> bool:
        if interval.count == 0:
            return False
        stat = {
            "min": interval.min,
            "max": interval.max,
            "avg": interval.sum / interval.count,
            "count": float(interval.count),
        }[self.stat]
        return stat < self.value if self.op == "<" else stat > self.value


class DataMonitor:
    """N-interval ring of {min,max,sum,count} for one table's value
    column, arrival-time sliced like the reference."""

    def __init__(
        self,
        value_column: str = "value",
        intervals: int = 10,
        interval_seconds: int = 60,
        clock=time.time,
    ):
        self.value_column = value_column
        self.n = intervals
        self.interval_seconds = interval_seconds
        self.clock = clock
        self.start_time = int(clock())
        self.ring = [_Interval() for _ in range(intervals)]
        self.current = 0
        self.alerts: list[Alert] = []
        self.alert_log: list[tuple[int, Alert]] = []

    # ---------------------------------------------------------- updates

    def _interval_id(self) -> int:
        return int((int(self.clock()) - self.start_time) / self.interval_seconds)

    def process_batch(self, batch_df: DataFrame) -> None:
        """foreachBatch hook: fold one micro-batch into the ring."""
        agg = batch_df.agg(
            F.min(self.value_column).alias("mn"),
            F.max(self.value_column).alias("mx"),
            F.sum(self.value_column).alias("sm"),
            F.count(self.value_column).alias("ct"),
        ).collect()[0]
        if not agg.ct:
            return
        self._merge(float(agg.mn), float(agg.mx), float(agg.sm), int(agg.ct))

    def add_values(self, values: list[float]) -> None:
        if values:
            self._merge(min(values), max(values), sum(values), len(values))

    def _merge(self, mn: float, mx: float, sm: float, ct: int) -> None:
        interval_id = self._interval_id()
        slot = self.ring[self.current]
        if slot.id != interval_id:
            # advance the ring, resetting the reused slot
            # (reference data_monitor.py:333-345)
            self.current = (self.current + 1) % self.n
            slot = self.ring[self.current]
            slot.id, slot.min, slot.max, slot.sum, slot.count = interval_id, mn, mx, sm, ct
        else:
            slot.min = min(slot.min, mn)
            slot.max = max(slot.max, mx)
            slot.sum += sm
            slot.count += ct
        for alert in self.alerts:
            if alert.check(slot):
                self.alert_log.append((interval_id, alert))

    # ----------------------------------------------------------- output

    def set_alert(self, stat: str, op: str, value: float) -> None:
        self.alerts.append(Alert(stat=stat, op=op, value=value))

    def snapshot(self) -> list[dict]:
        """`get data monitored` — the ring's populated intervals, oldest
        first."""
        out = []
        order = list(range(self.current + 1, self.n)) + list(range(self.current + 1))
        for i in order:
            s = self.ring[i]
            if s.id >= 0:
                out.append(
                    {
                        "interval": s.id,
                        "min": s.min,
                        "max": s.max,
                        "sum": s.sum,
                        "count": s.count,
                        "avg": s.sum / s.count if s.count else 0.0,
                    }
                )
        return out
