"""Streaming conditions: per-batch rules on ingested rows.

Reference: ``set streaming condition where dbms = D and table = T if
[col] > v then <command>`` — evaluated against every incoming batch;
``then ignore entry`` drops matching rows, anything else fires a
side-effect (alert/command), optionally capped by ``limit``
(edge_lake/generic/streaming_conditions.py:31-113, apply :291).

Spark mapping: the predicate is a Column expression; inside
``foreachBatch`` matching rows are either filtered out (ignore) or
counted + handed to a callback. The filter is JVM-side; only the
callback (alerting) touches Python, on the matched subset.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IF_RE = re.compile(
    r"if\s+\[(?P<col>\w+)\]\s*(?P<op>==|=|!=|>=|<=|>|<)\s*(?P<value>\S+)\s+then\s+(?P<action>.+)",
    re.IGNORECASE,
)

_OPS = {
    "=": "==",
    "==": "==",
    "!=": "!=",
    ">": ">",
    ">=": ">=",
    "<": "<",
    "<=": "<=",
}


@dataclass
class StreamingCondition:
    column: str
    op: str
    value: str
    action: str  # 'ignore entry' or a command/callback name
    limit: int = 0  # cap on action executions (reference `limit =`)
    fired: int = 0

    @classmethod
    def parse(cls, text: str, limit: int = 0) -> "StreamingCondition":
        m = _IF_RE.search(text)
        if not m:
            raise ValueError(f"cannot parse streaming condition: {text}")
        return cls(
            column=m.group("col"),
            op=_OPS[m.group("op")],
            value=m.group("value").strip("'\""),
            action=m.group("action").strip(),
            limit=limit,
        )

    def predicate(self) -> F.Column:
        col = F.col(self.column)
        try:
            value = float(self.value)
        except ValueError:
            value = self.value
        return {
            "==": col == value,
            "!=": col != value,
            ">": col > value,
            ">=": col >= value,
            "<": col < value,
            "<=": col <= value,
        }[self.op]

    @property
    def is_ignore(self) -> bool:
        return self.action.lower().startswith("ignore")


def apply_conditions(
    batch_df: DataFrame,
    conditions: list[StreamingCondition],
    on_action: Callable[[StreamingCondition, int], None] | None = None,
) -> DataFrame:
    """Apply all conditions to one micro-batch; returns the surviving
    rows. Non-ignore actions fire ``on_action(condition, match_count)``
    unless their limit is exhausted."""
    out = batch_df
    for cond in conditions:
        pred = cond.predicate()
        if cond.is_ignore:
            out = out.filter(~pred)
        elif on_action is not None and (cond.limit == 0 or cond.fired < cond.limit):
            n = batch_df.filter(pred).count()
            if n:
                cond.fired += 1
                on_action(cond, n)
    return out
