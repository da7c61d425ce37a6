"""Distributed as-of join (the timeseries "latest value at or before t").

Spark has no ASOF JOIN operator; the scale-correct composition is the
union-and-carry idiom: tag both sides, union by (key, time), and carry
the most recent right-side values forward with a running
``last(ignorenulls)`` window — ONE shuffle on the key, a per-key sort,
zero pairwise work. (A naive range join is O(|L|·|R|) per key;
per-pair inequality joins don't scale.) DuckDB's native ASOF JOIN
serves as the oracle for the gate query.

Tie semantics: a right row at exactly the left row's time IS matched
(right sorts before left at equal times), matching ``l.t >= r.t``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the latest right
    row with the same ``on`` keys and ``right_time <= left_time``
    (backward as-of, left-outer: unmatched rows keep NULLs).

    ``tolerance_seconds`` bounds staleness: a match older than the
    tolerance is treated as no match (values NULL) — the "mark stale
    sensors missing" semantics. Implemented by carrying the matched
    right TIME alongside the values (same window, no extra shuffle)
    and null-gating on the exact integer-microsecond difference.

    ``right`` should be unique per (on, right_time) — pre-aggregate if
    not, or ties resolve arbitrarily (same as other engines).
    """
    left_cols = left.columns
    l = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    r = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_time).alias("__rt"),
        *value_cols,
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = list(value_cols) + (["__rt"] if tolerance_seconds is not None else [])
    for c in carry:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        fresh = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__rt")) <= F.lit(
            tolerance_seconds * 1_000_000
        )
        for c in value_cols:
            out = out.withColumn(c, F.when(fresh, F.col(c)))
    return out.select(*left_cols, *value_cols)
