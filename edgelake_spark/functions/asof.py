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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the nearest right
    row with the same ``on`` keys: the latest with ``right_time <=
    left_time`` (``direction='backward'``, the default) or the earliest
    with ``right_time >= left_time`` (``'forward'`` — "next reading at
    or after t"). Left-outer: unmatched rows keep NULLs. Both equal-time
    cases match.

    ``tolerance_seconds`` bounds staleness (backward) / lookahead
    (forward): a match further than the tolerance is treated as no
    match (values NULL) — the "mark stale sensors missing" semantics.
    Implemented by carrying the matched right TIME alongside the values
    (same window, no extra shuffle) and null-gating on the exact
    integer-microsecond difference.

    ``right`` should be unique per (on, right_time) — pre-aggregate if
    not, or ties resolve arbitrarily (same as other engines).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    back = direction == "backward"
    left_cols = left.columns
    # side ordering puts the right row INSIDE the left row's frame at
    # equal times: right-before-left for the trailing frame, left-
    # before-right for the leading one
    l_side, r_side = (1, 0) if back else (0, 1)
    l = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(l_side))
    r = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(r_side).alias("__side"),
        F.col(right_time).alias("__rt"),
        *value_cols,
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = Window.partitionBy(*on).orderBy("__t", "__side")
    w = (
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if back
        else w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pick = (lambda c: F.last(c, ignorenulls=True)) if back else (
        lambda c: F.first(c, ignorenulls=True)
    )
    carry = list(value_cols) + (["__rt"] if tolerance_seconds is not None else [])
    for c in carry:
        u = u.withColumn(c, pick(c).over(w))
    out = u.filter(F.col("__side") == l_side)
    if tolerance_seconds is not None:
        gap = F.unix_micros(F.col("__rt")) - F.unix_micros(F.col("__t"))
        if back:
            gap = -gap
        for c in value_cols:
            out = out.withColumn(
                c, F.when(gap <= F.lit(tolerance_seconds * 1_000_000), F.col(c))
            )
    return out.select(*left_cols, *value_cols)
