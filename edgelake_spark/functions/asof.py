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

    The matched row travels as ONE struct (right_time + values) carried
    by a single last/first(ignorenulls) window, so the staleness gate
    and every projected value always come from the SAME right row —
    matching ASOF semantics when right-side values contain NULLs (an
    in-tolerance row with a NULL value yields NULL, never an older
    row's value).

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
        # one struct per right row: non-NULL exactly for right rows, so
        # a single ignorenulls carry keeps time+values row-atomic
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c) for c in value_cols],
        ).alias("__m"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = Window.partitionBy(*on).orderBy("__t", "__side")
    w = (
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if back
        else w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pick = F.last if back else F.first
    u = u.withColumn("__m", pick("__m", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == l_side)
    m = F.col("__m")
    if tolerance_seconds is not None:
        gap = F.unix_micros(m["__rt"]) - F.unix_micros(F.col("__t"))
        if back:
            gap = -gap
        m = F.when(gap <= F.lit(tolerance_seconds * 1_000_000), F.col("__m"))
    return out.select(*left_cols, *[m[c].alias(c) for c in value_cols])
