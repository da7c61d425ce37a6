"""Two-level (bucketed) gap sessionization — the SCALE.md round-4/5
experiment for the window family.

The plain sessionizer (queries._SESSIONIZE) runs ONE window per user:
``lag``/``cumsum`` over (user_id ORDER BY ts) — an n·log n per-key sort
that tracked 8.6× per 10× data on fixed cores at sf1. This variant
splits the sort: sessionize within (user_id, coarse time bucket) —
bucket span ≫ gap — then stitch sessions that cross bucket boundaries
with a second window over the per-(user, bucket) SUMMARY table, which
is smaller than the event table by the average bucket occupancy.

Correctness: a session crosses a bucket boundary iff the first event
of bucket B is within ``gap`` of the last event of bucket B-1 (events
between them would be in one of the buckets). The stitch window
computes, per (user, bucket), a global session-id offset =
running total of local sessions minus merged boundaries; boundary-
merged sessions then collapse in the final (user, global_sid) groupBy,
whose min/max/count recompose the session exactly.

Scale shape: the heavy window sorts (user, day) partitions — bounded
by a day's events per user regardless of stream length — and the
stitch window sorts the tiny summary table. Same output as the
one-window form (asserted row-for-row in tests/test_sessionize_bucketed
and against the DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_bucketed(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
    bucket: str = "day",
) -> DataFrame:
    """Same output schema as the one-window sessionizer:
    (user_id, session_id, n_events, session_start, session_end)."""
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTE")
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(order_tiebreak).alias("tb"),
    ).withColumn("bkt", F.date_trunc(bucket, F.col("ts")))

    # level 1: sessionize WITHIN (user, bucket) — the bounded sort
    w_in = Window.partitionBy("user_id", "bkt").orderBy("ts", "tb")
    local = (
        e.withColumn("prev_ts", F.lag("ts").over(w_in))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ts").isNull() | (F.col("ts") > F.col("prev_ts") + gap), 1
            ).otherwise(0),
        )
        .withColumn(
            "local_sid",
            F.sum("is_new").over(w_in.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )

    # per-(user, bucket) summary: tiny relative to the event table
    summary = local.groupBy("user_id", "bkt").agg(
        F.max("local_sid").alias("n_local"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )

    # level 2: stitch across buckets — window over the summary only
    w_b = Window.partitionBy("user_id").orderBy("bkt")
    stitched = (
        summary.withColumn("prev_last", F.lag("last_ts").over(w_b))
        .withColumn(
            "merge_prev",
            (
                F.col("prev_last").isNotNull()
                & (F.col("first_ts") <= F.col("prev_last") + gap)
            ).cast("int"),
        )
        .withColumn(
            "sid_offset",
            F.coalesce(
                F.sum(F.col("n_local") - F.col("merge_prev")).over(
                    w_b.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            - F.col("merge_prev"),
        )
        .select("user_id", "bkt", "merge_prev", "sid_offset")
    )

    # global session id; boundary-merged local session 1 inherits the
    # previous bucket's closing id via the -merge_prev in the offset
    glob = local.join(stitched, ["user_id", "bkt"]).withColumn(
        "session_id", (F.col("local_sid") + F.col("sid_offset")).cast("bigint")
    )
    return (
        glob.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )
