"""Two-level sessionization (functions/sessionize.py) must reproduce
the one-window form row for row — including sessions that cross bucket
boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from edgelake_spark.catalog import register_sf_tables
from edgelake_spark.functions.sessionize import sessionize_bucketed

SF = "/root/testdata/sf0.01"

ONE_WINDOW = """
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
  min(ts) AS session_start, max(ts) AS session_end
FROM (
  SELECT user_id, ts, event_id,
    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
      CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
           THEN 1 ELSE 0 END AS is_new
    FROM (
      SELECT user_id, ts, event_id,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
  )
)
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def test_bucketed_equals_one_window_on_events(spark):
    register_sf_tables(spark, SF)
    expected = [tuple(r) for r in spark.sql(ONE_WINDOW).collect()]
    got = [
        tuple(r)
        for r in sessionize_bucketed(spark.table("events")).collect()
    ]
    assert got == expected
    assert len(got) > 100


def test_boundary_crossing_sessions_merge(spark):
    """Events straddling midnight within the gap must form ONE session;
    a later event in the same bucket starts a new one."""
    rows = [
        (1, "2024-01-01 23:50:00", 1),
        (1, "2024-01-02 00:10:00", 2),  # crosses midnight, gap 20m → same session
        (1, "2024-01-02 03:00:00", 3),  # new session
        (2, "2024-01-01 23:00:00", 4),  # other user: isolated session
        (2, "2024-01-03 00:00:00", 5),  # empty bucket between buckets
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_s string, event_id int").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_id"
    )
    out = [
        (r.user_id, r.session_id, r.n_events)
        for r in sessionize_bucketed(df).collect()
    ]
    assert out == [(1, 1, 2), (1, 2, 1), (2, 1, 1), (2, 2, 1)]
