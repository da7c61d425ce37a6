"""Unit tests for the as-of join tolerance semantics — the boundary
cases the sf0.01 gate data doesn't pin down: staleness EXACTLY equal to
the tolerance (inclusive), a right row at the left row's exact time
(matched, staleness 0), and no-match-at-all rows staying NULL."""

from datetime import datetime

from edgelake_spark.functions.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_tolerance_boundary_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # exactly tol after right
            (2, 10, _ts("2024-01-01T10:00:01")),  # 1 s past tol -> NULL
            (3, 20, _ts("2024-01-01T09:00:00")),  # right at same instant
            (4, 30, _ts("2024-01-01T09:30:00")),  # no right row at all
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:00:00"), 111.0),
            (20, _ts("2024-01-01T09:00:00"), 222.0),
        ],
        "user_id int, rt timestamp, val double",
    )
    out = {
        r.event_id: r.val
        for r in asof_join(
            left, right, on=["user_id"], left_time="ts", right_time="rt",
            value_cols=["val"], tolerance_seconds=3600,
        ).collect()
    }
    assert out[1] == 111.0  # staleness == tolerance is a match
    assert out[2] is None  # one second staler is not
    assert out[3] == 222.0  # equal times match (l.t >= r.t)
    assert out[4] is None  # left-outer semantics


def test_no_tolerance_keeps_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2030-01-01T00:00:00"))],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T00:00:00"), 5.0)],
        "user_id int, rt timestamp, val double",
    )
    got = asof_join(
        left, right, on=["user_id"], left_time="ts", right_time="rt",
        value_cols=["val"],
    ).collect()
    assert got[0].val == 5.0


def test_forward_direction(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T09:00:00")),  # right at same instant
            (2, 10, _ts("2024-01-01T08:00:00")),  # next right 1 h later
            (3, 10, _ts("2024-01-01T12:00:00")),  # nothing after -> NULL
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:00:00"), 1.0),
            (10, _ts("2024-01-01T11:00:00"), 2.0),
        ],
        "user_id int, rt timestamp, val double",
    )
    out = {
        r.event_id: r.val
        for r in asof_join(
            left, right, on=["user_id"], left_time="ts", right_time="rt",
            value_cols=["val"], direction="forward",
        ).collect()
    }
    assert out[1] == 1.0  # equal times match forward too
    assert out[2] == 1.0  # earliest following, not latest
    assert out[3] is None


def test_forward_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T08:00:00"))],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T11:00:00"), 2.0)],
        "user_id int, rt timestamp, val double",
    )
    got = asof_join(
        left, right, on=["user_id"], left_time="ts", right_time="rt",
        value_cols=["val"], direction="forward", tolerance_seconds=3600,
    ).collect()
    assert got[0].val is None  # 3 h lookahead exceeds the 1 h tolerance
