"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only stateful stream processing is the data-monitor ring
(node-local, in-memory). This module shows the scalable Spark idiom for
operators that need per-key state across micro-batches — state lives in
the state store, partitioned by key, surviving restarts via
checkpointing; no driver involvement.

``ewma`` — exponentially-weighted moving average per key: the classic
sensor-smoothing operator a Grafana panel would chart next to raw
values.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_rows bigint, last_value double, ewma double"
STATE_SCHEMA = "ewma double, n bigint"


def make_ewma_fn(alpha: float = 0.3, value_col: str = "value"):
    """Build the applyInPandasWithState function for a per-key EWMA."""

    def ewma(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            current, n = state.get
        else:
            current, n = None, 0
        last = None
        for pdf in batches:
            for v in pdf[value_col]:
                v = float(v)
                current = v if current is None else alpha * v + (1 - alpha) * current
                last = v
                n += 1
        state.update((current, n))
        yield pd.DataFrame(
            [{"key": key[0], "n_rows": n, "last_value": last, "ewma": current}]
        )

    return ewma


def ewma_stream(
    stream_df: DataFrame, key_col: str, value_col: str = "value", alpha: float = 0.3
) -> DataFrame:
    """Per-key EWMA over a stream; emits one row per key per batch with
    the running state. Attach .writeStream (update mode) to consume."""
    from pyspark.sql import functions as F

    # groupBy on a named column (not an inline alias expression) —
    # FlatMapGroupsInPandasWithState requires resolvable grouping attrs
    return (
        stream_df.withColumn("key", F.col(key_col).cast("string"))
        .groupBy("key")
        .applyInPandasWithState(
            make_ewma_fn(alpha, value_col),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------------ sessionization

SESSION_OUTPUT = (
    "user_id string, session_id bigint, n_events bigint, "
    "session_start timestamp, session_end timestamp"
)
#: per-key state: running session counter + open-session accumulator
#: (timestamps as epoch microseconds — bigints round-trip the state
#: store across engines/versions without timezone surprises)
SESSION_STATE = "session_id bigint, n bigint, start_us bigint, last_us bigint"


def make_session_fn(gap_minutes: int = 30, ts_col: str = "ts"):
    """Gap-based sessionizer for applyInPandasWithState: a session
    closes (and is EMITTED) when a new event arrives more than
    ``gap_minutes`` after the previous one; the open session stays in
    state across micro-batches. Matches the batch lag/cumsum form
    (queries._SESSIONIZE) for every closed session — the batch query's
    last session per user corresponds to the state still open here."""

    def sessions(key, batches, state) -> "Iterator[pd.DataFrame]":
        gap_us = gap_minutes * 60_000_000
        if state.exists:
            sid, n, start_us, last_us = state.get
        else:
            sid, n, start_us, last_us = 0, 0, None, None
        pdfs = [pdf for pdf in batches if len(pdf)]
        out = []
        if pdfs:
            rows = pd.concat(pdfs).sort_values(ts_col)
            for ts in rows[ts_col]:
                ts_us = int(pd.Timestamp(ts).value // 1_000)
                if last_us is not None and ts_us - last_us > gap_us:
                    out.append((key[0], sid, n, start_us, last_us))
                    sid, n, start_us = sid + 1, 0, ts_us
                if start_us is None:
                    start_us = ts_us
                n += 1
                last_us = ts_us
        state.update((sid, n, start_us, last_us))
        yield pd.DataFrame(
            [
                {
                    "user_id": u,
                    "session_id": s + 1,  # batch cumsum numbering starts at 1
                    "n_events": c,
                    "session_start": pd.Timestamp(st * 1_000),
                    "session_end": pd.Timestamp(en * 1_000),
                }
                for u, s, c, st, en in out
            ],
            columns=["user_id", "session_id", "n_events", "session_start", "session_end"],
        )

    return sessions


def session_stream(
    stream_df: DataFrame, key_col: str = "user_id", ts_col: str = "ts", gap_minutes: int = 30
) -> DataFrame:
    """Closed sessions per key over a stream (append semantics: a row is
    final once emitted). State is one small tuple per key in the state
    store — partitioned, checkpointed, no driver involvement."""
    from pyspark.sql import functions as F

    return (
        stream_df.withColumn("user_id", F.col(key_col).cast("string"))
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_minutes, ts_col),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------- streaming anomaly

ANOMALY_OUTPUT = (
    "key string, n_total bigint, mean double, std double, "
    "n_flagged bigint, last_flagged_value double"
)
#: Welford accumulators: count, running mean, M2 (sum of squared
#: deviations) — numerically stable one-pass variance, mergeable state
ANOMALY_STATE = "n bigint, mean double, m2 double"


def make_anomaly_fn(z_threshold: float = 3.0, value_col: str = "value", min_n: int = 30):
    """Per-key streaming z-score monitor: each value is scored against
    the state BEFORE it updates the state (a point can't vouch for
    itself), using Welford's one-pass mean/variance. Values only start
    flagging after ``min_n`` observations so cold keys don't alarm."""

    def anomaly(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        n_flagged, last_flagged = 0, None
        for pdf in batches:
            for v in pdf[value_col]:
                v = float(v)
                if n >= min_n:
                    var = m2 / n
                    if var > 0 and abs(v - mean) / math.sqrt(var) > z_threshold:
                        n_flagged += 1
                        last_flagged = v
                # Welford update AFTER scoring
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
        state.update((n, mean, m2))
        std = math.sqrt(m2 / n) if n else 0.0
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "n_total": n,
                    "mean": mean,
                    "std": std,
                    "n_flagged": n_flagged,
                    "last_flagged_value": last_flagged,
                }
            ]
        )

    return anomaly


def anomaly_stream(
    stream_df: DataFrame,
    key_col: str,
    value_col: str = "value",
    z_threshold: float = 3.0,
    min_n: int = 30,
) -> DataFrame:
    """Per-key streaming anomaly monitor (the alert half of the
    reference's data-monitor ring, data_monitor.py, as a stateful
    operator): emits per-batch flag counts against a cross-batch
    Welford state. State is three scalars per key — bounded at any
    stream length or key cardinality that fits a state store."""
    from pyspark.sql import functions as F

    return (
        stream_df.withColumn("key", F.col(key_col).cast("string"))
        .groupBy("key")
        .applyInPandasWithState(
            make_anomaly_fn(z_threshold, value_col, min_n),
            outputStructType=ANOMALY_OUTPUT,
            stateStructType=ANOMALY_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
