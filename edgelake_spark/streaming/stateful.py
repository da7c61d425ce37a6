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
