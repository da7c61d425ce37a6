"""Skew-handling utilities: salted joins and salted distinct counts.

At 100 TB a handful of hot keys (one device emitting 100× the events,
one dbms.table holding most rows) turn a shuffle join or a
count(distinct) into a single straggler task. AQE's skew-join splitting
(enabled in session.py) handles sort-merge joins after the fact; these
helpers pre-shape the plan when the skew is known:

- ``salted_join``: probe side gets a random salt in [0, buckets);
  build side is replicated once per salt value; the join key becomes
  (key, salt) so one hot key spreads over ``buckets`` tasks. The same
  move the reference cannot make — its per-operator fan-out
  (edge_lake/cmd/member_cmd.py:5330 partition_query) is fixed by node
  layout — but which a Spark cluster needs for hot-key joins.
- ``salted_distinct_count``: two-stage exact distinct — stage 1
  dedups (group, salt(value)) partitions, stage 2 merges partial
  distinct counts per group. Same result as count(distinct) with the
  single wide shuffle split in two balanced ones.

Salting uses ``pmod(hash(value), buckets)`` (deterministic, no RNG) so
results are reproducible and retries are safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    buckets: int = DEFAULT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side
    replicated ``buckets`` times.

    Use when the probe side has hot join keys and the build side is too
    big to broadcast but small enough to replicate ``buckets``× through
    a shuffle. Output columns = probe columns + build's non-key columns
    (same contract as ``probe.join(build, on, how)``).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(buckets))
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = p.join(b, on + ["__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Exact ``count(distinct value_col)`` per group via two balanced
    shuffles: dedup on (group, salt-of-value) first — each salt bucket
    holds a disjoint slice of the value space, so partial distinct
    counts add up exactly.

    Returns ``group_cols + [n_distinct]``.
    """
    salted = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.pmod(F.hash(F.col(value_col)), F.lit(buckets)).alias("__salt"),
    )
    partial = (
        salted.dropDuplicates(group_cols + ["__v"])
        .groupBy(*group_cols, "__salt")
        .agg(F.count("*").alias("__n"))
    )
    return (
        partial.groupBy(*group_cols)
        .agg(F.sum("__n").cast("bigint").alias("n_distinct"))
    )
