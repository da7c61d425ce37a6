"""Materialization barrier with a cluster-reliable mode.

The engine truncates lineage at explode-discipline and iterative sites
(``queries._ckpt_view``, connected components' label rounds, the PCA
covariance table, …). ``DataFrame.localCheckpoint()`` is the right
primitive on ``local[*]``: eager, zero-copy to executor block storage.
But local checkpoints are NON-RELIABLE storage — on a real cluster an
executor loss destroys the truncated lineage and kills the job, which
at 100 TB (thousand-executor fleets, preemptible nodes) is a
when-not-if event.

``materialize(df)`` is the single switch point: by default it calls
``localCheckpoint()``; with ``spark.edgelake.checkpoint.reliable=true``
(runtime conf, settable per-session) or ``SPARK_GRAFT_RELIABLE_CKPT=1``
it calls ``df.checkpoint()`` — Spark's reliable checkpoint, which
writes the materialized partitions to the checkpoint directory
(HDFS / object store on a cluster; ``spark.edgelake.checkpoint.dir``
or a session temp dir here) so recomputation after executor loss reads
files instead of replaying dead lineage.

Both modes are EAGER and return a DataFrame whose plan is a checkpoint
scan, so downstream plans are identical in shape — only the storage
substrate of the barrier differs (verified by
tests/test_reliable_ckpt.py, which runs the checkpoint-heavy gate
families in reliable mode against the same DuckDB oracles).

Reference parity note: EdgeLake's operator loop persists every
intermediate to its local database before serving queries
(edge_lake/dbms/db_info.py insert path), so durability-of-intermediates
is the reference behavior; local[*] testing just makes the durable path
opt-in.
"""

from __future__ import annotations

import os
import tempfile

_RELIABLE_CONF = "spark.edgelake.checkpoint.reliable"
_DIR_CONF = "spark.edgelake.checkpoint.dir"


_FALSY = ("", "0", "false", "no", "off")


def reliable_enabled(spark) -> bool:
    env = os.environ.get("SPARK_GRAFT_RELIABLE_CKPT", "").lower()
    if env not in _FALSY:
        return True
    return spark.conf.get(_RELIABLE_CONF, "false").lower() == "true"


def ensure_checkpoint_dir(spark) -> str:
    """Set the SparkContext checkpoint dir once per session (reliable
    checkpoints require it). Order: explicit conf, env, session temp."""
    sc = spark.sparkContext
    current = sc._jsc.sc().getCheckpointDir()
    if current.isDefined():
        return current.get()
    target = (
        spark.conf.get(_DIR_CONF, "")
        or os.environ.get("SPARK_GRAFT_CKPT_DIR", "")
        or tempfile.mkdtemp(prefix="edgelake-ckpt-")
    )
    sc.setCheckpointDir(target)
    return target


def materialize(df):
    """Eager lineage-truncation barrier: localCheckpoint on local[*],
    reliable ``df.checkpoint()`` when the session opts in (cluster
    mode). Plan shape downstream is identical either way."""
    spark = df.sparkSession
    if reliable_enabled(spark):
        ensure_checkpoint_dir(spark)
        return df.checkpoint(eager=True)
    return df.localCheckpoint()
