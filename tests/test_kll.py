"""Deterministic KLL quantile sketch: property bounds (the
test_sketch.py HLL/KMV discipline), merge associativity, bounded state,
and streaming replay parity against the pure-Python reference — the
quantile leg of the batch/streaming sketch matrix (HLL cardinality,
CMS frequency, KLL order statistics)."""

from __future__ import annotations

import bisect
import json
import random

import pytest
from pyspark.sql import types as T

from edgelake_spark.functions.sketch import KLL_K, KllSketch


def _rank_err(sketch: KllSketch, exact_sorted: list, q: float) -> float:
    # a tied value occupies the whole rank run [bisect_left, bisect_right);
    # the estimate's rank error is its distance to the NEAREST rank in
    # that run (with heavy ties, any single rank inside the run is a
    # correct answer for every quantile the run covers)
    est = sketch.quantile(q)
    lo = bisect.bisect_left(exact_sorted, est)
    hi = bisect.bisect_right(exact_sorted, est)
    target = q * len(exact_sorted)
    dist = 0.0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
    return dist / len(exact_sorted)


QS = [0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]


@pytest.mark.parametrize("seed", [7, 42, 1234])
@pytest.mark.parametrize("dist", ["gauss", "exp", "zipfish"])
def test_rank_error_bound(seed, dist):
    rnd = random.Random(seed)
    n = 30_000
    if dist == "gauss":
        vals = [rnd.gauss(0, 100) for _ in range(n)]
    elif dist == "exp":
        vals = [rnd.expovariate(0.01) for _ in range(n)]
    else:  # heavy repetition — sketches must survive ties
        vals = [float(int(rnd.paretovariate(1.2))) for _ in range(n)]
    sk = KllSketch()
    sk.extend(vals)
    sv = sorted(vals)
    worst = max(_rank_err(sk, sv, q) for q in QS)
    # k=200 targets ~1% rank error; 2.5% with margin across dists/seeds
    assert worst <= 0.025, f"worst rank error {worst:.4f}"
    assert sk.n == n


def test_state_is_bounded():
    sk = KllSketch()
    rnd = random.Random(0)
    checkpoints = []
    for i in range(200_000):
        sk.update(rnd.random())
        if i % 50_000 == 49_999:
            checkpoints.append(sk.size())
    # size plateaus instead of growing with n
    assert max(checkpoints) <= 3 * KLL_K
    assert checkpoints[-1] <= checkpoints[0] * 2


def test_merge_matches_bounds_and_counts():
    rnd = random.Random(5)
    a_vals = [rnd.gauss(50, 10) for _ in range(20_000)]
    b_vals = [rnd.gauss(-50, 10) for _ in range(20_000)]
    a, b = KllSketch(), KllSketch()
    a.extend(a_vals)
    b.extend(b_vals)
    a.merge(b)
    assert a.n == 40_000
    sv = sorted(a_vals + b_vals)
    worst = max(_rank_err(a, sv, q) for q in QS)
    assert worst <= 0.025
    # the bimodal gap: p50 sits between the modes
    assert -40 < a.quantile(0.5) < 40


def test_state_roundtrip_is_lossless():
    sk = KllSketch()
    sk.extend(float(i % 997) for i in range(10_000))
    back = KllSketch.from_state(*sk.to_state())
    assert back.n == sk.n and back.flips == sk.flips
    assert sorted(back.items()) == sorted(sk.items())
    # continuing after the round-trip equals never having serialized
    cont = KllSketch.from_state(*sk.to_state())
    more = [float(i) for i in range(500)]
    sk.extend(more)
    cont.extend(more)
    assert sorted(cont.items()) == sorted(sk.items())


def test_kll_stream_replay_matches_reference(spark, tmp_path):
    """Two micro-batches through the streaming monitor == the
    pure-Python sketch fed the same (sorted-per-batch) values: the
    deterministic-compaction guarantee, end-to-end through the state
    store; and the estimates sit within the rank bound of the exact
    percentiles of everything streamed."""
    from edgelake_spark.streaming.stateful import kll_stream

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rnd = random.Random(99)
    batch1 = [round(rnd.gauss(100, 25), 6) for _ in range(4_000)]
    batch2 = [round(rnd.expovariate(0.02), 6) for _ in range(4_000)]
    src = tmp_path / "ksrc"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"event_type": "t", "value": v}) for v in batch1)
    )
    out = kll_stream(
        spark.readStream.format("json").schema(schema).load(str(src)),
        "event_type",
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("kll_out")
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "b.json").write_text(
            "\n".join(json.dumps({"event_type": "t", "value": v}) for v in batch2)
        )
        q.processAllAvailable()
        rows = spark.sql(
            "select * from kll_out where n_rows = (select max(n_rows) from kll_out)"
        ).collect()
    finally:
        q.stop()
    assert len(rows) == 1
    got = rows[0]
    assert got.n_rows == 8_000 and got.sketch_size <= 3 * KLL_K

    ref = KllSketch()
    ref.extend(sorted(batch1))
    ref.extend(sorted(batch2))
    assert got.sketch_size == ref.size()
    assert (got.q50, got.q90, got.q99) == (
        ref.quantile(0.50),
        ref.quantile(0.90),
        ref.quantile(0.99),
    )
    sv = sorted(batch1 + batch2)
    for q_, est in ((0.5, got.q50), (0.9, got.q90), (0.99, got.q99)):
        r = bisect.bisect_left(sv, est)
        assert abs(r - q_ * len(sv)) / len(sv) <= 0.025


def test_kll_stream_state_survives_query_restart(spark, tmp_path):
    """Cross-restart twin of the replay test: stop the query after
    batch 1, start a NEW query instance from the same
    checkpointLocation, stream batch 2 — the restored sketch must end
    bit-identical to the never-restarted reference (KLL_STATE's
    (vals, wts, n, flips) round-trip through the state store, not just
    across triggers). Memory sink refuses recovery; foreachBatch is
    the recovery-capable sink."""
    from edgelake_spark.streaming.stateful import kll_stream

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rnd = random.Random(4242)
    batch1 = [round(rnd.gauss(50, 9), 6) for _ in range(3_000)]
    batch2 = [round(rnd.expovariate(0.05), 6) for _ in range(3_000)]
    src = tmp_path / "krsrc"
    src.mkdir()
    ckpt = str(tmp_path / "krckpt")
    rows: list = []

    def start():
        out = kll_stream(
            spark.readStream.format("json").schema(schema).load(str(src)),
            "event_type",
        )
        return (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda df, bid: rows.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .start()
        )

    (src / "a.json").write_text(
        "\n".join(json.dumps({"event_type": "t", "value": v}) for v in batch1)
    )
    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    (src / "b.json").write_text(
        "\n".join(json.dumps({"event_type": "t", "value": v}) for v in batch2)
    )
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = max(rows, key=lambda r: r.n_rows)
    ref = KllSketch()
    ref.extend(sorted(batch1))
    ref.extend(sorted(batch2))
    assert got.n_rows == 6_000
    assert got.sketch_size == ref.size()
    assert (got.q50, got.q90, got.q99) == (
        ref.quantile(0.50),
        ref.quantile(0.90),
        ref.quantile(0.99),
    )
