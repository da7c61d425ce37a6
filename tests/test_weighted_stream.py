"""Streaming weighted sample (ES reservoir) — replay parity with the
batch doc_weighted_sample gate.

The reservoir invariant under test: after streaming the WHOLE corpus in
micro-batches (weight arriving as a column computed by the same SQL
expression the batch gate uses), each stratum's reservoir equals the
batch gate's top-10 — incremental top-k-of-union over ES keys is a
weighted sample without replacement of everything seen, with k-bounded
state."""

import json

from tests.conftest import SF_DIR


def test_stream_reservoir_matches_batch_gate(spark, tmp_path):
    from pyspark.sql import types as T

    from edgelake_spark.catalog import register_sf_tables
    from edgelake_spark.functions import text as tx
    from edgelake_spark.queries import SPARK_QUERIES
    from edgelake_spark.streaming.stateful import weighted_sample_stream

    expected = [
        (r.lang, r.samp_rank, r.doc_id, r.weight)
        for r in SPARK_QUERIES["doc_weighted_sample"](spark, SF_DIR).collect()
    ]
    assert len(expected) == 50  # 5 langs x 10 slots

    # weight computed upstream by the SAME SQL expression as the gate
    register_sf_tables(spark, SF_DIR)
    feed = spark.sql(
        f"SELECT doc_id, lang, {tx.spark_quality_score('text')} AS weight "
        "FROM documents"
    ).collect()

    # two REAL micro-batches: the second file lands only after the
    # first trigger completes, so the state-restore branch
    # (state.exists → array round-trip + merge + re-sort against prior
    # entries) executes — a single pre-populated directory would fold
    # both files into one trigger and never restore state
    src = tmp_path / "wsrc"
    src.mkdir()

    def write(tag, batch):
        (src / f"{tag}.json").write_text(
            "\n".join(
                json.dumps(
                    {"doc_id": r.doc_id, "lang": r.lang, "weight": r.weight}
                )
                for r in batch
            )
        )

    write("a", [r for r in feed if r.doc_id % 2 == 0])

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("weight", T.DoubleType()),
        ]
    )
    out = weighted_sample_stream(
        spark.readStream.format("json").schema(schema).load(str(src)),
        key_col="lang",
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("wsamp_out")
        .start()
    )
    try:
        q.processAllAvailable()
        write("b", [r for r in feed if r.doc_id % 2 == 1])
        q.processAllAvailable()
    finally:
        q.stop()

    final = spark.sql(
        """
        SELECT key, samp_rank, doc_id, weight FROM wsamp_out w
        WHERE n_seen = (SELECT max(n_seen) FROM wsamp_out x WHERE x.key = w.key)
        ORDER BY key, samp_rank
        """
    ).collect()
    got = [(r.key, r.samp_rank, r.doc_id, r.weight) for r in final]
    assert got == expected

    # state/output boundedness: exactly k rows per stratum in the final
    # reservoir however many docs streamed past
    per_key = {}
    for k_, *_ in got:
        per_key[k_] = per_key.get(k_, 0) + 1
    assert set(per_key.values()) == {10}


def test_stream_reservoir_survives_query_restart(spark, tmp_path):
    """The docstring claim 'checkpointed state store' made real: STOP
    the query after batch 1, start a NEW query instance from the same
    checkpointLocation, stream batch 2 — the restored reservoir must
    finish exactly where a never-restarted stream does (the batch
    gate's top-10). Pins WSAMP_STATE's array round-trip through the
    state store across query instances, not just across triggers."""
    import json as _json

    from pyspark.sql import types as T

    from edgelake_spark.catalog import register_sf_tables
    from edgelake_spark.functions import text as tx
    from edgelake_spark.queries import SPARK_QUERIES
    from edgelake_spark.streaming.stateful import weighted_sample_stream

    expected = [
        (r.lang, r.samp_rank, r.doc_id, r.weight)
        for r in SPARK_QUERIES["doc_weighted_sample"](spark, SF_DIR).collect()
    ]
    register_sf_tables(spark, SF_DIR)
    feed = spark.sql(
        f"SELECT doc_id, lang, {tx.spark_quality_score('text')} AS weight "
        "FROM documents"
    ).collect()

    src = tmp_path / "rsrc"
    src.mkdir()
    ckpt = str(tmp_path / "rckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("weight", T.DoubleType()),
        ]
    )

    def write(tag, batch):
        (src / f"{tag}.json").write_text(
            "\n".join(
                _json.dumps({"doc_id": r.doc_id, "lang": r.lang, "weight": r.weight})
                for r in batch
            )
        )

    # the memory sink refuses checkpoint recovery; foreachBatch is the
    # recovery-capable sink, capturing each emission driver-side
    emissions: list[tuple[int, list]] = []

    def start():
        out = weighted_sample_stream(
            spark.readStream.format("json").schema(schema).load(str(src)),
            key_col="lang",
        )

        def capture(df, batch_id):
            emissions.append((batch_id, df.collect()))

        return (
            out.writeStream.outputMode("update")
            .foreachBatch(capture)
            .option("checkpointLocation", ckpt)
            .start()
        )

    write("a", [r for r in feed if r.doc_id % 2 == 0])
    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    write("b", [r for r in feed if r.doc_id % 2 == 1])
    q2 = start()  # NEW query instance, state restored from ckpt
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    last = max(emissions, key=lambda e: e[0])[1]
    got = sorted((r.key, r.samp_rank, r.doc_id, r.weight) for r in last)
    assert got == sorted(expected)
    # and the restored run really did see BOTH halves per stratum
    assert {r.n_seen for r in last} == {
        sum(1 for f in feed if f.lang == lang) for lang in {r.key for r in last}
    }
