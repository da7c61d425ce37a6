"""Kafka wire protocol (edgelake_spark/streaming/kafka.py): codec
round trips, socket-level broker round trip, reset semantics, and the
full `run kafka consumer` topology over real Kafka framing.

Reference: edge_lake/api/al_kafka.py (kafka-python consumer),
member_cmd.py:21481 (`run kafka consumer`); wire format from the public
Kafka protocol guide."""

from __future__ import annotations

import json
import struct

import pytest

from edgelake_spark.streaming import kafka as kf
from edgelake_spark.streaming.broker import BrokerConsumer


# ------------------------------------------------------------- codec


def test_message_set_round_trip_with_crc():
    entries = [(0, 1700000000000, None, b'{"v": 1}'), (1, 1700000000001, b"k", b"two")]
    wire = kf.encode_message_set(entries)
    assert kf.decode_message_set(wire) == entries

    # CRC corruption is detected
    bad = bytearray(wire)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        kf.decode_message_set(bytes(bad))

    # a partial trailing message is tolerated (spec: broker truncates
    # at max_bytes) — the complete prefix still decodes
    assert kf.decode_message_set(wire[:-3]) == entries[:1]


def test_request_header_shape():
    req = kf.request(kf.API_FETCH, 2, 7, "cid", b"BODY")
    (length,) = struct.unpack(">i", req[:4])
    assert length == len(req) - 4
    api_key, api_version, corr = struct.unpack(">hhi", req[4:12])
    assert (api_key, api_version, corr) == (kf.API_FETCH, 2, 7)
    (cid_len,) = struct.unpack(">h", req[12:14])
    assert req[14 : 14 + cid_len] == b"cid"
    assert req[14 + cid_len :] == b"BODY"


# ------------------------------------------------- socket round trips


def test_produce_fetch_round_trip(tmp_path):
    broker = kf.KafkaBroker().start()
    try:
        pub = kf.KafkaProducerClient(broker.host, broker.port)
        base = pub.produce("t1", [b"one", b"two"])
        assert base == 0
        assert pub.produce("t1", [b"three"]) == 2

        received = []

        class Probe(kf.KafkaWireConsumer):
            def _spool(self, payload):
                received.append(payload)
                self.received += 1

        con = Probe(broker.host, broker.port, "t1", spool_dir=str(tmp_path / "a"), reset="earliest")
        con.start()
        assert con.wait_for(3)
        con.stop()
        assert received == [b"one", b"two", b"three"]

        # reset = latest (fresh group: no committed offset) skips the
        # backlog, sees only new records
        con2 = Probe(broker.host, broker.port, "t1", spool_dir=str(tmp_path / "b"), reset="latest")
        received.clear()
        con2.start()
        pub.produce("t1", [b"four"])
        assert con2.wait_for(1)
        con2.stop()
        assert received == [b"four"]
        pub.close()
    finally:
        broker.stop()


def test_consumer_resumes_from_committed_offset(tmp_path):
    """Kafka-group semantics: a committed offset wins over the reset
    policy, so a restarted consumer resumes instead of re-spooling the
    backlog (at-least-once: commit happens after spool)."""
    broker = kf.KafkaBroker().start()
    try:
        pub = kf.KafkaProducerClient(broker.host, broker.port)
        pub.produce("t1", [b"one", b"two"])
        spool = str(tmp_path / "spool")

        con = kf.KafkaWireConsumer(broker.host, broker.port, "t1", spool, reset="earliest")
        con.start()
        assert con.wait_for(2)
        con.stop()

        pub.produce("t1", [b"three"])
        con2 = kf.KafkaWireConsumer(broker.host, broker.port, "t1", spool, reset="earliest")
        con2.start()
        assert con2.wait_for(1)
        con2.stop()
        assert con2.received == 1  # only the new record, backlog not re-spooled
        # spool holds exactly 3 payload files (no duplicates)
        import os
        payloads = [f for f in os.listdir(spool) if not f.startswith(".")]
        assert len(payloads) == 3
        pub.close()
    finally:
        broker.stop()


def test_consumer_stale_offset_reapplies_reset(tmp_path):
    """A committed offset that outlived the log (topic recreated or
    truncated under the spool dir) must re-apply the reset policy like
    a real consumer, not kill the poll thread on OFFSET_OUT_OF_RANGE."""
    broker = kf.KafkaBroker().start()
    try:
        pub = kf.KafkaProducerClient(broker.host, broker.port)
        pub.produce("t1", [b"one", b"two", b"three"])
        spool = str(tmp_path / "spool")

        con = kf.KafkaWireConsumer(broker.host, broker.port, "t1", spool, reset="earliest")
        con.start()
        assert con.wait_for(3)
        con.stop()  # committed offset = 3

        # topic recreated shorter: committed 3 > log end 1
        broker.logs["t1"] = []
        pub.produce("t1", [b"fresh"])

        con2 = kf.KafkaWireConsumer(broker.host, broker.port, "t1", spool, reset="earliest")
        con2.start()
        assert con2.wait_for(1)  # fell back to earliest and re-fetched
        con2.stop()
        assert con2.received == 1 and con2.offset == 1
        pub.close()
    finally:
        broker.stop()


def test_api_versions_handshake():
    broker = kf.KafkaBroker().start()
    try:
        conn = kf._Conn(broker.host, broker.port, "probe")
        r = conn.call(kf.API_VERSIONS, 0, b"")
        assert r.i16() == 0  # no error
        supported = {r.i16(): (r.i16(), r.i16()) for _ in range(r.i32())}
        assert supported[kf.API_PRODUCE][1] >= 2
        assert supported[kf.API_FETCH][1] >= 2
        conn.close()
    finally:
        broker.stop()


# --------------------------------------------- full consumer topology


def test_run_kafka_consumer_end_to_end(spark, tmp_path):
    """Produce over real Kafka framing → wire consumer spool → text
    source → bring mapping → typed parquet append: the full reference
    topology of `run kafka consumer`, BrokerConsumer config unchanged
    (the transport slots in exactly like the MQTT subscriber)."""
    from edgelake_spark.engine import EdgeLakeEngine

    broker = kf.KafkaBroker().start()
    try:
        eng = EdgeLakeEngine(spark)
        df = eng.run(
            f"run kafka consumer where ip = {broker.host} and port = {broker.port} "
            "and reset = earliest and topic = (name = sensor and dbms = d and "
            'table = readings and column.ts.timestamp = "bring [timestamp]" and '
            'column.value.int = "bring [value]")'
        )
        assert df.collect()[0].bootstrap == f"{broker.host}:{broker.port}"
        cfg = eng.broker_consumers["sensor"]
        assert cfg["transport"] == "kafka"

        pub = kf.KafkaProducerClient(broker.host, broker.port)
        msgs = [
            {"timestamp": "2024-01-01 00:00:00", "value": 5},
            {"timestamp": "2024-01-01 00:01:00", "value": 9},
        ]
        pub.produce("sensor", [json.dumps(m) for m in msgs])
        pub.close()

        spool = tmp_path / "spool"
        consumer = BrokerConsumer(
            spark=spark,
            topic=cfg["topic"],
            bootstrap=f"{cfg['ip']}:{cfg['port']}",
            reset=cfg["reset"],
            source="kafka-wire",
            source_dir=str(spool),
        )
        stream = consumer.mapped_stream()  # starts the wire consumer
        assert consumer.kafka_client.wait_for(2)

        out = tmp_path / "landed"
        q = (
            stream.writeStream.option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(lambda b, _eid: b.write.mode("append").parquet(str(out)))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        consumer.kafka_client.stop()

        landed = spark.read.parquet(str(out))
        rows = sorted((r.ts.isoformat(), r.value) for r in landed.collect())
        assert rows == [("2024-01-01T00:00:00", 5), ("2024-01-01T00:01:00", 9)]
        assert dict(landed.dtypes)["value"] == "int"
    finally:
        broker.stop()


def test_format_kafka_connector_branch(spark, tmp_path):
    """The production `format("kafka")` branch (BrokerConsumer
    source='kafka') against the in-process wire broker. The container
    ships no spark-sql-kafka jar, so this SKIPS (never silently-greens)
    unless the connector class is on the JVM classpath — when it is,
    the exact readStream options the engine configures are exercised
    end-to-end."""
    from edgelake_spark.streaming.broker import kafka_connector_available

    if not kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the JVM classpath")

    broker = kf.KafkaBroker().start()
    try:
        pub = kf.KafkaProducerClient(broker.host, broker.port)
        msgs = [
            {"timestamp": "2024-01-01 00:00:00", "value": 5},
            {"timestamp": "2024-01-01 00:01:00", "value": 9},
        ]
        pub.produce("sensor", [json.dumps(m) for m in msgs])
        pub.close()

        from edgelake_spark.streaming.broker import TopicMapping

        consumer = BrokerConsumer(
            spark=spark,
            topic=TopicMapping(
                name="sensor",
                dbms="d",
                table="readings",
                columns={
                    "ts": ("timestamp", "[timestamp]"),
                    "value": ("int", "[value]"),
                },
            ),
            bootstrap=f"{broker.host}:{broker.port}",
            reset="earliest",
            source="kafka",
        )
        out = tmp_path / "landed"
        q = (
            consumer.mapped_stream()
            .writeStream.option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(lambda b, _eid: b.write.mode("append").parquet(str(out)))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        landed = spark.read.parquet(str(out))
        rows = sorted((r.ts.isoformat(), r.value) for r in landed.collect())
        assert rows == [("2024-01-01T00:00:00", 5), ("2024-01-01T00:01:00", 9)]
    finally:
        broker.stop()


def test_kafka_connector_detection_matches_reality(spark):
    """The classpath probe must agree with what format("kafka") actually
    does: when it reports False, building the kafka readStream raises
    the data-source-not-found error (so the branch test above skipped
    for the real reason, not vacuously); when True, the source loads."""
    from edgelake_spark.streaming.broker import kafka_connector_available

    available = kafka_connector_available(spark)
    try:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:1")
            .option("subscribe", "probe")
            .load()
        )
        loaded = True
    except Exception as exc:
        loaded = False
        assert "kafka" in str(exc).lower()
    assert available == loaded
