"""Mapping policies, partitioned writes, multimodal plumbing."""

import json

from pyspark.sql import functions as F

from edgelake_spark.ingest.mapping import apply_mapping_policy, parse_bring_path
from edgelake_spark.ingest.partitions import (
    PARTITION_COL,
    drop_partitions_before,
    read_partitioned,
    write_partitioned,
)
from edgelake_spark.functions.multimodal import extract_features, store_blobs


def test_parse_bring_path():
    assert parse_bring_path("[readings][][value]") == ["readings", "", "value"]
    assert parse_bring_path("[device]") == ["device"]


def test_apply_mapping_policy_explodes_readings(spark):
    policy = {
        "mapping": {
            "id": "m1",
            "dbms": "d",
            "table": "t",
            "schema": {
                "device": {"type": "varchar", "bring": "[device]"},
                "ts": {"type": "timestamp", "bring": "[readings][][ts]"},
                "value": {"type": "float", "bring": "[readings][][value]"},
                "site": {"type": "varchar", "default": "main"},
                "__script__": {"type": "varchar"},  # ignored dummy column
            },
        }
    }
    payload = {
        "device": "plc-1",
        "readings": [
            {"ts": "2024-01-01 10:00:00", "value": 1.5},
            {"ts": "2024-01-01 10:00:10", "value": 2.5},
        ],
    }
    raw = spark.createDataFrame([(json.dumps(payload),)], "value string")
    out = apply_mapping_policy(spark, raw, policy)
    assert out.columns == ["device", "ts", "value", "site"]
    rows = out.orderBy("ts").collect()
    assert len(rows) == 2
    assert rows[0].device == "plc-1" and rows[0].value == 1.5 and rows[0].site == "main"
    assert rows[1].ts.second == 10


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", 1.0),
            ("2024-01-05 10:00:00", 2.0),
            ("2024-02-10 10:00:00", 3.0),
        ],
        "ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "t")
    write_partitioned(df, path, "ts", unit="day", count=2)
    back = read_partitioned(spark, path)
    assert back.count() == 3
    # three rows land in three distinct 2-day epoch-anchored buckets
    buckets = sorted(r[0] for r in back.select(PARTITION_COL).distinct().collect())
    assert len(buckets) == 3
    # partition pruning: filter on the bucket column appears in the scan
    pruned = back.filter(F.col(PARTITION_COL) == str(buckets[0]))
    assert pruned.count() == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull" in plan
    dropped = drop_partitions_before(spark, path, "2024-02-01")
    assert len(dropped) == 2
    assert read_partitioned(spark, path).count() == 1


def test_multimodal_feature_stub(spark):
    blobs = store_blobs(
        spark,
        [(b"fake-image-bytes-1", "image", "a.jpg"), (b"fake-image-bytes-2", "image", "b.jpg")],
    )
    assert blobs.schema["content"].dataType.simpleString() == "binary"
    feats = extract_features(blobs, decode_stub=True).collect()
    assert len(feats) == 2
    f0 = next(f for f in feats if f.blob_hash.startswith(blobs.collect()[0].blob_hash[:8]))
    assert len(f0.feature) == 8
    assert all(0.0 <= x <= 1.0 for x in f0.feature)
    assert 1 <= f0.width <= 64 and 1 <= f0.height <= 64
    # determinism: same bytes → same features
    feats2 = extract_features(blobs, decode_stub=True).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
