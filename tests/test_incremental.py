"""IncrementalAgg: delta-only refresh equals a full recompute, no-op
refreshes skip, and non-append source changes are refused."""

import pytest

from edgelake_spark.ingest.incremental import IncrementalAgg
from edgelake_spark.txlog import TxTable


def _setup(spark, tmp_path):
    src = TxTable(str(tmp_path / "src"))
    dst = TxTable(str(tmp_path / "dst"))
    inc = IncrementalAgg(
        src, dst,
        group_cols=["k"],
        aggs={
            "n": ("count", ""),
            "total": ("sum", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
        },
    )
    return src, dst, inc


def _rows(spark, dst):
    return {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in dst.read(spark).collect()
    }


def test_incremental_equals_full(spark, tmp_path):
    src, dst, inc = _setup(spark, tmp_path)
    src.overwrite(spark.createDataFrame([("a", 1), ("b", 5)], "k string, v int"))
    s1 = inc.refresh(spark)
    assert s1["delta_files"] > 0
    src.append(spark.createDataFrame([("a", 3), ("c", 7)], "k string, v int"))
    s2 = inc.refresh(spark)
    assert s2["delta_files"] > 0 and s2["src_version"] == src.latest_version()
    assert _rows(spark, dst) == {
        "a": (2, 4, 1, 3),
        "b": (1, 5, 5, 5),
        "c": (1, 7, 7, 7),
    }
    # and it matches a from-scratch full rebuild exactly
    full_dst = TxTable(str(tmp_path / "dst_full"))
    full = IncrementalAgg(src, full_dst, ["k"], inc.aggs)
    full.full_refresh(spark)
    assert _rows(spark, dst) == _rows(spark, full_dst)


def test_noop_refresh_skips(spark, tmp_path):
    src, dst, inc = _setup(spark, tmp_path)
    src.overwrite(spark.createDataFrame([("a", 1)], "k string, v int"))
    inc.refresh(spark)
    v = dst.latest_version()
    s = inc.refresh(spark)
    assert s["skipped"] and dst.latest_version() == v


def test_non_append_change_refused(spark, tmp_path):
    src, dst, inc = _setup(spark, tmp_path)
    src.overwrite(spark.createDataFrame([("a", 1), ("b", 5)], "k string, v int"))
    inc.refresh(spark)
    # a DML rewrite removes files → delta algebra invalid
    src.update_where(spark, {"v": "v + 10"}, "k = 'a'")
    with pytest.raises(ValueError, match="full_refresh"):
        inc.refresh(spark)
    inc.full_refresh(spark)
    assert _rows(spark, dst)["a"] == (1, 11, 11, 11)
