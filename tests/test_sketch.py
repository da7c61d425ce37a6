"""Sketch-module properties beyond the parity gates: the SQL register/
cell/rank math agrees with an independent pure-Python reference on
randomized inputs, and the estimators obey their theoretical bounds
(CMS never underestimates; HLL/KMV land within expected error)."""

import hashlib
import random

import pytest

from edgelake_spark.functions import sketch as sk
from edgelake_spark.functions.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    KMV_K,
    _HLL_MAXRHO,
    _HLL_WBITS,
)


def _hll_py(keys):
    regs = [0] * HLL_M
    wmask = (1 << _HLL_WBITS) - 1
    for k in keys:
        h60 = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:15], 16)
        idx, w = h60 >> _HLL_WBITS, h60 & wmask
        rho = _HLL_MAXRHO - w.bit_length() if w else _HLL_MAXRHO
        regs[idx] = max(regs[idx], rho)
    return regs


def test_hll_sql_matches_python_reference(spark):
    rnd = random.Random(3)
    keys = [rnd.randrange(10**9) for _ in range(5000)]
    spark.createDataFrame(
        [(k,) for k in keys], "event_id bigint"
    ).selectExpr("'g' AS event_type", "event_id").createOrReplaceTempView(
        "__hll_t"
    )
    sql = sk.hll_register_agg_sql("spark", "__hll_t", "event_type", "event_id")
    row = spark.sql(sql).collect()[0]
    regs = _hll_py(keys)
    assert row["registers_hit"] == sum(1 for r in regs if r)
    assert row["sum_inv"] == sum(1 << (_HLL_MAXRHO - r) for r in regs if r)
    # raw-regime accuracy: n >> 2.5m here, so the estimate should land
    # within ~3 standard errors (1.04/sqrt(m) each)
    n_distinct = len(set(keys))
    assert abs(row["est_hll"] - n_distinct) / n_distinct < 3 * 1.04 / (HLL_M ** 0.5)


def test_cms_never_underestimates(spark):
    rnd = random.Random(5)
    words = [f"w{rnd.randrange(500)}" for _ in range(20000)]
    spark.createDataFrame([(w,) for w in words], "text string").createOrReplaceTempView(
        "__cms_t"
    )
    sql = sk.cms_heavy_hitters_sql("spark", "__cms_t", topk=30)
    rows = spark.sql(sql).collect()
    assert len(rows) == 30
    total = len(words)
    for r in rows:
        assert r["overcount"] >= 0, r  # CMS is one-sided
        # Markov bound: overcount <= e * total / width whp per row;
        # with the min over CMS_DEPTH rows a 4x slack never trips
        assert r["overcount"] <= 4 * total / CMS_WIDTH, r


def test_kmv_estimate_within_error(spark):
    rnd = random.Random(7)
    keys = list({rnd.randrange(10**9) for _ in range(4000)})
    spark.createDataFrame(
        [(k,) for k in keys], "event_id bigint"
    ).selectExpr("'g' AS event_type", "event_id").createOrReplaceTempView(
        "__kmv_t"
    )
    sql = sk.kmv_distinct_sql("spark", "__kmv_t", "event_type", "event_id")
    row = spark.sql(sql).collect()[0]
    assert row["exact_distinct"] == len(keys)
    # KMV relative error ~ 1/sqrt(k-2); allow 4 sigma
    assert row["rel_err"] < 4 / (KMV_K - 2) ** 0.5


def test_kmv_small_group_exact_fallback(spark):
    """A group with fewer than KMV_K distinct keys holds its whole hash
    set inside the sketch, so the standard fallback applies: est ==
    exact, rel_err == 0, and the group appears in the output (the old
    INNER JOIN against the 128th-rank row silently dropped it —
    round-7 advice, medium)."""
    import duckdb

    rows = [("small", i) for i in range(10)] + [
        ("big", 10**6 + i) for i in range(1000)
    ]
    spark.createDataFrame(
        rows, "event_type string, event_id bigint"
    ).createOrReplaceTempView("__kmv_s")
    out = {
        r["event_type"]: r
        for r in spark.sql(
            sk.kmv_distinct_sql("spark", "__kmv_s", "event_type", "event_id")
        ).collect()
    }
    assert set(out) == {"small", "big"}
    assert out["small"]["exact_distinct"] == 10
    assert out["small"]["est_kmv"] == 10.0
    assert out["small"]["rel_err"] == 0.0
    assert out["big"]["est_kmv"] != out["big"]["exact_distinct"]  # sketch path

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE __kmv_s AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}', {i})" for t, i in rows)
        + ") AS v(event_type, event_id)"
    )
    duck = {
        r[0]: r
        for r in con.execute(
            sk.kmv_distinct_sql("duck", "__kmv_s", "event_type", "event_id")
        ).fetchall()
    }
    assert set(duck) == {"small", "big"}
    assert duck["small"][1:] == (10, 10.0, 0.0)


def test_cms_rollup_key_name_collision_safe(spark):
    """cms_rollup_sql must render valid SQL for key names that are
    substrings of its own md5/hex60 template (the old textual
    col.replace corrupted the emission for keys like 'j' — round-7
    advice, low). The rollup's cells_equal invariant must still hold."""
    import datetime

    rows = [
        (f"t{i % 3}", datetime.datetime(2024, 1, 1 + i % 5)) for i in range(600)
    ]
    spark.createDataFrame(rows, "j string, ts timestamp").createOrReplaceTempView(
        "__cmsj_t"
    )
    out = spark.sql(sk.cms_rollup_sql("spark", "__cmsj_t", "j")).collect()
    assert len(out) == CMS_DEPTH
    assert all(r["cells_equal"] for r in out)
    assert all(r["total_mass"] == 600 for r in out)


def test_hll_rollup_registers_equal_flag(spark):
    # synthetic multi-day data: the rollup's equality flag must be TRUE
    # for every group by construction (register max is associative)
    import datetime

    rnd = random.Random(9)
    rows = [
        (
            f"t{i % 2}",
            datetime.datetime(2024, 1, 1 + rnd.randrange(20)),
            rnd.randrange(10**6),
        )
        for i in range(3000)
    ]
    spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id bigint"
    ).createOrReplaceTempView("__roll_t")
    sql = sk.hll_rollup_sql("spark", "__roll_t", "event_type", "event_id")
    out = spark.sql(sql).collect()
    assert len(out) == 2
    for r in out:
        assert r["registers_equal"] is True
        assert r["est_merged"] == r["est_direct"]


def test_fixed_point_staging_cross_engine(spark):
    """The round-7 staging rule's regression pin: floor(x·2^40) BIGINT
    staging must agree between Spark and DuckDB on adversarial doubles —
    including the dyadic float32 ties that broke DECIMAL staging
    (0.1983642578125 rounds differently at scale 12/18 across engines:
    Spark rounds the shortest repr HALF_UP, DuckDB the exact binary
    HALF_EVEN — floor has no rounding step to disagree on)."""
    import random
    import struct

    import duckdb

    rnd = random.Random(13)
    vals = [rnd.uniform(-2, 2) for _ in range(4000)]
    # float32-sourced dyadic rationals (the DECIMAL-staging killers)
    vals += [
        struct.unpack("f", struct.pack("f", v))[0]
        for v in (0.1983642578125, 0.1, 1 / 3, 2**-24, -0.625, 123.456)
    ]
    spark.createDataFrame([(v,) for v in vals], "x double").createOrReplaceTempView(
        "__fx_t"
    )
    expr = "CAST(SUM(CAST(floor(x * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0"
    s_val = spark.sql(f"SELECT {expr} AS s FROM __fx_t").collect()[0]["s"]
    duck = duckdb.connect()
    import pandas as pd

    duck.register("t", pd.DataFrame({"x": vals}))
    d_val = duck.execute(
        "SELECT CAST(SUM(CAST(floor(x * 1099511627776.0) AS BIGINT)) AS DOUBLE)"
        " / 1099511627776.0 FROM t"
    ).fetchone()[0]
    assert s_val == d_val
    # and the per-value staged integers agree everywhere, not just in sum
    s_rows = sorted(
        r["q"]
        for r in spark.sql(
            "SELECT CAST(floor(x * 1099511627776.0) AS BIGINT) AS q FROM __fx_t"
        ).collect()
    )
    d_rows = sorted(
        r[0]
        for r in duck.execute(
            "SELECT CAST(floor(x * 1099511627776.0) AS BIGINT) FROM t"
        ).fetchall()
    )
    assert s_rows == d_rows


def test_kmv_null_keys_rank_identically_cross_engine(spark):
    """Round-9 advice regression: NULL keys hash to NULL and Spark
    sorts NULLs FIRST in the rank window while DuckDB sorts them LAST —
    without the hv-CTE NULL filter, a group holding >= k distinct keys
    plus NULLs takes the estimator path on one engine and a shifted
    k-th hash on the other. With the filter, both engines rank the
    same row set and every emitted column matches exactly."""
    import duckdb

    n_distinct = sk.KMV_K + 40  # past k -> estimator path engaged
    rows = [("g", i) for i in range(n_distinct)] + [("g", None)] * 7
    rows += [("tiny", 1), ("tiny", None)]  # under-k group -> exact path
    spark.createDataFrame(rows, "grp string, k bigint").createOrReplaceTempView(
        "__kmv_null_t"
    )
    got = [
        tuple(r)
        for r in spark.sql(
            sk.kmv_distinct_sql("spark", "__kmv_null_t", "grp", "k")
        ).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE __kmv_null_t (grp VARCHAR, k BIGINT)")
    con.executemany("INSERT INTO __kmv_null_t VALUES (?, ?)", rows)
    want = con.execute(
        sk.kmv_distinct_sql("duck", "__kmv_null_t", "grp", "k")
    ).fetchall()
    assert got == want
    by_grp = {r[0]: r for r in got}
    assert by_grp["tiny"][1] == 1 and by_grp["tiny"][2] == 1.0  # exact path
    assert by_grp["g"][1] == n_distinct and by_grp["g"][3] < 0.25  # estimator
