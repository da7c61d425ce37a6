"""Randomized execution sweep of the dialect's heart: every
``increments(unit, n, col)`` / ``period(unit, n, date, col[, filter])``
variant and the common casting chains, executed against DuckDB over an
adversarial timestamp set (sub-second fractions, unit boundaries, ISO
week edges, leap day) — the reference's week→7-days and year-no-trunc
edges (unify_results.py:538-551, 710-714) get randomized inputs instead
of the per-variant gates' fixed ones.

~210 parameter cases (each evaluated over 400 random timestamps) in one
Spark session; a seeded RNG keeps failures reproducible.
"""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta, timezone

import duckdb
import pandas as pd
import pytest

from edgelake_spark.dialect.rewriter import INCREMENT_PARENT_UNIT
from edgelake_spark.engine import EdgeLakeEngine

SEED = 20260814
N_ROWS = 400
FIXED_NOW = datetime(2024, 2, 1)

#: instants where unit bucketing is easiest to get wrong: year/month
#: boundaries, ISO-week edges (Dec 29–Jan 4), leap day, max-fraction
#: sub-second values
_BOUNDARIES = [
    datetime(2024, 1, 1),
    datetime(2023, 12, 31, 23, 59, 59, 999999),
    datetime(2024, 12, 30),            # ISO week 1 of 2025
    datetime(2025, 1, 1),
    datetime(2019, 12, 29),            # ISO week 52 of 2019
    datetime(2020, 1, 1, 0, 0, 0, 1),
    datetime(2024, 2, 29, 12, 30, 45, 500000),   # leap day
    datetime(2024, 3, 1),
    datetime(2021, 6, 30, 23, 59, 59, 123456),
    datetime(2022, 1, 31, 13, 0, 0),   # month-end (period month math)
    datetime(2022, 3, 31, 13, 0, 0),
    datetime(2024, 5, 31, 23, 0, 0),
]


def _fuzz_frame() -> pd.DataFrame:
    rng = random.Random(SEED)
    lo = datetime(2019, 1, 1).replace(tzinfo=timezone.utc).timestamp()
    hi = datetime(2026, 1, 1).replace(tzinfo=timezone.utc).timestamp()
    stamps = list(_BOUNDARIES)
    while len(stamps) < N_ROWS:
        epoch = rng.uniform(lo, hi)
        micro = rng.choice([0, 0, rng.randrange(1_000_000)])
        dt = datetime.fromtimestamp(int(epoch), tz=timezone.utc).replace(
            tzinfo=None, microsecond=micro
        )
        stamps.append(dt)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _"
    def tie_free_value() -> float:
        # no fractional digit is ever 5, so printf rounding at ANY
        # precision has no decimal tie — Java (%.Nf half-up on the
        # shortest repr) and C (round binary expansion) then agree;
        # decimal ties are an engine-boundary artifact, not dialect
        # behavior under test
        frac = "".join(rng.choice("012346789") for _ in range(6))
        return rng.choice([-1.0, 1.0]) * (rng.randrange(0, 500) + int(frac) / 1e6)

    rows = [
        (
            i,
            ts,
            tie_free_value(),
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 15))),
        )
        for i, ts in enumerate(stamps)
    ]
    return pd.DataFrame(rows, columns=["k", "ts", "value", "et"])


@pytest.fixture(scope="module")
def fuzz_env(spark):
    pdf = _fuzz_frame()
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fz")
    con = duckdb.connect()
    con.register("fz", pdf)
    eng = EdgeLakeEngine(spark, None, now=FIXED_NOW)
    yield eng, con
    con.close()
    spark.catalog.dropTempView("fz")


def _normalize(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    return v


def _compare(case: str, df, con, duck_sql: str):
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    res = con.execute(duck_sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), f"{case}: columns differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{case}: rows {len(spark_rows)} vs {len(duck_rows)}"
    )
    idx_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    idx_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    ms_s = sorted(tuple(repr(_normalize(r[i])) for i in idx_s) for r in spark_rows)
    ms_d = sorted(tuple(repr(_normalize(r[i])) for i in idx_d) for r in duck_rows)
    if ms_s != ms_d:
        diffs = [(a, b) for a, b in zip(ms_s, ms_d) if a != b][:3]
        raise AssertionError(f"{case}: value mismatch, first diffs: {diffs}")


def _duck_increments(unit: str, n: int) -> str:
    """The reference bucket shape in DuckDB SQL (unify_results.py:562-583):
    date_trunc(parent) + extract(unit)//n; year is extract-only."""
    extract = (
        f"CAST(CAST(extract({unit} FROM ts) AS INTEGER) // {n} AS BIGINT) "
        "AS increments_extract"
    )
    if unit == "year":
        keys, group = extract, "1"
    else:
        parent = INCREMENT_PARENT_UNIT[unit]
        keys = (
            f"CAST(date_trunc('{parent}', ts) AS TIMESTAMP) AS increments_trunc, "
            + extract
        )
        group = "1, 2"
    return (
        f"SELECT {keys}, count(*) AS n, min(ts) AS mn, max(ts) AS mx "
        f"FROM fz GROUP BY {group} ORDER BY {group}"
    )


def test_increments_unit_ladder_fuzz(fuzz_env):
    """Every unit × randomized divisor against DuckDB (56 cases)."""
    eng, con = fuzz_env
    rng = random.Random(SEED + 1)
    for unit in INCREMENT_PARENT_UNIT:
        divisors = {1} | {rng.randrange(2, 61) for _ in range(10)}
        for n in sorted(divisors)[:8]:
            df = eng.query(
                f"select increments({unit}, {n}, ts), count(*) as n, "
                "min(ts) as mn, max(ts) as mx from fz"
            )
            _compare(f"increments({unit},{n})", df, con, _duck_increments(unit, n))


def test_period_anchor_fuzz(fuzz_env):
    """period() over random anchors/units, with and without the 5th-arg
    filter; anchors before the data exercise the NULL-anchor edge
    (84 cases)."""
    eng, con = fuzz_env
    rng = random.Random(SEED + 2)
    for unit in INCREMENT_PARENT_UNIT:
        for _ in range(6):
            n = rng.randrange(1, 25)
            anchor = datetime(2018, 6, 1) + timedelta(
                seconds=rng.uniform(0, 8 * 365.25 * 24 * 3600)
            )
            a = anchor.strftime("%Y-%m-%d %H:%M:%S")
            with_filter = rng.random() < 0.5
            filt_dialect = ", and value > 0.0" if with_filter else ""
            filt_duck = " AND value > 0.0" if with_filter else ""
            df = eng.query(
                "select count(*) as n, min(ts) as mn, max(ts) as mx from fz "
                f"where period({unit}, {n}, '{a}', ts{filt_dialect})"
            )
            d_unit, d_n = ("day", n * 7) if unit == "week" else (unit, n)
            sub = f"(SELECT MAX(ts) FROM fz WHERE ts <= TIMESTAMP '{a}'{filt_duck})"
            duck = (
                "SELECT count(*) AS n, min(ts) AS mn, max(ts) AS mx FROM fz "
                f"WHERE ts > {sub} - INTERVAL {d_n} {d_unit.upper()} "
                f"AND ts <= {sub}{filt_duck}"
            )
            _compare(f"period({unit},{n},'{a}',filt={with_filter})", df, con, duck)


def test_casting_chain_fuzz(fuzz_env):
    """Random pad widths / printf precisions / datetime formats — four
    chains per query, 18 queries (72 chain cases)."""
    eng, con = fuzz_env
    rng = random.Random(SEED + 3)
    fmts = ["%Y-%m-%d", "%Y-%m-%d %H:%M", "%H:%M:%S", "%Y-%m-%d %H:%M:%S"]
    for qi in range(18):
        lj, rj = rng.randrange(1, 16), rng.randrange(1, 16)
        prec = rng.randrange(0, 7)
        fmt = rng.choice(fmts)
        df = eng.query(
            f"select k, et::ljust({lj}) as lp, et::rjust({rj}) as rp, "
            f"value::format(':.{prec}f') as fv, ts::datetime('{fmt}') as dt, "
            "value::int as vi from fz where k < 200 order by k"
        )
        duck = (
            f"SELECT k, substr(rpad(et, {lj}, ' '), 1, {lj}) AS lp, "
            f"CASE WHEN length(et) > {rj} THEN et[-{rj}:] "
            f"ELSE lpad(et, {rj}, ' ') END AS rp, "
            f"printf('%.{prec}f', value) AS fv, "
            f"strftime(ts, '{fmt}') AS dt, "
            "CAST(trunc(value) AS BIGINT) AS vi "
            "FROM fz WHERE k < 200 ORDER BY k"
        )
        _compare(f"casting(q{qi},lj={lj},rj={rj},prec={prec},fmt={fmt})", df, con, duck)
