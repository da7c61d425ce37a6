"""Local replica of the driver's t2 gate: run every queries() entry on
Spark at sf0.01 and its oracle_sql() in DuckDB, compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR_MED

QUERY_NAMES = sorted(entry_mod.queries().keys())


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    return v


def _rows_to_multiset(columns, rows):
    # order-insensitive: sort columns by name, then sort row tuples
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(repr(_normalize(row[i])) for i in idx) for row in rows
    )


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck_views):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR_MED)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = duck_views.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s_ms = _rows_to_multiset(spark_cols, spark_rows)
    d_ms = _rows_to_multiset(duck_cols, duck_rows)
    if s_ms != d_ms:
        diffs = [(a, b) for a, b in zip(s_ms, d_ms) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
