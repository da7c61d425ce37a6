"""Winnowing guarantee (Schleimer et al., SIGMOD 2003, Theorem 1):
documents sharing a substring of length >= WINNOW_K + WINNOW_W - 1 share
at least one fingerprint. Property-tested through the DuckDB twin of the
expression (bit-identical to the Spark form — asserted by the
doc_winnow_fp oracle gate), so the property runs in milliseconds."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from edgelake_spark.functions.text import (
    WINNOW_K,
    WINNOW_W,
    duck_gram_hashes,
    duck_winnow_fps_over,
)

GUARANTEE = WINNOW_K + WINNOW_W - 1


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _fps(con, text: str) -> set[int]:
    sql = (
        f"SELECT {duck_winnow_fps_over('hs')} FROM "
        f"(SELECT {duck_gram_hashes('t')} AS hs FROM (SELECT ? AS t))"
    )
    return set(con.execute(sql, [text]).fetchone()[0])


alpha = st.text(alphabet="abcdefgh ", min_size=0, max_size=30)
shared = st.text(alphabet="abcdefgh ", min_size=GUARANTEE, max_size=GUARANTEE + 10)


@settings(max_examples=60, deadline=None)
@given(prefix_a=alpha, prefix_b=alpha, common=shared, suffix_a=alpha, suffix_b=alpha)
def test_shared_substring_shares_fingerprint(duck, prefix_a, prefix_b, common, suffix_a, suffix_b):
    a = prefix_a + common + suffix_a
    b = prefix_b + common + suffix_b
    assert _fps(duck, a) & _fps(duck, b), (
        f"no shared fingerprint despite {len(common)}-char common substring"
    )


@settings(max_examples=30, deadline=None)
@given(text=st.text(alphabet="abcdefgh ", min_size=1, max_size=60))
def test_fingerprints_deterministic_and_nonempty(duck, text):
    fps = _fps(duck, text)
    assert fps == _fps(duck, text)
    assert len(fps) >= 1  # even texts shorter than k produce one gram/window
