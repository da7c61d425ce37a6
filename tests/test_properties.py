"""Property tests (hypothesis) for the pure rewrite-layer helpers."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from edgelake_spark.dialect.rewriter import (
    INCREMENT_UNITS,
    _split_castings,
    _sub_outside_quotes,
    plan_auto_increments,
)
from edgelake_spark.policies.bring import stamp_policy

ident = st.from_regex(r"[a-z_][a-z0-9_]{0,8}", fullmatch=True)


@given(
    base=ident,
    castings=st.lists(st.sampled_from(["int", "str", "float(2)", "ljust(10)"]), max_size=4),
)
def test_split_castings_roundtrip(base, castings):
    expr = base + "".join(f"::{c}" for c in castings)
    head, chain = _split_castings(expr)
    assert head == base
    assert chain == castings


@given(quoted=st.text(alphabet="ab=<>! c", max_size=12), outer=ident)
def test_sub_outside_quotes_never_touches_literals(quoted, outer):
    text = f"{outer} == 1 and note = '{quoted}'"
    out = _sub_outside_quotes(r"==", "=", text)
    assert f"'{quoted}'" in out  # literal intact
    assert out.startswith(f"{outer} = 1")


@given(
    span=st.floats(min_value=60.0, max_value=10 * 365.25 * 24 * 3600),
    points=st.integers(min_value=1, max_value=100_000),
)
@settings(max_examples=200)
def test_auto_increments_bucket_count_bounded(span, points):
    """The planned (unit, interval) yields between ~points/2 and
    ~2*points buckets over the span — the reference's target-points
    contract — except when clamped at 1-second granularity."""
    unit, interval = plan_auto_increments(span, points)
    unit_seconds = dict(INCREMENT_UNITS)[unit]
    buckets = span / (unit_seconds * interval)
    if unit == "second" and interval == 1:
        return  # cannot slice finer than a second
    # rounding to whole intervals of a coarse unit can at most halve or
    # double the bucket count
    assert buckets <= 2 * points + 1
    assert buckets >= points / 2 - 1


@given(
    name=ident,
    company=ident,
    # reserved keys are legitimately preserved by stamping (the
    # reference only adds id/date when absent), so don't generate them
    extra=st.dictionaries(
        ident.filter(lambda k: k not in ("id", "date", "ledger")),
        st.integers(min_value=0, max_value=9),
        max_size=3,
    ),
)
def test_stamp_policy_content_addressed(name, company, extra):
    """Same content (minus date/ledger) → same id; ids are 32-hex."""
    body1 = {"name": name, "company": company, **extra}
    body2 = dict(body1)
    p1 = stamp_policy({"operator": dict(body1)})
    p2 = stamp_policy({"operator": {**body2, "date": "1999-01-01"}})
    id1 = p1["operator"]["id"]
    assert re.fullmatch(r"[0-9a-f]{32}", id1)
    assert id1 == p2["operator"]["id"]
    # stamping an already-stamped policy is a no-op
    assert stamp_policy(p1)["operator"]["id"] == id1
