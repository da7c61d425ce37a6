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


# ------------------------------------------------- wire codec properties


@given(
    entries=st.lists(
        st.tuples(
            st.integers(min_value=-1, max_value=2**40),
            st.one_of(st.none(), st.binary(max_size=64)),
            st.binary(max_size=256),
        ),
        max_size=8,
    )
)
@settings(max_examples=50, deadline=None)
def test_kafka_message_set_roundtrip(entries):
    """encode→decode is identity for any (ts, key, value) batch,
    offsets assigned sequentially — the CRC and varlength framing must
    survive arbitrary binary payloads including empty and null keys."""
    from edgelake_spark.streaming import kafka as kf

    tagged = [(i, ts, key, value) for i, (ts, key, value) in enumerate(entries)]
    assert kf.decode_message_set(kf.encode_message_set(tagged)) == tagged


@given(
    topic=st.text(
        alphabet=st.characters(blacklist_characters="\x00", blacklist_categories=("Cs",)),
        min_size=1,
        max_size=40,
    ),
    payload=st.binary(max_size=512),
    qos=st.integers(min_value=0, max_value=1),
    pid=st.integers(min_value=1, max_value=65535),
)
@settings(max_examples=50, deadline=None)
def test_mqtt_publish_roundtrip(topic, payload, qos, pid):
    """PUBLISH encode→parse is identity for arbitrary UTF-8 topics and
    binary payloads across QoS 0/1 (§3.3: pid present iff qos>0)."""
    from edgelake_spark.streaming import mqtt as mq

    pkt = mq.publish_packet(topic, payload, qos=qos, pid=pid)
    body_off = 1
    # skip the remaining-length varint
    while pkt[body_off] & 0x80:
        body_off += 1
    body_off += 1
    ptype, flags = pkt[0] >> 4, pkt[0] & 0x0F
    assert ptype == mq.PUBLISH
    got_topic, got_qos, got_pid, got_payload = mq.parse_publish(flags, pkt[body_off:])
    assert (got_topic, got_qos, got_payload) == (topic, qos, payload)
    assert got_pid == (pid if qos else None)


@given(n=st.integers(min_value=0, max_value=268_435_455))
@settings(max_examples=200, deadline=None)
def test_mqtt_remaining_length_varint_roundtrip(n):
    """§2.2.3 remaining-length: decode(encode(n)) == n over the full
    legal range (up to 256 MB), and the encoding is minimal (≤4 bytes)."""
    from edgelake_spark.streaming.mqtt import _encode_len

    enc = _encode_len(n)
    assert 1 <= len(enc) <= 4
    val, mult = 0, 1
    for b in enc:
        val += (b & 0x7F) * mult
        mult *= 128
    assert val == n
