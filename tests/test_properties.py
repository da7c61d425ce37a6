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


# ---- ES weighted sampling (the doc_weighted_sample / reservoir math) --


def _es_key(doc_id: int, w: float, salt: str = "wsamp") -> float:
    """Salt-generalized twin of the PRODUCTION key
    (edgelake_spark.streaming.stateful.es_key) — the statistical test
    below needs many independent salts; test_es_key_matches_production
    pins this copy to the real one so they cannot drift."""
    import hashlib
    import math

    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    u = (int(h[:15], 16) + 1) / 1152921504606846976.0
    return math.log(u) / w


def _es_top_k(items, k, salt="wsamp"):
    keyed = sorted(
        ((_es_key(d, w, salt), d, w) for d, w in items),
        key=lambda e: (-e[0], e[1]),
    )
    return keyed[:k]


@given(st.integers(0, 10_000_000), st.floats(0.01, 100.0))
@settings(max_examples=300, deadline=None)
def test_es_key_matches_production(doc_id, w):
    from edgelake_spark.streaming.stateful import es_key

    assert _es_key(doc_id, w) == es_key(doc_id, w)


def test_es_inclusion_tracks_weight():
    """Efraimidis–Spirakis: P(selected) increases with weight. Across
    2000 independent salts (each salt = an independent uniform draw per
    item), an item with 10x the weight of its 99 peers must be selected
    into the top-10 far more often than a baseline peer — the
    statistical content of 'weighted' that the parity gates (which pin
    one salt) cannot see."""
    heavy_hits = light_hits = 0
    items = [(i, 10.0 if i == 0 else 1.0) for i in range(100)]
    for s in range(2000):
        sel = {d for _, d, _ in _es_top_k(items, 10, salt=f"s{s}")}
        heavy_hits += 0 in sel
        light_hits += 1 in sel
    # exact P for the heavy item ~0.66 at w=10, n=100, k=10; a flat
    # sampler would give 0.10 for both. Wide bands: 2000 trials
    assert heavy_hits / 2000 > 0.45
    assert 0.05 < light_hits / 2000 < 0.18
    assert heavy_hits > 3 * light_hits


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.floats(0.05, 50.0)),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 12),
)
@settings(max_examples=200, deadline=None)
def test_es_reservoir_merge_is_lossless(items, k):
    """Top-k-of-union == top-k of the concatenated stream, for any
    split: the property that makes per-shard reservoirs roll up without
    re-scan (streaming/stateful.weighted_sample_stream docstring) and
    makes the incremental multi-batch path equal the one-batch path."""
    mid = len(items) // 2
    a, b = items[:mid], items[mid:]
    merged = sorted(
        _es_top_k(a, k) + _es_top_k(b, k), key=lambda e: (-e[0], e[1])
    )[:k]
    assert merged == _es_top_k(items, k)
def test_mmr_oracle_matches_pure_python_reference(duck_views):
    """Third-engine triangulation: Spark == DuckDB is pinned by the
    parity gate; this pins that what both compute IS textbook greedy
    MMR — an independent pure-Python implementation (explicit loops,
    no SQL) reproduces the oracle's selections, ranks, and scores
    bit-for-bit from the raw parquet vectors."""
    import math

    import duckdb

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    vecs = {
        int(vid): [float(x) for x in emb]
        for vid, emb in con.sql(
            f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }
    norms = {v: math.sqrt(sum(x * x for x in e)) for v, e in vecs.items()}

    def cos(a, b):
        dot = 0.0
        ea, eb = vecs[a], vecs[b]
        for i in range(len(ea)):
            dot += ea[i] * eb[i]
        return dot / (norms[a] * norms[b])

    expected = []
    for q in (0, 1, 2):
        pool = sorted(
            ((cos(q, c), c) for c in vecs if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:20]
        rels = {c: r for r, c in pool}
        first = max(pool, key=lambda t: (t[0], -t[1]))
        sel = [(1, first[1], first[0], first[0])]
        chosen = {first[1]}
        for rank in range(2, 9):
            best = None
            for rel, c in pool:
                if c in chosen:
                    continue
                maxsim = max(cos(c, s) for _, s, _, _ in sel)
                mmr = 0.7 * rel - 0.3 * maxsim
                key = (mmr, -c)
                if best is None or key > best[0]:
                    best = (key, c, rel, mmr)
            sel.append((rank, best[1], best[2], best[3]))
            chosen.add(best[1])
        expected += [(q, r, c, rel, mmr) for r, c, rel, mmr in sel]

    from edgelake_spark.queries import ORACLE_SQL

    got = duck_views.execute(ORACLE_SQL["emb_mmr_diversify"]).fetchall()
    assert [tuple(r) for r in got] == expected
