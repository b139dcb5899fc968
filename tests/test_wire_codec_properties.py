"""Property-based (hypothesis) roundtrip tests for the hand-rolled binary
wire codecs outside the queue family: the fluent_forward msgpack
pack/unpack pair (sources/fluent.py — the one fully hand-written binary
serializer in the repo) and the prometheus remote-write WriteRequest
protobuf mapping (sources/prw.py). Like the queue-codec properties,
these are driver-side kernel tests: the fixture corpora only sweep the
values the generator emits, while the codecs must hold for the whole
msgpack / protobuf value domain (negative fixints, 64-bit boundaries,
nested containers, unicode astral planes, duplicate series keys)."""

import struct

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from splunk_otel_collector_ray.sources.fluent import (
    EventTime,
    decode_forward_payload,
    pack,
    pack_forward_message,
    unpack,
)
from splunk_otel_collector_ray.sources.prw import (
    decode_write_request,
    encode_write_request,
)

# msgpack int domain the packer supports: int64 min … uint64 max
mp_int = st.integers(min_value=-(2 ** 63), max_value=2 ** 64 - 1)
# doubles roundtrip bit-exactly through the 0xCB format; NaN breaks ==
mp_float = st.floats(allow_nan=False)
mp_scalar = st.one_of(
    st.none(), st.booleans(), mp_int, mp_float, st.text(max_size=40),
    st.binary(max_size=40),
    st.builds(EventTime,
              st.integers(min_value=0, max_value=2 ** 32 - 1),
              st.integers(min_value=0, max_value=2 ** 32 - 1)))
mp_value = st.recursive(
    mp_scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=10), inner, max_size=5)),
    max_leaves=25)


@settings(max_examples=150, deadline=None)
@given(mp_value)
def test_msgpack_pack_unpack_roundtrip(obj):
    """Every packable value unpacks to an equal value with the cursor
    exactly at end-of-buffer (no over/under-read)."""
    buf = bytearray()
    pack(obj, buf)
    out, pos = unpack(bytes(buf))
    assert pos == len(buf)
    assert out == obj


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(
    st.text(max_size=15),  # tag
    st.lists(st.tuples(
        st.integers(min_value=0, max_value=2 ** 32 - 1),   # sec
        st.integers(min_value=0, max_value=999_999_999),   # nsec
        st.dictionaries(st.text(max_size=8),
                        st.one_of(st.text(max_size=10), mp_int,
                                  st.booleans()),
                        max_size=4)),
        min_size=1, max_size=6)),
    min_size=1, max_size=4))
def test_forward_message_roundtrip(messages):
    """Back-to-back Forward messages decode to the flattened (tag,
    time_us, record) triples in order, with EventTime reduced to µs."""
    payload = b"".join(
        pack_forward_message(
            tag, [(EventTime(s, ns), rec) for s, ns, rec in entries])
        for tag, entries in messages)
    tags, times, records = decode_forward_payload(payload)
    want = [(tag, s * 1_000_000 + ns // 1_000, rec)
            for tag, entries in messages for s, ns, rec in entries]
    assert list(zip(tags, times, records)) == want


prw_label = st.text(
    alphabet=st.characters(exclude_categories=("Cs",)), max_size=12)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(
    st.sampled_from(["cpu_seconds", "mem_bytes", "rpc_ms"]),
    prw_label, prw_label,
    st.floats(allow_nan=False),
    st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)),
    max_size=25))
def test_prw_write_request_roundtrip(rows):
    """encode_write_request → decode_write_request recovers every
    datapoint row exactly (values bit-equal, ts int64-exact, labels
    sorted), across duplicate and unique series identities — including
    the empty request."""
    t = pa.table({
        "name": pa.array([r[0] for r in rows], type=pa.string()),
        "job": pa.array([r[1] for r in rows], type=pa.string()),
        "instance": pa.array([r[2] for r in rows], type=pa.string()),
        "value": pa.array([r[3] for r in rows], type=pa.float64()),
        "ts_ms": pa.array([r[4] for r in rows], type=pa.int64()),
    })
    out = decode_write_request(encode_write_request(
        t, label_cols=("job", "instance")))
    # canonical row: value as its IEEE bit pattern — protobuf doubles
    # are bit-preserving, and bits keep -0.0/0.0 and sort deterministic
    got = sorted(
        (n, tuple(sorted(lab)), struct.pack(">d", v), ts)
        for n, lab, v, ts in zip(
            out["name"].to_pylist(), out["labels"].to_pylist(),
            out["value"].to_pylist(), out["ts_ms"].to_pylist()))
    want = sorted(
        (n, (("instance", inst), ("job", job)), struct.pack(">d", v), ts)
        for n, job, inst, v, ts in rows)
    assert got == want


def test_ts_us_accepts_foreign_iso_forms():
    """A dump not produced by this package's own iso_us writer still
    decodes: any fraction width (incl. sub-µs, truncated), zone-less,
    Z, and numeric-offset forms."""
    from splunk_otel_collector_ray.sources.wire import ts_us

    got = ts_us(pa.array([
        "2024-01-01T00:00:00Z",
        "2024-01-01T00:00:00.123Z",
        "2024-01-01T05:30:00.000001+05:30",
    ])).to_pylist()
    assert [g.isoformat() for g in got] == [
        "2024-01-01T00:00:00",
        "2024-01-01T00:00:00.123000",
        "2024-01-01T00:00:00.000001",
    ]
    ns = ts_us(pa.array(["2024-01-01T00:00:00.123456789Z"])).to_pylist()
    assert ns[0].microsecond == 123456  # sub-µs truncates, not errors
    naive = ts_us(pa.array(["2024-01-01 00:00:00.5"])).to_pylist()
    assert naive[0].microsecond == 500000


def test_next_state_subdir_claims_atomically(tmp_path):
    """Each call claims a DISTINCT slot (the dir is created at
    reservation time), so concurrent settle/ack writers can't share one."""
    import os

    from splunk_otel_collector_ray.sources.wire import next_state_subdir

    a = next_state_subdir(str(tmp_path), "settle")
    b = next_state_subdir(str(tmp_path), "settle")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)
    assert sorted(os.path.basename(p) for p in (a, b)) == [
        "settle-0000", "settle-0001"]
