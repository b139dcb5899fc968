"""Property-based (hypothesis) roundtrip tests for the queue-transport
wire codecs — encode an arbitrary envelope, decode it the way the reader
does, recover every field exactly. These are driver-side kernel tests
(the decode functions take a ``pa.Table`` exactly as ``read_json`` would
deliver it); the Ray-level read/resume paths are covered by the per-source
e2e tests. The codec edge is where the queue family's defects live
(wrong-typed SpanData fields, attribute-name collisions, empty producer
batches), so the fixture corpora can't sweep it — hypothesis can."""

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from splunk_otel_collector_ray.sources.wire import iso_us, ts_us

# json-safe unicode (no surrogates — json round-trips everything else)
txt = st.text(max_size=20)
# µs since epoch, bounded so iso_us's datetime stays in range (≤ ~year 6500)
us = st.integers(min_value=0, max_value=2 ** 57)
# ns since epoch for the solace SpanData times (≤ ~year 2115)
ns = st.integers(min_value=0, max_value=2 ** 62)

ATTR_KEYS = ["env", "k1", "k2", "message_id"]  # last one collides on purpose


@settings(max_examples=80, deadline=None)
@given(us)
def test_iso_us_ts_us_roundtrip(u):
    """The shared wire timestamp format is lossless at µs precision."""
    arr = ts_us(pa.array([iso_us(u)], type=pa.string()))
    assert arr[0].value == u


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.booleans(), txt, txt, txt, ns, ns, txt, txt),
                min_size=1, max_size=15))
def test_solace_encode_decode_roundtrip(rows):
    """Any well-formed SpanData message decodes to exactly one span row
    with every field recovered; nothing well-formed is ever refused."""
    from splunk_otel_collector_ray.sources.solace import (
        _decode_rows,
        encode_egress_span,
        encode_receive_span,
    )

    lines = []
    for is_recv, a, b, c, t0, t1, d, e in rows:
        if is_recv:
            lines.append(encode_receive_span(
                a, b, t0, t1, c, d, "smf", "3.0", e, "q/" + c))
        else:
            lines.append(encode_egress_span(
                a, b, c, t0, t1, "q/" + d, d, "amqp", "1.0", e))
    batch = pa.table({
        "topic": pa.array([ln["topic"] for ln in lines], type=pa.string()),
        "payload": pa.array([ln["payload"] for ln in lines],
                            type=pa.string())})
    out, refused = _decode_rows(batch)
    assert refused == 0
    assert out.num_rows == len(rows)
    for i, (is_recv, a, b, c, t0, t1, d, e) in enumerate(rows):
        r = out.slice(i, 1).to_pylist()[0]
        assert r["family"] == ("receive" if is_recv else "egress")
        assert r["trace_id"] == a and r["span_id"] == b
        assert r["client_username"] == e
        # ns → µs truncation is the only loss
        assert out["start_ts"][i].value == t0 // 1000
        assert out["end_ts"][i].value == t1 // 1000
        if is_recv:
            assert r["destination"] == c and r["parent_span_id"] == ""
            assert r["enqueue_queue"] == "q/" + c
            assert r["name"] == c + " receive" and r["kind"] == "consumer"
        else:
            assert r["destination"] == "q/" + d
            assert r["parent_span_id"] == c and r["enqueue_queue"] == ""
            assert r["name"] == "q/" + d + " send" and r["kind"] == "producer"
        assert r["rgmid"] == d


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(txt, txt, us, txt,
                          st.lists(txt, min_size=len(ATTR_KEYS),
                                   max_size=len(ATTR_KEYS))),
                min_size=1, max_size=15))
def test_pubsub_encode_decode_roundtrip(rows):
    """ReceivedMessage envelopes decode with the body (base64), both
    coordinates, the exact publish timestamp, and every attribute — except
    an attribute whose name collides with a coordinate column, which the
    coordinates override by contract."""
    from splunk_otel_collector_ray.sources.pubsub import (
        decode_pubsub_batch,
        encode_pubsub_record,
    )

    envs = [encode_pubsub_record(mid, okey, u, body,
                                 dict(zip(ATTR_KEYS, vals)))
            for mid, okey, u, body, vals in rows]
    out = decode_pubsub_batch(pa.Table.from_pylist(envs))
    assert out.num_rows == len(rows)
    got = out.to_pylist()
    for r, (mid, okey, u, body, vals) in zip(got, rows):
        assert r["message_id"] == mid          # coordinate wins collision
        assert r["ordering_key"] == okey
        assert r["body"] == body
        attrs = dict(zip(ATTR_KEYS, vals))
        for k, v in attrs.items():
            if k != "message_id":
                assert r[k] == v
    for i, (_, _, u, _, _) in enumerate(rows):
        assert out["publish_ts"][i].value == u


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99),
              txt, us,
              st.lists(st.tuples(us, txt, st.booleans()), max_size=4)),
    min_size=1, max_size=10))
def test_pulsar_encode_decode_roundtrip(entries):
    """Entries explode to one row per batched message; the ledger/entry
    coordinates replicate exactly; per-message properties union across the
    batch with None where a message lacks a key; empty producer batches
    contribute zero rows without disturbing neighbours."""
    from splunk_otel_collector_ray.sources.pulsar import (
        decode_pulsar_batch,
        encode_pulsar_entry,
        make_pulsar_message,
    )

    envs, expect = [], []
    for part, led, ent, key, pub, msgs in entries:
        ms = []
        for bi, (ev, payload, with_prop) in enumerate(msgs):
            props = {"lang": "en"} if with_prop else {}
            ms.append(make_pulsar_message(bi, ev, payload, props))
            expect.append((part, led, ent, key, pub, bi, ev, payload,
                           "en" if with_prop else None))
        envs.append(encode_pulsar_entry(part, led, ent, key, pub, ms))
    out = decode_pulsar_batch(pa.Table.from_pylist(envs))
    assert out.num_rows == len(expect)
    any_props = any(e[8] is not None for e in expect)
    for i, (part, led, ent, key, pub, bi, ev, payload, lang) in \
            enumerate(expect):
        r = out.slice(i, 1).to_pylist()[0]
        assert (r["partition"], r["ledger_id"], r["entry_id"],
                r["batch_index"]) == (part, led, ent, bi)
        assert r["key"] == key and r["body"] == payload
        assert out["publish_ts"][i].value == pub
        assert out["event_ts"][i].value == ev
        if any_props:
            assert r["lang"] == lang


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 10 ** 6), txt, us,
              st.lists(st.tuples(us, txt, txt, txt,
                                 st.sampled_from([
                                     "Informational", "Warning", "Error",
                                     "Critical", "Verbose", "Unknown"]),
                                 st.integers(0, 10 ** 6), txt),
                       max_size=4)),
    min_size=1, max_size=10))
def test_eventhub_encode_decode_roundtrip(events):
    """Capture events explode to one row per resource-log record with the
    envelope coordinates replicated, the documented level→severity map
    (unknown level → 0), and exact µs timestamps on both layers."""
    from splunk_otel_collector_ray.sources.eventhub import (
        AZURE_SEVERITY,
        RESOURCE_PREFIX,
        decode_eventhub_batch,
        encode_eventhub_event,
        make_azure_record,
    )

    envs, expect = [], []
    for part, seq, pkey, enq, recs in events:
        rs = []
        for t, conv, role, tool, level, turn, text in recs:
            rs.append(make_azure_record(t, conv, role, tool, level,
                                        turn, text))
            expect.append((part, seq, pkey, enq, t, conv, role, tool,
                           level, turn, text))
        envs.append(encode_eventhub_event(part, seq, pkey, enq, rs))
    out = decode_eventhub_batch(pa.Table.from_pylist(envs))
    assert out.num_rows == len(expect)
    for i, (part, seq, pkey, enq, t, conv, role, tool, level, turn,
            text) in enumerate(expect):
        r = out.slice(i, 1).to_pylist()[0]
        assert (r["partition"], r["sequence_number"]) == (part, seq)
        assert r["partition_key"] == pkey
        assert out["enqueued_ts"][i].value == enq
        assert out["ts"][i].value == t
        assert r["resource_id"] == RESOURCE_PREFIX + conv
        assert (r["category"], r["operation_name"]) == (role, tool)
        assert r["severity_number"] == AZURE_SEVERITY.get(level, 0)
        assert (r["turn_idx"], r["body"]) == (turn, text)
