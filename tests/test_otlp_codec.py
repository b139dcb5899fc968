"""OTLP/JSON codec properties (no Ray): arbitrary record batches must
round-trip encode_logs_request → decode_logs_request exactly."""

import json

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from splunk_otel_collector_ray.sources.otlp import (
    RESOURCE_COLS,
    decode_logs_request,
    encode_logs_request,
)

# proto3-JSON defaults are omitted on the wire, so "" and 0 are the
# canonical absent values the decoder restores — generate within that
# contract (the engine schema never carries null conv_id/role/etc.)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40)


@st.composite
def record_tables(draw):
    n = draw(st.integers(min_value=1, max_value=8))

    def col(strategy):
        return [draw(strategy) for _ in range(n)]

    # 0 is excluded: time_unix_nano == 0 means UNSET on the OTLP wire
    # (proto3 default) and decodes as None — pinned separately below
    ts = col(st.one_of(st.none(), st.integers(1, 2**53)))
    obs = col(st.integers(1, 2**53))
    attrs = col(st.lists(
        st.tuples(st.text(min_size=1, max_size=8).filter(
            lambda k: k not in ("conv_id", "turn_idx", "role", "tool",
                                "log_format", "span_id")), _text),
        max_size=3, unique_by=lambda kv: kv[0]))
    return pa.table({
        "conv_id": pa.array(col(st.text(min_size=1, max_size=20)),
                            type=pa.string()),
        # unique per batch — the comparison below keys rows on
        # (conv_id, turn_idx)
        "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
        "role": pa.array(col(st.sampled_from(["user", "assistant", "tool"])),
                         type=pa.string()),
        "tool": pa.array(col(_text), type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "observed_ts": pa.array(obs, type=pa.timestamp("us")),
        "log_format": pa.array(col(_text), type=pa.string()),
        "body": pa.array(col(st.one_of(st.none(), _text)),
                         type=pa.string()),
        "severity_text": pa.array(col(_text), type=pa.string()),
        "severity_number": pa.array(col(st.integers(0, 24)),
                                    type=pa.int8()),
        "attributes": pa.array(attrs, type=pa.map_(pa.string(),
                                                   pa.string())),
        "span_id": pa.array(col(_text), type=pa.string()),
        **{c: pa.array(col(_text), type=pa.string())
           for c in RESOURCE_COLS},
    })


@settings(max_examples=60, deadline=None)
@given(record_tables())
def test_otlp_roundtrip_property(t):
    req = json.loads(json.dumps(encode_logs_request(t)))  # via real JSON
    rows = decode_logs_request(req)
    assert len(rows) == t.num_rows
    # records may regroup under resource identities — compare as multisets
    # keyed by (conv_id, turn_idx)
    got = {(r["conv_id"], r["turn_idx"]): r for r in rows}
    orig = t.to_pylist()
    assert len(got) == len({(r["conv_id"], r["turn_idx"]) for r in orig})
    for r in orig:
        g = got[(r["conv_id"], r["turn_idx"])]
        for c in ("role", "severity_number", "body"):
            assert g[c] == r[c], c
        # "" and proto3-default omission collapse together by contract
        for c in ("tool", "log_format", "span_id", "severity_text",
                  *RESOURCE_COLS):
            assert g[c] == (r[c] or ""), c
        ts_us = r["ts"]
        exp = None if ts_us is None else int(ts_us.timestamp() * 1e6) \
            if hasattr(ts_us, "timestamp") else ts_us
        # pyarrow to_pylist gives datetime; compare via re-encode instead
        assert (g["ts"] is None) == (ts_us is None)
        assert sorted(g["attributes"]) == sorted(
            [(k, v) for k, v in (r["attributes"] or [])])


@settings(max_examples=25, deadline=None)
@given(record_tables())
def test_otlp_pb_binary_equals_json_mapping(t):
    """The binary protobuf form must carry exactly what the JSON mapping
    carries: dict → ParseDict → SerializeToString → ParseFromString →
    MessageToDict → identical decoded rows. This cross-validates the
    hand-written JSON mapping against the official protobuf runtime."""
    from splunk_otel_collector_ray.sources.otlp_pb import (
        pb_to_request_dict,
        request_dict_to_pb,
    )

    req = encode_logs_request(t)
    rows_json = decode_logs_request(json.loads(json.dumps(req)))
    rows_pb = decode_logs_request(
        pb_to_request_dict(request_dict_to_pb(req)))
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    assert sorted(rows_pb, key=key) == sorted(rows_json, key=key)


def test_otlp_timestamp_exact_microseconds():
    t = pa.table({
        "conv_id": pa.array(["c"], type=pa.string()),
        "turn_idx": pa.array([1], type=pa.int32()),
        "role": pa.array(["user"], type=pa.string()),
        "tool": pa.array([""], type=pa.string()),
        "ts": pa.array([123456789012345], type=pa.timestamp("us")),
        "observed_ts": pa.array([987654321098765],
                                type=pa.timestamp("us")),
        "log_format": pa.array([""], type=pa.string()),
        "body": pa.array(["x"], type=pa.string()),
        "severity_text": pa.array([""], type=pa.string()),
        "severity_number": pa.array([0], type=pa.int8()),
        "attributes": pa.array([[]], type=pa.map_(pa.string(),
                                                  pa.string())),
        "span_id": pa.array([""], type=pa.string()),
        **{c: pa.array([""], type=pa.string()) for c in RESOURCE_COLS},
    })
    req = encode_logs_request(t)
    rec = req["resourceLogs"][0]["scopeLogs"][0]["logRecords"][0]
    assert rec["timeUnixNano"] == str(123456789012345 * 1000)
    row = decode_logs_request(req)[0]
    assert row["ts"] == 123456789012345
    assert row["observed_ts"] == 987654321098765

    # epoch-0 = unset on the wire (proto3 default): omitted, decodes None
    t0 = t.set_column(t.column_names.index("ts"), "ts",
                      pa.array([0], type=pa.timestamp("us")))
    req0 = encode_logs_request(t0)
    rec0 = req0["resourceLogs"][0]["scopeLogs"][0]["logRecords"][0]
    assert "timeUnixNano" not in rec0
    assert decode_logs_request(req0)[0]["ts"] is None
