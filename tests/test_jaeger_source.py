"""jaegerreceiver analogue: api_v2 PostSpansRequest codec — hypothesis
roundtrip over the span value domain, batch-Process precedence, and
trace-chain integrity over the staged corpus."""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources.jaeger import (
    _OUT_SCHEMA,
    PostSpansRequest,
    _cols_to_table,
    decode_batch,
    encode_batch,
    read_jaeger_dump,
    write_jaeger_dump,
)


def _decode(data: bytes):
    cols = {f.name: [] for f in _OUT_SCHEMA}
    decode_batch(data, cols)
    return cols


_hex16 = st.integers(min_value=0, max_value=2 ** 127).map(
    lambda n: f"{n:032x}")
_hex8 = st.integers(min_value=0, max_value=2 ** 63).map(
    lambda n: f"{n:016x}")
_span = st.builds(
    lambda tr, sid, parent, op, kind, ts, dur, conv, turn: {
        "trace_id": tr, "span_id": sid, "parent_id": parent,
        "operation": op, "span_kind": kind, "ts_us": ts,
        "duration_us": dur, "conv_id": conv, "turn_idx": turn},
    _hex16, _hex8, st.one_of(st.none(), _hex8),
    st.text(max_size=30),
    st.one_of(st.none(),
              st.sampled_from(["client", "server", "producer",
                               "consumer", "internal"])),
    st.integers(min_value=0, max_value=2 ** 62),
    st.integers(min_value=0, max_value=2 ** 62),
    st.one_of(st.none(), st.text(max_size=20)),
    st.one_of(st.none(), st.text(max_size=8)),
)


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=20), st.lists(_span, max_size=6))
def test_jaeger_batch_roundtrip_property(service, spans):
    """encode∘decode is the identity: hex ids (arbitrary 128/64-bit),
    optional CHILD_OF parent, unicode operations, exact µs times, the
    batch-level service inherited by every span."""
    cols = _decode(encode_batch(service, spans))
    assert len(cols["span_id"]) == len(spans)
    for i, r in enumerate(spans):
        assert cols["trace_id"][i] == r["trace_id"]
        assert cols["span_id"][i] == r["span_id"]
        assert cols["parent_id"][i] == r["parent_id"]
        assert cols["operation"][i] == r["operation"]
        assert cols["span_kind"][i] == r["span_kind"]
        assert cols["service"][i] == service
        assert cols["ts"][i] == r["ts_us"]
        assert cols["duration_us"][i] == r["duration_us"]
        assert cols["conv_id"][i] == r["conv_id"]
        assert cols["turn_idx"][i] == r["turn_idx"]


def test_jaeger_span_process_overrides_batch():
    """Span.process takes precedence over Batch.process when set (the
    model's per-span override)."""
    data = encode_batch("batch-svc", [
        {"trace_id": "ab" * 16, "span_id": "cd" * 8, "parent_id": None,
         "operation": "op", "span_kind": None, "ts_us": 1,
         "duration_us": 2, "conv_id": None, "turn_idx": None}])
    req = PostSpansRequest()
    req.ParseFromString(data)
    req.batch.spans[0].process.service_name = "span-svc"
    cols = _decode(req.SerializeToString())
    assert cols["service"] == ["span-svc"]
    # and FOLLOWS_FROM references never surface as parent_id
    req2 = PostSpansRequest()
    req2.ParseFromString(data)
    ref = req2.batch.spans[0].references.add()
    ref.trace_id = bytes(16)
    ref.span_id = bytes(8)
    ref.ref_type = 1  # FOLLOWS_FROM
    cols = _decode(req2.SerializeToString())
    assert cols["parent_id"] == [None]


def test_jaeger_null_service_roundtrip():
    """A request with no Batch.process decodes to service=None; the
    writer must accept that shape back (no-Process batch, stable
    mixed-with-named-service sort)."""
    data = encode_batch(None, [
        {"trace_id": "ab" * 16, "span_id": "cd" * 8, "parent_id": None,
         "operation": "op", "span_kind": None, "ts_us": 5,
         "duration_us": 6, "conv_id": None, "turn_idx": None}])
    cols = _decode(data)
    assert cols["service"] == [None]
    req = PostSpansRequest()
    req.ParseFromString(data)
    assert not req.batch.HasField("process")


def test_jaeger_dump_chain(ray_session, sf_dir, tmp_path):
    path = corpus.ensure_jaeger_dump(sf_dir)
    ds = read_jaeger_dump(path)
    df = ds.to_pandas()
    assert len(df) == corpus.n_turns_for(corpus.sf_name(sf_dir))
    # one root per trace, parents resolve within the trace
    roots = df[df["parent_id"].isna()]
    assert len(roots) == df["trace_id"].nunique()
    ids = set(zip(df["trace_id"], df["span_id"]))
    child = df[df["parent_id"].notna()]
    assert all((tr, p) in ids
               for tr, p in zip(child["trace_id"], child["parent_id"]))
    # the staged batches are service-pure: service == chat-<kind-role>
    assert (df["service"] == "chat-" + df["span_kind"].map(
        {"client": "user", "server": "assistant", "producer": "tool",
         "consumer": "system"})).all()

    # writer splits mixed-service blocks; re-export decodes identically
    out = str(tmp_path / "jg_rt")
    n = write_jaeger_dump(ds, out)
    assert n == len(df)
    df2 = read_jaeger_dump(out).to_pandas()
    key = ["trace_id", "span_id"]
    a = df.sort_values(key).reset_index(drop=True)
    b = df2.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
