"""zipkinreceiver analogue: v2 span-array decode — id canonicalization,
root-span parent nulls, trace-chain integrity over the staged corpus."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources.zipkin import (
    _OUT_SCHEMA,
    _cols_to_table,
    decode_spans,
    encode_span,
    read_zipkin_dump,
)


def _decode(spans):
    cols = {f.name: [] for f in _OUT_SCHEMA}
    decode_spans(spans, cols)
    return _cols_to_table(cols)


def test_zipkin_decode_unit():
    spans = [
        encode_span("00AB" + "0" * 28, "00000000000000FF", None, "op",
                    "CLIENT", "svc", 1_700_000_000_000_000, 42,
                    {"conv_id": "c", "turn_idx": "0"}),
        encode_span("00ab" + "0" * 28, "0000000000000100",
                    "00000000000000FF", "op2", "SERVER", "svc",
                    1_700_000_000_000_001, 7, {}),
    ]
    t = _decode(spans)
    assert t.schema == _OUT_SCHEMA
    # ids canonicalize to lowercase; parentId absent → null
    assert t["trace_id"].to_pylist() == ["00ab" + "0" * 28] * 2
    assert t["parent_id"].to_pylist() == [None, "00000000000000ff"]
    # exact-µs timestamps (no truncation on the Zipkin wire)
    assert t["ts"].cast(pa.int64()).to_pylist() == [
        1_700_000_000_000_000, 1_700_000_000_000_001]
    # missing tags → null splat columns
    assert t["conv_id"].to_pylist() == ["c", None]


def test_zipkin_optional_timestamp():
    """timestamp is optional in the v2 model → null ts, not a crash."""
    sp = encode_span("ab" * 16, "cd" * 8, None, "op", "CLIENT", "svc",
                     1, 2, {})
    del sp["timestamp"]
    t = _decode([sp])
    assert t["ts"].to_pylist() == [None]


def test_zipkin_dump_chain(ray_session, sf_dir):
    path = corpus.ensure_zipkin_dump(sf_dir)
    # each staged file is one POST body: a bare JSON array
    first = sorted(f for f in os.listdir(path) if f.endswith(".json"))[0]
    with open(os.path.join(path, first)) as f:
        body = json.load(f)
    assert isinstance(body, list) and "traceId" in body[0]

    ds = read_zipkin_dump(path)
    df = ds.to_pandas()
    assert len(df) == corpus.n_turns_for(corpus.sf_name(sf_dir))
    # exactly one root (null parent) per trace, and every non-root's
    # parent exists within its own trace — the conversation chain
    roots = df[df["parent_id"].isna()]
    assert roots.groupby("trace_id").size().eq(1).all()
    assert len(roots) == df["trace_id"].nunique()
    child = df[df["parent_id"].notna()]
    ids = set(zip(df["trace_id"], df["span_id"]))
    assert all((tr, p) in ids
               for tr, p in zip(child["trace_id"], child["parent_id"]))
    # kind is total over the role domain
    assert set(df["kind"].unique()) <= {
        "CLIENT", "SERVER", "PRODUCER", "CONSUMER"}
    assert df["duration_us"].ge(0).all()
