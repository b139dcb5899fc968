"""influxdb receiver analogue: line-protocol field explode with the
protocol's typed value arms (the parity projection stringifies the bool
arm for the cross-runtime hash — the typed schema is pinned here)."""

import pyarrow as pa

from splunk_otel_collector_ray.stages.metrics import parse_influx_text


def _parse(lines):
    return parse_influx_text(pa.table({"text": pa.array(lines)}))


def test_influx_typed_arms_and_explode():
    t = _parse([
        'cpu,host=h0,region=r0 usage=0.5,count=3i,ok=true,note="hi"'
        ' 1767225600000000000',
        "mem usage=1.25",
        "disk,host=h1 free=-7i,active=FALSE",
    ])
    d = t.to_pydict()
    # one row per field, line columns repeated per field
    assert d["measurement"] == ["cpu", "cpu", "cpu", "cpu", "mem",
                                "disk", "disk"]
    assert d["field"] == ["usage", "count", "ok", "note", "usage",
                          "free", "active"]
    # exactly one typed arm non-null per row
    arms = list(zip(d["value_dbl"], d["value_int"], d["value_bool"],
                    d["value_str"]))
    assert all(sum(v is not None for v in row) == 1 for row in arms)
    assert d["value_int"][1] == 3 and d["value_int"][5] == -7
    assert d["value_bool"][2] is True and d["value_bool"][6] is False
    assert d["value_str"][3] == "hi"
    assert d["value_dbl"][0] == 0.5 and d["value_dbl"][4] == 1.25
    assert t.schema.field("value_bool").type == pa.bool_()
    assert t.schema.field("value_int").type == pa.int64()
    # ns → µs; timestampless lines → null (receiver stamps arrival)
    assert d["ts"][0] is not None and d["ts"][4] is None


def test_influx_malformed_dropped():
    t = _parse(["totally malformed line here",
                "no_fields_at_all",
                "ok usage=1"])
    assert t.num_rows == 1
    assert t["measurement"].to_pylist() == ["ok"]


def test_influx_bad_field_invalidates_line():
    """A field parse error drops the WHOLE line (protocol error
    semantics) — no phantom all-null-arm rows, even when the line's
    other fields are fine."""
    t = _parse(["m novalue 1767225600000000000",   # field without '='
                "m x=abc",                          # unquoted non-numeric
                "m w=",                             # empty value
                "m good=1,x=abc",                   # one bad field → line
                "ok usage=2.5,count=4i"])
    assert t["measurement"].to_pylist() == ["ok", "ok"]
    arms = t.select(["value_dbl", "value_int", "value_bool",
                     "value_str"]).to_pylist()
    assert all(sum(v is not None for v in r.values()) == 1 for r in arms)
