"""Prometheus remote-write wire codec: WriteRequest round trip, series
grouping, snappy framing."""

import numpy as np
import pyarrow as pa

from splunk_otel_collector_ray.sources.prw import (
    WriteRequest,
    decode_write_request,
    encode_write_request,
)


def _dp_table():
    return pa.table({
        "name": pa.array(["cpu", "cpu", "mem", "cpu"], type=pa.string()),
        "value": pa.array([1.5, 2.5, 3.0, 4.25], type=pa.float64()),
        "ts_ms": pa.array([1000, 2000, 1000, 3000], type=pa.int64()),
        "host": pa.array(["a", "a", "a", "b"], type=pa.string()),
    })


def test_prw_roundtrip_and_series_grouping():
    data = encode_write_request(_dp_table(), label_cols=("host",))
    msg = WriteRequest()
    msg.ParseFromString(data)
    # (cpu,a), (mem,a), (cpu,b) → 3 series; (cpu,a) holds 2 samples
    assert len(msg.timeseries) == 3
    by_labels = {tuple(sorted((l.name, l.value) for l in s.labels)):
                 [(p.value, p.timestamp) for p in s.samples]
                 for s in msg.timeseries}
    assert by_labels[(("__name__", "cpu"), ("host", "a"))] == [
        (1.5, 1000), (2.5, 2000)]

    out = decode_write_request(data).to_pandas().sort_values(
        ["name", "ts_ms"]).reset_index(drop=True)
    assert len(out) == 4
    assert out["value"].tolist() == [1.5, 2.5, 4.25, 3.0]
    assert all(dict(kv)["host"] in ("a", "b") for kv in out["labels"])


def test_prw_double_precision_exact():
    vals = np.array([0.1, 1e300, -1e-300, 2**53 + 1.0])
    t = pa.table({
        "name": pa.array(["m"] * 4), "value": pa.array(vals),
        "ts_ms": pa.array([1, 2, 3, 4], type=pa.int64()),
    })
    out = decode_write_request(encode_write_request(t))
    got = np.sort(out["value"].to_numpy())
    assert (got == np.sort(vals)).all()  # IEEE doubles bit-exact
