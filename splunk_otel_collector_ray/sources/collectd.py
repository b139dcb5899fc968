"""collectd receiver analogue: write_http JSON value-lists → datapoints.

The reference registers the upstream collectd receiver
(/root/reference/internal/components/components.go:221), which accepts
collectd's write_http JSON — an array of value-list records
``{values, dstypes, dsnames, time, interval, host, plugin,
plugin_instance, type, type_instance}`` — and converts each value to one
datapoint with the SignalFx naming convention (upstream
collectdreceiver, public opentelemetry-collector-contrib):

- metric name = ``type`` [``.type_instance``] [``.dsname`` iff the record
  carries more than one ds and the dsname is nonempty];
- dimensions: ``plugin``, ``plugin_instance``, ``host``, plus ``dsname``
  when it was NOT folded into the name;
- bracket metadata ``x[k=v,k2=v2]`` embedded in type_instance /
  plugin_instance / host is stripped from the value and emitted as extra
  labels (the SignalFx "metadata in names" convention);
- dstypes ``derive``/``counter`` → cumulative sums, ``gauge`` (and any
  unknown dstype, the upstream default) → gauge;
- fractional-second ``time`` → the datapoint timestamp.

Batch analogue: one record object per JSONL row via ``ray.data.read_json``
(Arrow-native blocks), then a fully vectorized decode — list-flatten for
the per-ds expansion, one ``extract_regex`` pass per bracket field, no
per-record Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_BRACKET_RX = r"^(?P<pre>[^\[]*)\[(?P<lab>[^\]]*)\](?P<post>.*)$"
_CUMULATIVE = ("derive", "counter")


def _strip_bracket_labels(arr: pa.ChunkedArray | pa.Array):
    """name[k=v,...] → (name with the bracket group removed, label string).
    Non-bracketed values pass through with an empty label string."""
    arr = pc.fill_null(arr, "")
    ex = pc.extract_regex(arr, _BRACKET_RX)
    m = pc.is_valid(ex)
    stripped = pc.if_else(
        m,
        pc.binary_join_element_wise(pc.struct_field(ex, "pre"),
                                    pc.struct_field(ex, "post"), ""),
        arr)
    labs = pc.if_else(m, pc.struct_field(ex, "lab"), pa.scalar(""))
    return stripped, labs


def decode_collectd_batch(batch: pa.Table) -> pa.Table:
    """One collectd value-list record per row → one datapoint row per
    (record, ds index)."""
    vals = batch["values"]
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    n_ds = pc.list_value_length(vals).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    rep = np.repeat(np.arange(batch.num_rows), n_ds)
    take = pa.array(rep)

    value = pc.list_flatten(vals).cast(pa.float64())
    dsname = pd.Series(
        pc.fill_null(pc.list_flatten(batch["dsnames"]), "").to_pandas())
    dstype = pc.fill_null(pc.list_flatten(batch["dstypes"]), "") \
        .to_numpy(zero_copy_only=False)

    ti_stripped, ti_lab = _strip_bracket_labels(batch["type_instance"])
    pi_stripped, pi_lab = _strip_bracket_labels(batch["plugin_instance"])
    host_stripped, host_lab = _strip_bracket_labels(batch["host"])

    typ = pd.Series(pc.fill_null(batch["type"], "").take(take).to_pandas())
    ti = pd.Series(ti_stripped.take(take).to_pandas())
    used_ds = (np.repeat(n_ds, n_ds) > 1) & (dsname != "")
    name = (typ + ("." + ti).where(ti != "", "")
            + ("." + dsname).where(used_ds, ""))

    # label string: nonempty bracket groups joined in (type_instance,
    # plugin_instance, host) order — vectorized conditional-comma concat
    labels = pd.Series(ti_lab.take(take).to_pandas())
    for part in (pd.Series(pi_lab.take(take).to_pandas()),
                 pd.Series(host_lab.take(take).to_pandas())):
        sep = pd.Series(np.where((labels != "") & (part != ""), ",", ""))
        labels = labels + sep + part

    mtype = np.where(np.isin(dstype, _CUMULATIVE), "cumulative", "gauge")
    time_s = batch["time"].cast(pa.float64()).take(take) \
        .to_numpy(zero_copy_only=False)
    ts_us = np.round(time_s * 1e6).astype(np.int64)

    return pa.table({
        "name": pa.array(name, type=pa.string()),
        "value": value,
        "mtype": pa.array(mtype, type=pa.string()),
        "ts": pa.array(ts_us, type=pa.timestamp("us")),
        "plugin": pc.fill_null(batch["plugin"], "").take(take),
        "plugin_instance": pi_stripped.take(take),
        "host": host_stripped.take(take),
        "dsname": pa.array(dsname.where(~used_ds, ""), type=pa.string()),
        "labels": pa.array(labels, type=pa.string()),
    })


def read_collectd_json(paths: "list[str] | str",
                       parallelism: int = -1) -> "ray.data.Dataset":
    import ray.data

    ds = ray.data.read_json(paths, override_num_blocks=parallelism
                            if parallelism > 0 else None)
    return ds.map_batches(decode_collectd_batch, batch_format="pyarrow")
