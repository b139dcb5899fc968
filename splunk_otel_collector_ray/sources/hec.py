"""splunk_hec receiver analogue: HEC event JSONL → log records.

The reference's splunk_hec receiver accepts HEC event JSON over HTTP and
maps each object to a log record: ``event`` becomes the body,
fractional-second ``time`` becomes the record timestamp, the custom
``fields`` object is splatted into attributes, and the envelope
``host``/``source``/``sourcetype``/``index`` ride along as resource
attributes (internal/receiver/splunkhecreceiver request→plog mapping;
SURVEY.md §2.1). The batch analogue reads newline-delimited event JSON
with ``ray.data.read_json`` (Arrow-native JSONL blocks, no Python object
parse) and decodes vectorized per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def decode_hec_batch(batch: pa.Table) -> pa.Table:
    """One HEC event object per row → log-record columns.

    ``time`` round-trips exactly: staging emits the shortest repr of the
    double epoch-µs/1e6, and round(time·1e6) recovers the integer µs —
    the product is within 0.25 µs of an integer, so no rounding ties can
    occur on either engine or oracle side."""
    time_s = batch["time"].to_numpy(zero_copy_only=False)
    ts_us = np.round(time_s * 1e6).astype(np.int64)
    cols: dict[str, pa.Array] = {
        "ts": pa.array(ts_us, type=pa.timestamp("us")),
        "host": batch["host"],
        "source": batch["source"],
        "sourcetype": batch["sourcetype"],
        "index": batch["index"],
        "body": batch["event"],
    }
    fields = batch["fields"]
    if isinstance(fields, pa.ChunkedArray):
        fields = fields.combine_chunks()
    for i, f in enumerate(fields.type):
        cols[f.name] = fields.field(i)  # splat custom fields → attributes
    return pa.table(cols)


def read_hec_events(paths: "list[str] | str",
                    parallelism: int = -1) -> "ray.data.Dataset":
    import ray.data

    ds = ray.data.read_json(paths, override_num_blocks=parallelism
                            if parallelism > 0 else None)
    return ds.map_batches(decode_hec_batch, batch_format="pyarrow")
