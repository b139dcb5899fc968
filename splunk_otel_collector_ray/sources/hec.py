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
    double epoch-µs/1e6 (or the exporter a fixed 6-decimal string — HEC
    accepts both number and string epoch), and round(time·1e6) recovers
    the integer µs — the value is within 0.25 µs of an integer, so no
    rounding ties can occur on either engine or oracle side."""
    time_col = batch["time"]
    if pa.types.is_string(time_col.type) or \
            pa.types.is_large_string(time_col.type):
        time_col = time_col.cast(pa.float64())
    time_s = time_col.to_numpy(zero_copy_only=False)
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
        # splat custom fields → attributes; envelope names are reserved,
        # so a colliding field lands under fields.<name> instead of
        # silently replacing the envelope column
        name = f.name if f.name not in cols else f"fields.{f.name}"
        cols[name] = fields.field(i)
    return pa.table(cols)


def read_hec_events(paths: "list[str] | str",
                    parallelism: int = -1) -> "ray.data.Dataset":
    import ray.data

    ds = ray.data.read_json(paths, override_num_blocks=parallelism
                            if parallelism > 0 else None)
    return ds.map_batches(decode_hec_batch, batch_format="pyarrow")


def write_hec_events(ds: "ray.data.Dataset", out_dir: str) -> None:
    """splunk_hec EXPORTER analogue: log records → HEC event JSONL.

    Inverse of ``read_hec_events`` — builds the HEC envelope per batch
    (``event`` ← body text, fractional-second ``time`` ← ts, transcript
    identity into the custom ``fields`` object) and distributes the write
    with ``Dataset.write_json`` (one JSONL file per block — resumable,
    never one giant file). ``time`` is serialized as a fixed 6-decimal
    STRING: the HEC wire format accepts string epoch, and pandas to_json
    (Ray's JSON sink) caps double precision below µs-exactness — the
    string form round-trips every µs exactly.

    The staging dir is cleared first: Ray appends uniquely-named files, so
    re-running into an existing dir would double-count (r2 ADVICE).
    """
    import os
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def envelope(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if t["ts"].null_count:
            raise ValueError(
                "HEC envelope needs a time for every record — "
                f"{t['ts'].null_count} null ts rows reached write_hec_events"
            )  # a null would otherwise float-promote the µs array to NaN
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # sign handled explicitly: floor-div + zero-padded concat is only
        # a decimal rendering for NON-negative µs (-1 µs must serialize
        # as "-0.000001", not "-1.999999")
        a = np.abs(us)
        sec, frac = a // 1_000_000, a % 1_000_000
        time_str = np.char.add(
            np.char.add(np.where(us < 0, "-", "").astype("U1"),
                        np.char.add(sec.astype("U"), ".")),
            np.char.zfill(frac.astype("U"), 6))
        fields = pa.StructArray.from_arrays(
            [_chunkless(t["conv_id"]),
             _chunkless(t["turn_idx"].cast(pa.int64())),
             _chunkless(t["tool"])],
            ["conv_id", "turn_idx", "tool"])
        return pa.table({
            "time": pa.array(time_str, type=pa.string()),
            "host": t["conv_id"],
            "source": t["role"],
            "sourcetype": pa.array(np.full(n, "httpevent"), type=pa.string()),
            "index": pa.array(np.full(n, "main"), type=pa.string()),
            "event": t["text"],
            "fields": fields,
        })

    ds.map_batches(envelope, batch_format="pyarrow").write_json(out_dir)


def _chunkless(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
