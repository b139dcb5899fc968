"""cloudfoundry receiver analogue — loggregator v2 envelope dumps.

The reference registers the contrib ``cloudfoundryreceiver``
(/root/reference/internal/components/components.go:220), which streams
loggregator v2 ``Envelope`` batches from the RLP gateway.  The gateway
networking is out of scope; the capture is the envelope stream's JSON
shape (one envelope object per line): ``timestamp`` (STRING nanoseconds
— loggregator's proto3-JSON int64 mapping), ``source_id`` /
``instance_id``, a string→string ``tags`` map, and the message oneof:

- ``log``:     base64 ``payload``, ``type`` OUT | ERR
- ``counter``: ``name``, string-int ``delta`` / ``total`` (uint64 JSON)
- ``gauge``:   ``metrics``: name → {``unit``, ``value`` double}

Two conversions (the receiver emits logs AND metrics pipelines):

- :func:`envelopes_to_logs` — log envelopes → log records, OUT → Info
  (9) / ERR → Error (17) severity, payload decoded to body.
- :func:`envelopes_to_metrics` — counter envelopes → cumulative rows
  (delta + total), gauge envelopes exploded one row per named metric
  with its unit; ``type`` column distinguishes the families.

Both carry source/instance coordinates and the ``origin`` tag as
attribute columns; nanosecond wire timestamps → timestamp[us] columns.
"""

from __future__ import annotations

import base64
import glob
import json
import os

import pyarrow as pa

from .wire import cols_to_table

CF_SHARDS = 4

_LOGS_SCHEMA = pa.schema([
    ("ts", pa.timestamp("us")),
    ("source_id", pa.string()),
    ("instance_id", pa.string()),
    ("origin", pa.string()),
    ("body", pa.string()),
    ("log_type", pa.string()),
    ("severity_text", pa.string()),
    ("severity_number", pa.int8()),
])

_METRICS_SCHEMA = pa.schema([
    ("ts", pa.timestamp("us")),
    ("source_id", pa.string()),
    ("instance_id", pa.string()),
    ("origin", pa.string()),
    ("type", pa.string()),        # counter | gauge
    ("name", pa.string()),
    ("unit", pa.string()),        # gauges only ('' for counters)
    ("value", pa.float64()),      # gauge value
    ("delta", pa.int64()),        # counter arms (null for gauges)
    ("total", pa.int64()),
])

_SEV = {"OUT": ("Info", 9), "ERR": ("Error", 17)}


def encode_envelope(ts_ns: int, source_id: str, instance_id: str,
                    tags: "dict[str, str]", *, log: "dict | None" = None,
                    counter: "dict | None" = None,
                    gauge: "dict | None" = None) -> str:
    """One envelope line. ``timestamp`` and counter ``delta``/``total``
    are STRINGS — the proto3-JSON int64 mapping loggregator uses."""
    env: dict = {"timestamp": str(int(ts_ns)), "source_id": source_id,
                 "instance_id": instance_id, "tags": tags}
    if log is not None:
        env["log"] = {
            "payload": base64.b64encode(
                log["payload"].encode("utf-8")).decode("ascii"),
            "type": log["type"]}
    if counter is not None:
        env["counter"] = {"name": counter["name"],
                          "delta": str(int(counter["delta"])),
                          "total": str(int(counter["total"]))}
    if gauge is not None:
        env["gauge"] = {"metrics": {
            k: {"unit": v["unit"], "value": float(v["value"])}
            for k, v in gauge["metrics"].items()}}
    return json.dumps(env, ensure_ascii=False)


def _read_lines(staging_dir: str) -> "ray.data.Dataset":
    import ray.data

    files = sorted(glob.glob(os.path.join(staging_dir, "rlp-*.jsonl")))
    if not files:
        raise FileNotFoundError(
            f"no rlp-*.jsonl files under {staging_dir!r} — empty or "
            "mistyped staging dir")
    return ray.data.read_text(files)


def envelopes_to_logs(staging_dir: str) -> "ray.data.Dataset":
    """Log envelopes → log records (OUT → Info, ERR → Error)."""

    def decode(batch: dict) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in _LOGS_SCHEMA}
        for line in batch["text"]:
            env = json.loads(line)
            log = env.get("log")
            if log is None:
                continue
            sev_text, sev_num = _SEV[log.get("type", "OUT")]
            cols["ts"].append(int(env["timestamp"]) // 1000)
            cols["source_id"].append(env.get("source_id"))
            cols["instance_id"].append(env.get("instance_id"))
            cols["origin"].append((env.get("tags") or {}).get("origin"))
            cols["body"].append(
                base64.b64decode(log["payload"]).decode("utf-8"))
            cols["log_type"].append(log.get("type"))
            cols["severity_text"].append(sev_text)
            cols["severity_number"].append(sev_num)
        return cols_to_table(_LOGS_SCHEMA, cols)

    return _read_lines(staging_dir).map_batches(
        decode, batch_format="numpy")


def envelopes_to_metrics(staging_dir: str) -> "ray.data.Dataset":
    """Counter envelopes → cumulative rows; gauge envelopes → one row
    per named metric (the receiver's per-entry explode)."""

    def decode(batch: dict) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in _METRICS_SCHEMA}

        def base(env):
            cols["ts"].append(int(env["timestamp"]) // 1000)
            cols["source_id"].append(env.get("source_id"))
            cols["instance_id"].append(env.get("instance_id"))
            cols["origin"].append((env.get("tags") or {}).get("origin"))

        for line in batch["text"]:
            env = json.loads(line)
            c = env.get("counter")
            g = env.get("gauge")
            if c is not None:
                base(env)
                cols["type"].append("counter")
                cols["name"].append(c["name"])
                cols["unit"].append("")
                cols["value"].append(None)
                cols["delta"].append(int(c["delta"]))
                cols["total"].append(int(c["total"]))
            elif g is not None:
                for name in sorted(g.get("metrics") or {}):
                    m = g["metrics"][name]
                    base(env)
                    cols["type"].append("gauge")
                    cols["name"].append(name)
                    cols["unit"].append(m.get("unit", ""))
                    cols["value"].append(float(m["value"]))
                    cols["delta"].append(None)
                    cols["total"].append(None)
        return cols_to_table(_METRICS_SCHEMA, cols)

    return _read_lines(staging_dir).map_batches(
        decode, batch_format="numpy")
