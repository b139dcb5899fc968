"""awscloudwatch receiver analogue — Logs API event dumps → log records.

The reference registers the contrib ``awscloudwatchreceiver``
(/root/reference/internal/components/components.go:211), whose logs
mode polls ``FilterLogEvents`` per discovered log group/stream and
emits each event as a log record.  The API polling is out of scope; the
capture is the response's event shape — one JSON line per event with
the group riding the file path (the poller's per-group fan-out):

  {"timestamp": <ms>, "message": "...", "logStreamName": "...",
   "eventId": "...", "ingestionTime": <ms>}

Decode surfaces the receiver's attribute scheme: the group/stream
coordinates, the event id, millisecond event and ingestion timestamps
(→ timestamp[us] columns), message as body.  File layout is one
``events-<group-slug>-<shard>.jsonl`` per (group, shard) —
line-splittable for the read, group recovered from the slug.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa

from .wire import cols_to_table

CLOUDWATCH_SHARDS = 4

_OUT_SCHEMA = pa.schema([
    ("ts", pa.timestamp("us")),
    ("ingestion_ts", pa.timestamp("us")),
    ("log_group", pa.string()),
    ("log_stream", pa.string()),
    ("event_id", pa.string()),
    ("body", pa.string()),
])


def group_slug(group: str) -> str:
    """Log-group name → filename slug (path separators flattened).

    The slug is only reversible for the dot-free, leading-slash group
    names this dump layout supports (dots are legal in CloudWatch group
    names but would decode back as separators) — refuse anything else
    up front instead of silently mis-attributing events on read."""
    if not group.startswith("/") or "." in group:
        raise ValueError(
            f"unsupported log-group name {group!r}: the dump layout "
            "requires a leading '/' and dot-free path segments")
    return group.strip("/").replace("/", ".")


def encode_event(ts_ms: int, message: str, stream: str, event_id: str,
                 ingestion_ms: int) -> str:
    return json.dumps({"timestamp": int(ts_ms), "message": message,
                       "logStreamName": stream, "eventId": event_id,
                       "ingestionTime": int(ingestion_ms)},
                      ensure_ascii=False)


def read_cloudwatch_dump(staging_dir: str) -> "ray.data.Dataset":
    """Per-group event dumps → one row per log event."""
    import ray.data

    files = sorted(glob.glob(os.path.join(staging_dir, "events-*.jsonl")))
    if not files:
        raise FileNotFoundError(
            f"no events-*.jsonl files under {staging_dir!r} — empty or "
            "mistyped staging dir")

    def decode(batch: dict) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in _OUT_SCHEMA}
        for path, line in zip(batch["path"], batch["text"]):
            base = os.path.basename(str(path))
            # events-<group-slug>-<shard>.jsonl → /group/slug/parts
            slug = base[len("events-"):base.rfind("-")]
            group = "/" + slug.replace(".", "/")
            ev = json.loads(line)
            cols["ts"].append(ev["timestamp"] * 1000)
            cols["ingestion_ts"].append(ev["ingestionTime"] * 1000)
            cols["log_group"].append(group)
            cols["log_stream"].append(ev.get("logStreamName"))
            cols["event_id"].append(ev.get("eventId"))
            cols["body"].append(ev.get("message"))
        return cols_to_table(_OUT_SCHEMA, cols)

    return ray.data.read_text(files, include_paths=True).map_batches(
        decode, batch_format="numpy")
