"""k8s_events / k8sobjects receiver analogues — API watch-stream dumps.

The reference registers both contrib receivers
(/root/reference/internal/components/components.go:239,240).  Their
transport is a Kubernetes API WATCH — out of scope for a batch engine,
so the capture is the watch stream's own wire shape: one JSON line per
watch event, ``{"type": "ADDED"|"MODIFIED"|..., "object": {…}}``, the
exact framing ``kubectl get --watch -o json`` / the API's
``watch=true`` chunked response emits.

Two conversions over the same staged stream:

- :func:`events_to_logs` — the k8seventsreceiver mapping of a corev1
  ``Event`` object to one log record: body = ``message``, severity from
  the event ``type`` (Normal → Info/9, Warning → Warn/13), timestamp
  from ``eventTime`` (MicroTime, µs-exact), and the
  reason/count/involvedObject/source fields surfaced as attribute
  columns.
- :func:`objects_to_rows` — the k8sobjectsreceiver's generic
  object-as-log-record view: watch type + apiVersion/kind/metadata
  coordinates per object, no Event-specific fields.

Decode is the JSON codec edge (like the collectd/pubsub receivers);
everything downstream is Arrow columns.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from .wire import cols_to_table

K8SEVENTS_SHARDS = 4

# k8seventsreceiver severity mapping: Normal → Info, Warning → Warn
_SEVERITY = {"Normal": ("Info", 9), "Warning": ("Warn", 13)}

_EVENTS_SCHEMA = pa.schema([
    ("ts", pa.timestamp("us")),
    ("severity_text", pa.string()),
    ("severity_number", pa.int8()),
    ("body", pa.string()),
    ("reason", pa.string()),
    ("count", pa.int64()),
    ("event_name", pa.string()),
    ("event_uid", pa.string()),
    ("namespace", pa.string()),
    ("object_kind", pa.string()),
    ("object_name", pa.string()),
    ("object_uid", pa.string()),
    ("component", pa.string()),
    ("host", pa.string()),
])

_OBJECTS_SCHEMA = pa.schema([
    ("watch_type", pa.string()),
    ("api_version", pa.string()),
    ("kind", pa.string()),
    ("name", pa.string()),
    ("namespace", pa.string()),
    ("uid", pa.string()),
    ("resource_version", pa.string()),
])


def encode_watch_line(watch_type: str, event: dict) -> str:
    """One watch-stream line (the API's ``watch=true`` framing)."""
    return json.dumps({"type": watch_type, "object": event},
                      ensure_ascii=False)


def _iso_to_us(s: str) -> int:
    """RFC3339 timestamp → epoch µs. Accepts both the µs-fraction
    MicroTime shape (eventTime) and the fraction-less metav1.Time shape
    (first/lastTimestamp serialize with second precision)."""
    import datetime

    fmt = ("%Y-%m-%dT%H:%M:%S.%fZ" if "." in s
           else "%Y-%m-%dT%H:%M:%SZ")
    dt = datetime.datetime.strptime(s, fmt)
    return int(dt.replace(tzinfo=datetime.timezone.utc).timestamp()
               ) * 1_000_000 + dt.microsecond


def _read_lines(staging_dir: str) -> "ray.data.Dataset":
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(staging_dir, "watch-*.jsonl")))
    if not files:
        raise FileNotFoundError(
            f"no watch-*.jsonl files under {staging_dir!r} — empty or "
            "mistyped staging dir")
    return ray.data.read_text(files)


def events_to_logs(staging_dir: str) -> "ray.data.Dataset":
    """k8seventsreceiver conversion: Event objects → log-record rows."""

    def decode(batch: dict) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in _EVENTS_SCHEMA}
        for line in batch["text"]:
            obj = json.loads(line)["object"]
            if obj.get("kind") != "Event":
                continue
            sev_text, sev_num = _SEVERITY.get(
                obj.get("type", "Normal"), ("Info", 9))
            meta = obj.get("metadata") or {}
            inv = obj.get("involvedObject") or {}
            src = obj.get("source") or {}
            # eventTime is OPTIONAL on corev1 Event — real kubelet
            # events often carry only last/firstTimestamp; fall back
            # down the chain, null when none is present
            t = (obj.get("eventTime") or obj.get("lastTimestamp")
                 or obj.get("firstTimestamp"))
            cols["ts"].append(_iso_to_us(t) if t else None)
            cols["severity_text"].append(sev_text)
            cols["severity_number"].append(sev_num)
            cols["body"].append(obj.get("message"))
            cols["reason"].append(obj.get("reason"))
            cols["count"].append(obj.get("count"))
            cols["event_name"].append(meta.get("name"))
            cols["event_uid"].append(meta.get("uid"))
            cols["namespace"].append(inv.get("namespace"))
            cols["object_kind"].append(inv.get("kind"))
            cols["object_name"].append(inv.get("name"))
            cols["object_uid"].append(inv.get("uid"))
            cols["component"].append(src.get("component"))
            cols["host"].append(src.get("host"))
        return cols_to_table(_EVENTS_SCHEMA, cols)

    return _read_lines(staging_dir).map_batches(
        decode, batch_format="numpy")


def objects_to_rows(staging_dir: str) -> "ray.data.Dataset":
    """k8sobjectsreceiver view: every watched object's coordinates, with
    the watch type — kind-agnostic (an Event is just another object)."""

    def decode(batch: dict) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in _OBJECTS_SCHEMA}
        for line in batch["text"]:
            env = json.loads(line)
            obj = env["object"]
            meta = obj.get("metadata") or {}
            cols["watch_type"].append(env.get("type"))
            cols["api_version"].append(obj.get("apiVersion"))
            cols["kind"].append(obj.get("kind"))
            cols["name"].append(meta.get("name"))
            cols["namespace"].append(meta.get("namespace"))
            cols["uid"].append(meta.get("uid"))
            cols["resource_version"].append(meta.get("resourceVersion"))
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in _OBJECTS_SCHEMA],
            schema=_OBJECTS_SCHEMA)

    return _read_lines(staging_dir).map_batches(
        decode, batch_format="numpy")
