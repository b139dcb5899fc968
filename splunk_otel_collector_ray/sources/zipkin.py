"""Zipkin JSON v2 receiver — span-array POST bodies → trace-span rows.

The reference registers the contrib ``zipkinreceiver``
(components.go:135), whose wire is the public Zipkin v2 span model: a
``POST /api/v2/spans`` body holding one JSON ARRAY of span objects with
hex ``traceId``/``id``/``parentId``, lowercase-hex canonical ids,
``kind`` ∈ {CLIENT, SERVER, PRODUCER, CONSUMER}, MICROSECOND
``timestamp``/``duration`` (unlike SignalFx's ms wire), a
``localEndpoint.serviceName`` and string→string ``tags``.

Engine mapping: :func:`read_zipkin_dump` reads staged request bodies
(``spans-*.json``, one array per file — one POST per file, the otlp_pb
staging shape) and decodes every span to a row; the known tag keys
splat to string columns like the pubsub attribute splat. parentId is
absent on root spans → null column values.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa

from .wire import cols_to_table

ZIPKIN_SHARDS = 4
TAG_KEYS = ("conv_id", "turn_idx")
_OUT_SCHEMA = pa.schema([
    ("trace_id", pa.string()),
    ("span_id", pa.string()),
    ("parent_id", pa.string()),
    ("name", pa.string()),
    ("kind", pa.string()),
    ("service", pa.string()),
    ("ts", pa.timestamp("us")),
    ("duration_us", pa.int64()),
] + [(k, pa.string()) for k in TAG_KEYS])


def encode_span(trace_id: str, span_id: str, parent_id: "str | None",
                name: str, kind: str, service: str, ts_us: int,
                duration_us: int, tags: "dict[str, str]") -> dict:
    """One Zipkin v2 span object (public JSON field names)."""
    span = {
        "traceId": trace_id, "id": span_id, "name": name, "kind": kind,
        "timestamp": int(ts_us), "duration": int(duration_us),
        "localEndpoint": {"serviceName": service}, "tags": tags,
    }
    if parent_id is not None:
        span["parentId"] = parent_id
    return span


def decode_spans(body: "list[dict]", cols: "dict[str, list]") -> None:
    """One request body (span array) → column lists. Ids canonicalize
    to lowercase hex (the receiver's normalization); per-span Python is
    the codec edge, like the OTLP/fluent/sfx decoders."""
    for s in body:
        cols["trace_id"].append(s["traceId"].lower())
        cols["span_id"].append(s["id"].lower())
        p = s.get("parentId")
        cols["parent_id"].append(p.lower() if p is not None else None)
        cols["name"].append(s.get("name"))
        cols["kind"].append(s.get("kind"))
        ep = s.get("localEndpoint") or {}
        cols["service"].append(ep.get("serviceName"))
        # timestamp is optional in the v2 model (shared-span/clock-less
        # instrumentation) → null ts, like every other optional field
        cols["ts"].append(s.get("timestamp"))
        cols["duration_us"].append(s.get("duration"))
        tags = s.get("tags") or {}
        for k in TAG_KEYS:
            cols[k].append(tags.get(k))


def _cols_to_table(cols: "dict[str, list]") -> pa.Table:
    return cols_to_table(_OUT_SCHEMA, cols)


def read_zipkin_dump(staging_dir: str) -> "ray.data.Dataset":
    """Receiver analogue: staged ``spans-*.json`` POST bodies → one row
    per span (engine schema above)."""
    import ray.data

    files = sorted(glob.glob(os.path.join(staging_dir, "spans-*.json")))
    if not files:
        raise FileNotFoundError(
            f"no spans-*.json request files under {staging_dir!r} — "
            "empty or mistyped staging dir")

    def decode(batch: dict) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in _OUT_SCHEMA}
        for raw in batch["bytes"]:
            decode_spans(json.loads(bytes(raw).decode("utf-8")), cols)
        return _cols_to_table(cols)

    return ray.data.read_binary_files(files).map_batches(
        decode, batch_format="numpy")
