"""Shared wire-format helpers for the queue-transport dump codecs
(kafka/pubsub/eventhub/pulsar) — one copy of the RFC3339 formatter and
the envelope-explode primitives so the dump formats can't silently
drift apart."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def iso_us(us: int) -> str:
    """Epoch microseconds → RFC3339 with exact-µs fraction — the wire
    timestamp format every queue dump in this package emits."""
    import datetime

    dt = (datetime.datetime(1970, 1, 1)
          + datetime.timedelta(microseconds=int(us)))
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + ".%06dZ" % dt.microsecond


def combined(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    return (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col)


def repeat_per(col: "pa.ChunkedArray | pa.Array",
               counts: np.ndarray) -> pa.Array:
    """Replicate an envelope-level column once per exploded inner record
    (one ``take`` over a ``np.repeat`` index — no Python loop)."""
    arr = combined(col)
    return arr.take(pa.array(np.repeat(np.arange(len(arr)), counts)))


def next_state_subdir(root: str, prefix: str) -> str:
    """Next append-slot path for a resume-state directory (``<root>/
    <prefix>-0000``, ``-0001``, …) — the shared numbering rule for the
    queue sources' cluster-written ack/settle stores, so the resume
    stores can't drift apart either."""
    import os

    os.makedirs(root, exist_ok=True)
    part = 0
    while True:
        p = os.path.join(root, f"{prefix}-{part:04d}")
        try:
            os.makedirs(p)  # atomic claim — exists-then-return would let
            return p        # two concurrent writers share one slot
        except FileExistsError:
            part += 1


def has_parquet(path: "str | None") -> bool:
    """True when ``path`` is a directory holding at least one parquet
    file — the guard every queue source applies before anti-joining a
    possibly-empty resume store."""
    import os

    return bool(path) and os.path.isdir(path) and any(
        f.endswith(".parquet")
        for _, _, fs in os.walk(path) for f in fs)


def ts_us(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """ISO8601 string column → ``timestamp[us]``; passes through columns
    the JSON reader already inferred. Handles any fraction width and
    zone form (none, Z, ±hh:mm) — a foreign dump's timestamps need not
    match this package's own 26-digit-µs ``iso_us`` shape."""
    arr = combined(col)
    if pa.types.is_timestamp(arr.type):
        return pc.cast(arr, pa.timestamp("us"))
    # Arrow refuses both zone mismatches (naive target vs Z/offset) and
    # precision loss (µs target vs ns fractions) at parse time, so try
    # the four shapes from cheapest to most general, then normalize:
    # drop the zone (instants stay UTC) and truncate sub-µs fractions.
    last: Exception | None = None
    for typ in (pa.timestamp("us"), pa.timestamp("us", "UTC"),
                pa.timestamp("ns"), pa.timestamp("ns", "UTC")):
        try:
            t = pc.cast(arr, typ)
            break
        except pa.ArrowInvalid as e:
            last = e
    else:
        raise last
    if t.type.tz is not None:
        t = pc.cast(t, pa.timestamp(t.type.unit))
    return t if t.type.unit == "us" else pc.cast(
        t, pa.timestamp("us"), safe=False)


def pb_field(name: str, number: int, ftype: int,
             type_name: "str | None" = None,
             repeated: bool = False):
    """FieldDescriptorProto builder shared by the runtime-declared
    protobuf codecs (otlp_pb/prw/sfx/jaeger) — one copy of the
    label/type_name plumbing."""
    from google.protobuf import descriptor_pb2

    t = descriptor_pb2.FieldDescriptorProto
    f = descriptor_pb2.FieldDescriptorProto(
        name=name, number=number, type=ftype,
        label=(t.LABEL_REPEATED if repeated else t.LABEL_OPTIONAL))
    if type_name:
        f.type_name = type_name
    return f


def cols_to_table(schema: pa.Schema, cols: "dict[str, list]") -> pa.Table:
    """Column lists → a schema-stable Arrow table; epoch-µs int lists
    build through int64 and cast for every timestamp field (the shared
    tail of all the decode loops in this package)."""
    arrays = []
    for f in schema:
        vals = cols[f.name]
        if pa.types.is_timestamp(f.type):
            arrays.append(pa.array(vals, type=pa.int64()).cast(f.type))
        else:
            arrays.append(pa.array(vals, type=f.type))
    return pa.Table.from_arrays(arrays, schema=schema)
