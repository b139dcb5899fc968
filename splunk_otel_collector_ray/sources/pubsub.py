"""pubsub receiver analogue: subscription-pull dump JSONL → log records,
with acked-message resume.

The reference ships a googlecloudpubsub receiver/exporter pair
(/root/reference/internal/components/components.go:215 area — queue
transports) whose NETWORK side (gRPC streaming pull, lease management,
flow control) is out of scope for a batch engine, but the DATA semantics
port cleanly: each ``ReceivedMessage`` envelope's base64 ``data`` becomes
the log body, ``attributes`` (string→string per the public Pub/Sub data
model) splat to attributes, ``messageId``/``orderingKey``/``publishTime``
become coordinates, and the subscriber's ack state becomes a durable
acked-id table — re-reading a dump skips acked messages exactly like a
restarted subscriber (at-least-once semantics; unlike kafka there is no
offset order, so the state is a key SET, not a high-water mark).

Input is the REST ``ReceivedMessage`` JSON layout (public API shape), one
object per line, read Arrow-native via ``ray.data.read_json``; envelope
fields decode vectorized except the per-row base64 (the wire-codec edge,
same as fluent/OTLP). Ack state scales: it is written as parquet BY THE
CLUSTER (never collected to the driver) and applied with
``anti_join_keys`` — broadcast under the cardinality threshold, keyed
anti-join past it.
"""

from __future__ import annotations

import base64
import os

import pyarrow as pa
import pyarrow.compute as pc

PUBSUB_SHARDS = 4  # file-layout fan-out for read parallelism (pubsub has
#                    no partitions; shard = producer key hash, like kafka)


def encode_pubsub_record(message_id: str, ordering_key: str,
                         publish_ts_us: int, body: str,
                         attributes: "dict[str, str]") -> dict:
    """One ReceivedMessage envelope (REST JSON shape, data base64)."""
    from .wire import iso_us

    iso = iso_us(publish_ts_us)
    return {
        "ackId": "ack:" + message_id,
        "message": {
            "data": base64.b64encode(body.encode("utf-8")).decode("ascii"),
            "attributes": attributes,
            "messageId": message_id,
            "orderingKey": ordering_key,
            "publishTime": iso,
        },
    }


def decode_pubsub_batch(batch: pa.Table) -> pa.Table:
    """One envelope per row → log-record columns.

    publishTime parses via Arrow's ISO8601 string→timestamp cast (the Z
    suffix sliced off); attributes splat as STRINGS (the Pub/Sub data
    model types them string→string); only the base64 payload is per-row.
    """
    msg = batch["message"]
    if isinstance(msg, pa.ChunkedArray):
        msg = msg.combine_chunks()
    data = msg.field("data")
    body = pa.array(
        [base64.b64decode(v).decode("utf-8") if v is not None else None
         for v in data.to_pylist()], type=pa.string())
    from .wire import ts_us

    ts = ts_us(msg.field("publishTime"))
    cols: dict[str, pa.Array] = {
        "message_id": msg.field("messageId"),
        "ordering_key": msg.field("orderingKey"),
        "publish_ts": ts,
        "body": body,
    }
    attrs = msg.field("attributes")
    for i, f in enumerate(attrs.type):
        if f.name in cols:  # coordinates/payload are authoritative
            continue
        cols[f.name] = pc.cast(attrs.field(i), pa.string())
    return pa.table(cols)


def read_pubsub_dump(path: str, ack_state: str | None = None
                     ) -> "ray.data.Dataset":
    """Read a subscription dump; with ``ack_state`` (a parquet dir written
    by :func:`ack_messages`), drop already-acked messages — the restarted-
    subscriber semantics. The acked set never lands on the driver:
    ``anti_join_keys`` broadcasts small sets and keyed-anti-joins big ones.
    """
    import ray.data

    from .wire import has_parquet

    out = ray.data.read_json(path, file_extensions=["jsonl"]).map_batches(
        decode_pubsub_batch, batch_format="pyarrow")
    if not has_parquet(ack_state):
        return out
    from ..stages.sample import anti_join_keys

    acked = ray.data.read_parquet(ack_state, columns=["message_id"])
    return anti_join_keys(out, acked, "message_id")


def ack_messages(state_path: str, ds: "ray.data.Dataset") -> None:
    """Persist the consumed stream's message ids as the acked set —
    written distributed (one parquet shard per block union), appended to
    any prior state via the shared queue-source numbering rule
    (:func:`..sources.wire.next_state_subdir`); the driver never holds
    the ids."""
    from .wire import next_state_subdir

    sub = next_state_subdir(state_path, "ack")
    ds.select_columns(["message_id"]).write_parquet(sub)


def write_pubsub_dump(ds: "ray.data.Dataset", out_dir: str,
                      attr_cols: "tuple[str, ...]" = ("turn_idx", "role",
                                                      "tool")) -> None:
    """pubsub PUBLISHER analogue: write decoded records back as a
    subscription dump (JSONL envelopes, sharded by ordering-key hash so a
    shard's messages serialize contiguously — the ordering-key delivery
    guarantee). Input rows carry (message_id, ordering_key, publish_ts,
    body) + ``attr_cols``."""
    import json as _json

    import numpy as np
    import pandas as pd

    from ..partitioning import bucket_fold
    from ..stages.sample import key_hash_mod

    os.makedirs(out_dir, exist_ok=True)

    def add_shard(t: pa.Table) -> pa.Table:
        shard = key_hash_mod(t["ordering_key"], PUBSUB_SHARDS)
        return t.append_column("shard", pa.array(shard.astype(np.int64)))

    def write_shards(g: "pd.DataFrame") -> "pd.DataFrame":
        out = []
        for s, rows in g.groupby("shard", sort=True):
            rows = rows.sort_values(["ordering_key", "message_id"],
                                    kind="mergesort")
            ts_us = rows["publish_ts"].astype("int64").to_numpy()
            mids = rows["message_id"].to_numpy()
            okeys = rows["ordering_key"].to_numpy()
            bodies = rows["body"].to_numpy()
            attrs = {c: rows[c].to_numpy() for c in attr_cols}
            path = os.path.join(out_dir, f"subscription-{int(s)}.jsonl")
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                for i in range(len(rows)):  # wire-encode edge, like kafka
                    f.write(_json.dumps(encode_pubsub_record(
                        mids[i], okeys[i], int(ts_us[i]), bodies[i],
                        {c: str(attrs[c][i]) for c in attr_cols}),
                        ensure_ascii=False) + "\n")
            os.replace(tmp, path)
            out.append((int(s), len(rows)))
        return pd.DataFrame(out, columns=["shard", "n"])

    bucket_fold(ds.map_batches(add_shard, batch_format="pyarrow"),
                "shard", write_shards).materialize()
