"""azureeventhub receiver analogue: Capture-style partition dump →
Azure resource-log records, with per-partition sequence checkpointing.

The reference registers ``azureeventhubreceiver``
(/root/reference/internal/components/components.go:215) whose NETWORK
side (AMQP links, consumer groups, lease-based load balancing) is out of
scope for a batch engine — but the DATA semantics port cleanly and are
DIFFERENT from kafka/pubsub in two ways this module implements:

1. **One event explodes into many log records.** An Event Hubs event
   carrying Azure diagnostic logs has a body of the public export shape
   ``{"records": [...]}`` — each record with ``time`` / ``resourceId`` /
   ``category`` / ``operationName`` / ``level`` / ``properties`` — and
   the receiver emits ONE log row per record (a flat_map, not a 1:1
   decode), mapping the Azure severity ladder (Verbose / Informational /
   Warning / Error / Critical) onto OTel severity numbers.
2. **Resume state is a per-partition sequence high-water mark** (the
   Event Processor checkpoint-store model): a restarted processor reads
   each partition strictly AFTER its checkpointed ``SequenceNumber`` —
   per-partition monotone like kafka offsets, unlike pubsub's ack SET.

Input is an Event Hubs *Capture*-shaped dump: one JSONL file per
partition, each line an event envelope using Capture's public field
names (``Body`` / ``SequenceNumber`` / ``Offset`` / ``EnqueuedTimeUtc``
/ ``PartitionKey``; real Capture stores Avro and encodes the partition
id in the blob path — this dump carries it as ``PartitionId``, and no
Avro lib ships in this container). Envelope fields decode vectorized;
the per-event ``Body`` JSON parse is the wire-codec edge (same as
fluent/OTLP/kafka payload decoding). Checkpoints are folded from the
stream with ``partitioning.small_fold`` (≤ #partitions rows ever reach
the driver) and committed atomically.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .wire import iso_us as _iso_us
from .wire import repeat_per, ts_us

EVENTHUB_PARTITIONS = 4

# Azure resource-log severity ladder → OTel severity numbers, the mapping
# the contrib receiver applies (public OTel data-model table: DEBUG=5,
# INFO=9, WARN=13, ERROR=17, FATAL=21).
AZURE_SEVERITY: dict[str, int] = {
    "Verbose": 5,
    "Informational": 9,
    "Warning": 13,
    "Error": 17,
    "Critical": 21,
}

RESOURCE_PREFIX = ("/subscriptions/sub0/resourceGroups/transcripts/"
                   "providers/Microsoft.Chat/conversations/")


def encode_eventhub_event(partition: int, sequence: int, partition_key: str,
                          enqueued_us: int, records: "list[dict]") -> dict:
    """One Capture-shaped event envelope; ``Body`` is the resource-log
    export JSON (``{"records": [...]}``) serialized as a string."""
    return {
        "PartitionId": int(partition),
        "SequenceNumber": int(sequence),
        "Offset": str(int(sequence) * 512),  # opaque string per the API
        "EnqueuedTimeUtc": _iso_us(enqueued_us),
        "PartitionKey": partition_key,
        "Body": json.dumps({"records": records}, ensure_ascii=False),
    }


def make_azure_record(ts_us: int, conv_id: str, role: str, tool: str,
                      level: str, turn_idx: int, text: str) -> dict:
    """One Azure diagnostic-log record (public common-schema fields)."""
    return {
        "time": _iso_us(ts_us),
        "resourceId": RESOURCE_PREFIX + conv_id,
        "category": role,
        "operationName": tool,
        "level": level,
        "properties": {"text": text, "turn_idx": int(turn_idx)},
    }


def decode_eventhub_batch(batch: pa.Table) -> pa.Table:
    """Event envelopes → one log row PER RESOURCE-LOG RECORD.

    Envelope coordinates replicate across a body's records via a single
    ``np.repeat``; record ``time`` strings parse in one Arrow cast after
    the explode. Only the body JSON parse itself is per event."""
    bodies = batch["Body"].to_pylist()
    recs_per_event = [json.loads(b)["records"] for b in bodies]
    counts = np.fromiter((len(r) for r in recs_per_event), dtype=np.int64,
                         count=len(recs_per_event))

    def rep(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
        return repeat_per(col, counts)

    et = ts_us(batch["EnqueuedTimeUtc"])
    flat = [r for recs in recs_per_event for r in recs]
    times = pa.array([r["time"][:26] for r in flat], type=pa.string())
    levels = [r["level"] for r in flat]
    return pa.table({
        "partition": pc.cast(rep(batch["PartitionId"]), pa.int32()),
        "sequence_number": pc.cast(rep(batch["SequenceNumber"]),
                                   pa.int64()),
        "partition_key": rep(batch["PartitionKey"]),
        "enqueued_ts": pc.cast(rep(et), pa.timestamp("us")),
        "ts": pc.cast(times, pa.timestamp("us")),
        "resource_id": pa.array([r["resourceId"] for r in flat],
                                type=pa.string()),
        "category": pa.array([r["category"] for r in flat],
                             type=pa.string()),
        "operation_name": pa.array([r["operationName"] for r in flat],
                                   type=pa.string()),
        "level": pa.array(levels, type=pa.string()),
        "severity_number": pa.array(
            [AZURE_SEVERITY.get(v, 0) for v in levels], type=pa.int8()),
        "turn_idx": pa.array([r["properties"]["turn_idx"] for r in flat],
                             type=pa.int64()),
        "body": pa.array([r["properties"]["text"] for r in flat],
                         type=pa.string()),
    })


def read_eventhub_capture(path: str,
                          checkpoint: dict[int, int] | None = None
                          ) -> "ray.data.Dataset":
    """Read a Capture dump; with ``checkpoint`` (partition → last
    processed SequenceNumber), emit only records of events strictly
    AFTER the mark — the restarted-processor semantics. The filter is
    vectorized per batch against a tiny broadcast mark array."""
    import ray.data

    out = ray.data.read_json(path, file_extensions=["jsonl"]).map_batches(
        decode_eventhub_batch, batch_format="pyarrow")
    if not checkpoint:
        return out
    max_p = max(checkpoint) + 1
    marks = np.full(max_p, -1, dtype=np.int64)
    for p, seq in checkpoint.items():
        marks[p] = seq

    def skip_processed(t: pa.Table) -> pa.Table:
        part = t["partition"].to_numpy(zero_copy_only=False)
        seq = t["sequence_number"].to_numpy(zero_copy_only=False)
        keep = np.where(part < max_p,
                        seq > marks[np.clip(part, 0, max_p - 1)], True)
        return t.filter(pa.array(keep))

    return out.map_batches(skip_processed, batch_format="pyarrow")


def checkpoint_sequences(state_path: str, ds: "ray.data.Dataset"
                         ) -> dict[int, int]:
    """Fold the processed stream to per-partition max sequence numbers
    and commit atomically (tmp + rename) — the checkpoint-store update.
    Partials shrink to ≤ #partitions rows; commits are monotone."""
    from ..partitioning import small_fold

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["partition", "sequence_number"]).group_by(
            "partition").aggregate([("sequence_number", "max")])
        return g.rename_columns(["partition", "sequence_number"])

    hw = small_fold(
        ds.map_batches(partial, batch_format="pyarrow"), partial).to_pandas()
    marks = ({int(p): int(s)
              for p, s in zip(hw["partition"], hw["sequence_number"])}
             if "partition" in hw.columns else {})  # empty stream (e.g.
    #            a restarted processor re-committing with no new events)
    #            folds to a schemaless frame — commit is then a no-op
    prev = load_checkpoint(state_path)
    for p, s in prev.items():
        marks[p] = max(marks.get(p, -1), s)
    os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(state_path) or ".")
    with os.fdopen(fd, "w") as f:
        json.dump({str(p): s for p, s in marks.items()}, f)
    os.replace(tmp, state_path)
    return marks


def load_checkpoint(state_path: str) -> dict[int, int]:
    if not os.path.exists(state_path):
        return {}
    with open(state_path) as f:
        return {int(p): int(s) for p, s in json.load(f).items()}


def write_eventhub_capture(ds: "ray.data.Dataset", out_dir: str) -> None:
    """Event Hubs PRODUCER analogue: regroup exploded log rows back into
    resource-log events (one event per partition key, records ordered by
    ``turn_idx``) and write one Capture JSONL per partition. Sequence
    numbers are reassigned per partition in partition-key order (the
    broker's append counter); ``EnqueuedTimeUtc`` is the event's earliest
    record time. Routing is one ``bucket_fold`` exchange on the partition
    column — a partition's events must serialize contiguously, the
    partition-ownership shape a real hub enforces."""
    import json as _json

    import pandas as pd

    from ..partitioning import bucket_fold

    os.makedirs(out_dir, exist_ok=True)

    def write_partitions(g: "pd.DataFrame") -> "pd.DataFrame":
        out = []
        for p, rows in g.groupby("partition", sort=True):
            rows = rows.sort_values(["partition_key", "turn_idx"],
                                    kind="mergesort")
            ts_us = rows["ts"].astype("int64").to_numpy()
            path = os.path.join(out_dir, f"partition-{int(p)}.jsonl")
            tmp = path + ".tmp"
            cols = {c: rows[c].to_numpy()
                    for c in ("partition_key", "category", "operation_name",
                              "level", "turn_idx", "body", "resource_id")}
            starts = np.flatnonzero(np.r_[
                True, cols["partition_key"][1:] != cols["partition_key"][:-1]])
            bounds = np.r_[starts, len(rows)]
            with open(tmp, "w", encoding="utf-8") as f:
                for seq in range(len(starts)):
                    lo, hi = bounds[seq], bounds[seq + 1]
                    conv = cols["partition_key"][lo]
                    recs = [{
                        "time": _iso_us(int(ts_us[i])),
                        "resourceId": cols["resource_id"][i],
                        "category": cols["category"][i],
                        "operationName": cols["operation_name"][i],
                        "level": cols["level"][i],
                        "properties": {"text": cols["body"][i],
                                       "turn_idx": int(cols["turn_idx"][i])},
                    } for i in range(lo, hi)]
                    f.write(_json.dumps(encode_eventhub_event(
                        int(p), seq, conv, int(ts_us[lo:hi].min()), recs),
                        ensure_ascii=False) + "\n")
            os.replace(tmp, path)
            out.append((int(p), len(starts)))
        return pd.DataFrame(out, columns=["partition", "n"])

    bucket_fold(ds, "partition", write_partitions).materialize()
