"""kafka receiver analogue: topic-dump JSONL → log records, with
consumer-group offset-commit resume.

The reference ships kafka receiver/exporter components
(internal/components/components.go:242,305) whose NETWORK side (brokers,
consumer groups, rebalancing) is out of scope for a batch engine — but the
DATA semantics port cleanly: each record's ``payload`` becomes the log
body, the Kafka coordinates (topic/partition/offset/key/timestamp) and
headers become attributes, and the consumer group's committed-offset state
becomes a per-partition high-water-mark file — re-reading a dump skips
records at or below the committed offset exactly like a restarted consumer
(the same shape as the filelog receiver's offsets checkpoint). Input is
the kcat/kafkacat ``-J`` JSONL export layout (public format), read
Arrow-native via ``ray.data.read_json``; decode is vectorized per batch.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa


def decode_kafka_batch(batch: pa.Table) -> pa.Table:
    """One dump record per row → log-record columns (vectorized)."""
    ms = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    cols: dict[str, pa.Array] = {
        "topic": batch["topic"],
        "partition": batch["partition"].cast(pa.int32()),
        "offset": batch["offset"].cast(pa.int64()),
        "ts": pa.array(ms * 1000, type=pa.timestamp("us")),
        "key": batch["key"],
        "body": batch["payload"],
    }
    headers = batch["headers"]
    if isinstance(headers, pa.ChunkedArray):
        headers = headers.combine_chunks()
    for i, f in enumerate(headers.type):
        if f.name in cols:  # coordinates/payload are authoritative — a
            continue  # producer header named 'key'/'offset'/… never wins
        cols[f.name] = headers.field(i)  # splat headers → attributes
    return pa.table(cols)


def read_kafka_dump(path: str, committed: dict[int, int] | None = None
                    ) -> "ray.data.Dataset":
    """Read a topic dump; with ``committed`` (partition → last committed
    offset), skip records at or below the mark — the consumer-group
    restart semantics. The filter is vectorized per batch (partition-keyed
    offset lookup against a tiny broadcast array)."""
    import ray.data

    ds = ray.data.read_json(path, file_extensions=["jsonl"])
    out = ds.map_batches(decode_kafka_batch, batch_format="pyarrow")
    if not committed:
        return out
    max_p = max(committed) + 1
    marks = np.full(max_p, -1, dtype=np.int64)
    for p, off in committed.items():
        marks[p] = off

    def skip_committed(t: pa.Table) -> pa.Table:
        part = t["partition"].to_numpy(zero_copy_only=False)
        off = t["offset"].to_numpy(zero_copy_only=False)
        keep = np.where(part < max_p, off > marks[np.clip(part, 0, max_p - 1)],
                        True)
        return t.filter(pa.array(keep))

    return out.map_batches(skip_committed, batch_format="pyarrow")


def commit_offsets(state_path: str, ds: "ray.data.Dataset") -> dict[int, int]:
    """Fold the consumed stream to per-partition max offsets and commit
    them atomically (tmp + rename, the manifest discipline). Partials
    shrink per batch to ≤ #partitions rows — the stream never collects."""
    from ..partitioning import small_fold

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["partition", "offset"]).group_by(
            "partition").aggregate([("offset", "max")])
        return g.rename_columns(["partition", "offset"])

    hw = small_fold(
        ds.map_batches(partial, batch_format="pyarrow"), partial).to_pandas()
    marks = {int(p): int(o) for p, o in zip(hw["partition"], hw["offset"])}
    prev = load_offsets(state_path)
    for p, o in prev.items():  # commits are monotone, like a real group
        marks[p] = max(marks.get(p, -1), o)
    os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(state_path) or ".")
    with os.fdopen(fd, "w") as f:
        json.dump({str(p): o for p, o in marks.items()}, f)
    os.replace(tmp, state_path)
    return marks


def write_kafka_dump(ds: "ray.data.Dataset", out_dir: str,
                     topic: str = "transcripts",
                     assign_offsets: bool = False,
                     header_cols: tuple[str, ...] = ("turn_idx", "role",
                                                     "tool")) -> None:
    """kafka PRODUCER analogue: write decoded records back as a topic dump
    (one JSONL file per partition, offset-ordered — what a consumer of the
    produced topic would observe).

    Input rows carry (partition, ts, key, body) + ``header_cols``;
    existing ``offset`` coordinates are preserved (dump copy), or with
    ``assign_offsets=True`` fresh per-partition sequences are assigned in
    (key, existing-order) order — the broker's append counter. Routing is
    one ``bucket_fold`` exchange on the partition column (a partition's
    records must serialize contiguously, exactly the producer→broker
    partition-ownership shape); each fold pass writes the partitions it
    holds and emits a tiny (partition, n) receipt."""
    import json as _json

    import pandas as pd

    from ..partitioning import bucket_fold

    os.makedirs(out_dir, exist_ok=True)

    def write_partitions(g: "pd.DataFrame") -> "pd.DataFrame":
        # offset-less input (fresh produce) always gets broker-assigned
        # sequences; explicit offsets are preserved only when present
        assign = assign_offsets or "offset" not in g.columns
        out = []
        for p, rows in g.groupby("partition", sort=True):
            rows = rows.sort_values(
                ["key"] if assign else ["offset"], kind="mergesort")
            offs = (np.arange(len(rows)) if assign
                    else rows["offset"].to_numpy())
            ts_ms = (rows["ts"].astype("int64") // 1000).to_numpy()
            path = os.path.join(out_dir, f"{topic}-{int(p)}.jsonl")
            tmp = path + ".tmp"
            keys, bodies = rows["key"].to_numpy(), rows["body"].to_numpy()
            hdr = {c: rows[c].to_numpy() for c in header_cols}
            with open(tmp, "w", encoding="utf-8") as f:
                for i in range(len(rows)):
                    f.write(_json.dumps({
                        "topic": topic, "partition": int(p),
                        "offset": int(offs[i]), "ts": int(ts_ms[i]),
                        "key": keys[i], "payload": bodies[i],
                        "headers": {c: (int(hdr[c][i]) if c == "turn_idx"
                                        else hdr[c][i])
                                    for c in header_cols},
                    }, ensure_ascii=False) + "\n")
            os.replace(tmp, path)
            out.append((int(p), len(rows)))
        return pd.DataFrame(out, columns=["partition", "n"])

    bucket_fold(ds, "partition", write_partitions).materialize()


def load_offsets(state_path: str) -> dict[int, int]:
    if not os.path.exists(state_path):
        return {}
    with open(state_path) as f:
        return {int(p): int(o) for p, o in json.load(f).items()}
