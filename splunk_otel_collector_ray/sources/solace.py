"""solace receiver analogue: broker-telemetry queue-dump decode →
trace spans, with settlement-based resume.

The reference registers the contrib ``solacereceiver``
(/root/reference/internal/components/components.go:268,
docs/components.md:76) whose NETWORK side (AMQP 1.0 links to the
broker's ``#telemetry-…`` queue, flow-control windows) is out of scope
for a batch engine — but its DATA semantics are unlike every other
queue family in this package, which is why it completes the set:

1. **The payload IS telemetry about messaging itself.** Each queue
   message carries a Solace distributed-tracing ``SpanData`` protobuf
   describing one traced user message's journey through the broker, and
   the receiver emits TRACE SPANS, not log rows. There are two span
   families, *receive* (broker accepted a publish; the public
   ``…trace.receive.v1`` message) and *egress* (broker delivered to a
   consumer; ``…trace.egress.v1``), dispatched on the TELEMETRY
   MESSAGE'S TOPIC — the receiver picks the unmarshaller from the
   topic, and a message whose topic names no known family is refused
   and counted (the contrib receiver's dropped-telemetry counter), not
   crashed on.
2. **Both spans of one user message share its identity** — the
   replication-group message id (``rmid1:…``) — so egress spans link to
   their receive parent both by ``parentSpanId`` and by rgmid, which is
   what makes broker delivery-latency analysis a keyed self-join (see
   :func:`delivery_lag`) rather than a trace-reassembly problem.
3. **Resume is settlement.** Guaranteed-messaging consumption settles
   (accepts) each telemetry message only after it is forwarded;
   unsettled messages redeliver on restart. The analogue records
   settled span ids as parquet written BY THE CLUSTER
   (:func:`settle_spans`) and a restarted read drops them via
   ``anti_join_keys`` — broadcast under the cardinality threshold,
   keyed anti-join past it; the driver never holds the set.

Input is a JSONL dump of the telemetry queue: one line per AMQP
message, ``{"topic": "_telemetry/broker/trace/<family>/v1",
"payload": "<SpanData JSON>"}``, sharded into files for read
parallelism only (a Solace queue has no partitions). The payload JSON
carries the public SpanData fields (hex ids, nanosecond times, topic or
queue name, rgmid, protocol/version, client username, enqueue events).
Envelope topics decode vectorized; the per-message payload parse is the
wire-codec edge (same as fluent/OTLP/kafka payload decoding).

Span mapping follows OTel messaging semconv the way the contrib
unmarshallers do: span name = ``<destination> <operation>``, operation
``receive`` (kind ``consumer``) for the receive family, ``send`` (kind
``producer``) for egress; enqueue events surface as the
``enqueue_queue`` column ('' on egress rows).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SOLACE_SHARDS = 4  # file-layout parallelism only — queues have no partitions

RECEIVE_TOPIC = "_telemetry/broker/trace/receive/v1"
EGRESS_TOPIC = "_telemetry/broker/trace/egress/v1"


def encode_receive_span(trace_id: str, span_id: str, start_ns: int,
                        end_ns: int, topic: str, rgmid: str, protocol: str,
                        protocol_version: str, client_username: str,
                        enqueue_queue: str) -> dict:
    """One telemetry-queue line: a receive-family SpanData message."""
    return {"topic": RECEIVE_TOPIC, "payload": json.dumps({
        "traceId": trace_id, "spanId": span_id,
        "startTimeUnixNano": int(start_ns),
        "completionTimeUnixNano": int(end_ns),
        "topic": topic, "replicationGroupMessageId": rgmid,
        "protocol": protocol, "protocolVersion": protocol_version,
        "clientUsername": client_username,
        "enqueueEvents": [{"queueName": enqueue_queue,
                           "timeUnixNano": int(end_ns)}],
    }, ensure_ascii=False)}


def encode_egress_span(trace_id: str, span_id: str, parent_span_id: str,
                       start_ns: int, end_ns: int, queue_name: str,
                       rgmid: str, protocol: str, protocol_version: str,
                       client_username: str) -> dict:
    """One telemetry-queue line: an egress-family SpanData message."""
    return {"topic": EGRESS_TOPIC, "payload": json.dumps({
        "traceId": trace_id, "spanId": span_id,
        "parentSpanId": parent_span_id,
        "startTimeUnixNano": int(start_ns),
        "completionTimeUnixNano": int(end_ns),
        "queueName": queue_name, "replicationGroupMessageId": rgmid,
        "protocol": protocol, "protocolVersion": protocol_version,
        "clientUsername": client_username,
    }, ensure_ascii=False)}


def decode_solace_batch(batch: pa.Table) -> pa.Table:
    """Telemetry messages → one SPAN row each, unified across families.

    The family dispatch is the envelope topic (vectorized equality);
    messages with an unknown telemetry topic or an unparsable payload
    are REFUSED — dropped from the stream the way the contrib receiver
    drops and counts them — never raised. Payload JSON parse is the
    per-message codec edge; everything after it builds columns in one
    pass."""
    topics = batch["topic"].to_pylist()
    payloads = batch["payload"].to_pylist()
    fam: list[str] = []
    spans: list[dict] = []
    for t, p in zip(topics, payloads):
        if t == RECEIVE_TOPIC:
            f = "receive"
        elif t == EGRESS_TOPIC:
            f = "egress"
        else:  # unknown telemetry family → refused, counted not crashed
            continue
        try:
            d = json.loads(p)
        except (TypeError, ValueError):
            continue
        fam.append(f)
        spans.append(d)

    recv = np.fromiter((f == "receive" for f in fam), dtype=bool,
                       count=len(fam))
    dest = [d["topic"] if r else d["queueName"]
            for r, d in zip(recv, spans)]
    s = pa.string()
    return pa.table({
        "family": pa.array(fam, type=s),
        "trace_id": pa.array([d["traceId"] for d in spans], type=s),
        "span_id": pa.array([d["spanId"] for d in spans], type=s),
        "parent_span_id": pa.array(
            [d.get("parentSpanId", "") for d in spans], type=s),
        "name": pa.array(
            [f"{x} receive" if r else f"{x} send"
             for r, x in zip(recv, dest)], type=s),
        "kind": pa.array(
            ["consumer" if r else "producer" for r in recv], type=s),
        "start_ts": _ns_to_ts([d["startTimeUnixNano"] for d in spans]),
        "end_ts": _ns_to_ts([d["completionTimeUnixNano"] for d in spans]),
        "destination": pa.array(dest, type=s),
        "rgmid": pa.array([d["replicationGroupMessageId"] for d in spans],
                          type=s),
        "protocol": pa.array([d["protocol"] for d in spans], type=s),
        "protocol_version": pa.array(
            [d["protocolVersion"] for d in spans], type=s),
        "client_username": pa.array(
            [d["clientUsername"] for d in spans], type=s),
        "enqueue_queue": pa.array(
            [d["enqueueEvents"][0]["queueName"]
             if r and d.get("enqueueEvents") else ""
             for r, d in zip(recv, spans)], type=s),
    })


def _ns_to_ts(ns: "list[int]") -> pa.Array:
    us = np.asarray(ns, dtype=np.int64) // 1000
    return pc.cast(pa.array(us, type=pa.int64()), pa.timestamp("us"))


def read_solace_dump(path: str, settled_dir: "str | None" = None
                     ) -> "ray.data.Dataset":
    """Read a telemetry-queue dump; with ``settled_dir`` (written by
    :func:`settle_spans`), drop already-settled messages — the
    redelivery-after-restart semantics of guaranteed messaging. The
    settled set applies via ``anti_join_keys`` on ``span_id`` (unique
    per telemetry message): broadcast when small, keyed anti-join when
    not — the driver never materializes it."""
    import ray.data

    out = ray.data.read_json(path, file_extensions=["jsonl"]).map_batches(
        decode_solace_batch, batch_format="pyarrow")
    if settled_dir and os.path.isdir(settled_dir) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(settled_dir)
            for f in fs):
        import ray.data as rd

        from ..stages.sample import anti_join_keys

        settled = rd.read_parquet(settled_dir, columns=["span_id"])
        out = anti_join_keys(out, settled, "span_id")
    return out


def settle_spans(state_dir: str, ds: "ray.data.Dataset") -> None:
    """Record the consumed stream's telemetry messages as settled
    (accepted) — appended parquet of span ids, written by the cluster.
    A later :func:`read_solace_dump` with this directory skips them;
    everything unsettled redelivers, the at-least-once contract the
    contrib receiver implements by settling only after forwarding."""
    os.makedirs(state_dir, exist_ok=True)
    part = 0
    while os.path.exists(os.path.join(state_dir, f"settle-{part:04d}")):
        part += 1
    sub = os.path.join(state_dir, f"settle-{part:04d}")
    ds.map_batches(lambda t: t.select(["span_id"]),
                   batch_format="pyarrow").write_parquet(sub)


def delivery_lag(spans: "ray.data.Dataset") -> "ray.data.Dataset":
    """Broker delivery latency per egress destination: join each egress
    span to its receive parent THROUGH the shared rgmid and aggregate
    ``egress.start - receive.end`` per queue.

    Shape: project to fixed-width columns, ONE ``bucket_fold`` exchange
    on the rgmid hash (both spans of a message land in one bucket; the
    fold pairs them with a vectorized merge and shrinks to per-queue
    partials), then a ``small_fold`` final over O(#queues) rows —
    span text never reshuffles and nothing materializes on the driver."""
    import pandas as pd

    from ..partitioning import bucket_fold, pd_table, small_fold, \
        spread_num_buckets
    from ..stages.sample import key_hash_mod

    nb = spread_num_buckets()

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "family": t["family"],
            "rgmid": t["rgmid"],
            "destination": t["destination"],
            "start_us": pc.cast(t["start_ts"], pa.int64()),
            "end_us": pc.cast(t["end_ts"], pa.int64()),
            "bucket": pa.array(key_hash_mod(
                t["rgmid"].combine_chunks(), nb)),
        })

    def pair_and_shrink(df: "pd.DataFrame") -> pa.Table:
        recv = df.loc[df["family"].to_numpy() == "receive",
                      ["rgmid", "end_us"]]
        eg = df.loc[df["family"].to_numpy() == "egress",
                    ["rgmid", "destination", "start_us"]]
        m = eg.merge(recv, on="rgmid", how="inner")
        m["lag_us"] = m["start_us"] - m["end_us"]
        g = m.groupby("destination", sort=False)["lag_us"].agg(
            n="size", s="sum", mx="max").reset_index()
        return pd_table(g)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("destination", sort=True).agg(
            n=("n", "sum"), s=("s", "sum"), mx=("mx", "max")).reset_index()
        out = pd_table(g)
        return pa.table({
            "destination": out["destination"],
            "n_deliveries": pc.cast(out["n"], pa.int64()),
            "avg_lag_us": pc.divide(
                pc.cast(out["s"], pa.float64()),
                pc.cast(out["n"], pa.float64())),
            "max_lag_us": pc.cast(out["mx"], pa.int64()),
        })

    partials = bucket_fold(
        spans.map_batches(project, batch_format="pyarrow"), "bucket",
        pair_and_shrink, coalesce=1 << 17)
    return small_fold(partials, combine)
