"""solace receiver analogue: broker-telemetry dump decode into trace
spans (dual-family topic dispatch, parent linkage, enqueue events),
refused-message handling, settlement resume, delivery-lag join."""

import json
import os

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources.solace import (
    EGRESS_TOPIC,
    RECEIVE_TOPIC,
    SOLACE_SHARDS,
    delivery_lag,
    encode_egress_span,
    encode_receive_span,
    read_solace_dump,
    settle_spans,
)


def test_solace_dump_decode(ray_session, sf_dir):
    path = corpus.ensure_solace_dump(sf_dir)
    df = read_solace_dump(path).to_pandas()
    n_turns = corpus.n_turns_for(corpus.sf_name(sf_dir))
    # one receive + one egress span per traced user message (turn)
    assert len(df) == 2 * n_turns
    fam = df["family"].value_counts()
    assert fam["receive"] == n_turns and fam["egress"] == n_turns
    recv = df[df["family"] == "receive"]
    eg = df[df["family"] == "egress"]
    # semconv mapping: name = "<destination> <operation>", kind per op
    assert (recv["kind"] == "consumer").all()
    assert (eg["kind"] == "producer").all()
    assert (recv["name"] == recv["destination"] + " receive").all()
    assert (eg["name"] == eg["destination"] + " send").all()
    # parent linkage: every egress span points at a receive span of the
    # SAME trace, and the pair shares the user message's rgmid
    rs = recv.set_index("span_id")
    parents = rs.loc[eg["parent_span_id"]]
    assert (parents["trace_id"].to_numpy()
            == eg["trace_id"].to_numpy()).all()
    assert (parents["rgmid"].to_numpy() == eg["rgmid"].to_numpy()).all()
    assert (recv["parent_span_id"] == "").all()  # receive spans are roots
    # enqueue event surfaces on receive rows only, naming the egress queue
    assert (recv["enqueue_queue"].str.startswith("q/")).all()
    assert (eg["enqueue_queue"] == "").all()
    assert set(eg["destination"]) == {
        f"q/{p}" for p in range(SOLACE_SHARDS)}
    # span times: broker work then queue delay — receive.end < egress.start
    assert (recv["start_ts"] <= recv["end_ts"]).all()
    lag = (parents.reset_index(drop=True)["end_ts"]
           .rsub(eg["start_ts"].reset_index(drop=True)))
    assert (lag.dt.total_seconds() > 0).all()
    # spot-check one wire line against its decoded row
    with open(os.path.join(path, "telemetry-0.jsonl")) as f:
        env = json.loads(f.readline())
    assert env["topic"] == RECEIVE_TOPIC
    payload = json.loads(env["payload"])
    row = df[df["span_id"] == payload["spanId"]].iloc[0]
    assert row["family"] == "receive"
    assert row["destination"] == payload["topic"]
    assert row["rgmid"] == payload["replicationGroupMessageId"]
    assert row["start_ts"].value == payload["startTimeUnixNano"]


def test_solace_refuses_unknown_telemetry(ray_session, sf_dir, tmp_path):
    """Messages with an unknown telemetry topic, an unparsable payload,
    a non-object payload, or SpanData missing required fields are all
    REFUSED — dropped and counted (the contrib receiver's
    dropped-telemetry counter), never raised — and the rest of the file
    still decodes."""
    from splunk_otel_collector_ray.sources.solace import count_refused

    src = corpus.ensure_solace_dump(sf_dir)
    dump = str(tmp_path / "queue")
    os.makedirs(dump)
    with open(os.path.join(src, "telemetry-0.jsonl")) as f:
        good = f.readlines()[:10]
    junk = [
        {"topic": "_telemetry/broker/trace/move/v1", "payload": "{}"},
        {"topic": EGRESS_TOPIC, "payload": "not json {"},
        {"topic": EGRESS_TOPIC, "payload": "{}"},     # missing fields
        {"topic": RECEIVE_TOPIC, "payload": "123"},   # non-object
        {"topic": RECEIVE_TOPIC,
         "payload": json.dumps({"traceId": "00", "spanId": "01",
                                "startTimeUnixNano": "not a number",
                                "completionTimeUnixNano": 2})},
        # wrong-TYPED fields must refuse the one message, not crash the
        # batch's Arrow column build (numeric protocolVersion, null id)
        {"topic": EGRESS_TOPIC,
         "payload": json.dumps(dict(
             json.loads(encode_egress_span(
                 "t0", "s0", "p0", 1, 2, "q/0", "rm", "smf", "3.0",
                 "user")["payload"]),
             protocolVersion=3.0))},
        {"topic": RECEIVE_TOPIC,
         "payload": json.dumps(dict(
             json.loads(encode_receive_span(
                 "t1", "s1", 1, 2, "top", "rm", "smf", "3.0", "user",
                 "q/1")["payload"]),
             traceId=None))},
        # out-of-int64-domain times: Infinity overflows int() itself;
        # a huge JSON integer passes int() but would overflow the numpy
        # int64 timestamp build for the WHOLE batch downstream
        {"topic": EGRESS_TOPIC,
         "payload": json.dumps(dict(
             json.loads(encode_egress_span(
                 "t2", "s2", "p2", 1, 2, "q/0", "rm", "smf", "3.0",
                 "user")["payload"]),
             startTimeUnixNano=1e400))},
        {"topic": RECEIVE_TOPIC,
         "payload": json.dumps(dict(
             json.loads(encode_receive_span(
                 "t3", "s3", 1, 2, "top", "rm", "smf", "3.0", "user",
                 "q/1")["payload"]),
             completionTimeUnixNano=10**30))},
    ]
    with open(os.path.join(dump, "telemetry-0.jsonl"), "w") as f:
        f.writelines(good[:5])
        for j in junk:
            f.write(json.dumps(j) + "\n")
        f.writelines(good[5:])
    assert read_solace_dump(dump).count() == 10
    assert count_refused(dump) == len(junk)
    assert count_refused(src) == 0  # the staged dump is clean


def test_solace_settlement_resume(ray_session, sf_dir, tmp_path):
    """Settling a consumed subset makes only the unsettled remainder
    redeliver; settling everything makes the re-read empty — the
    at-least-once settle-after-forward contract."""
    path = corpus.ensure_solace_dump(sf_dir)
    state = str(tmp_path / "settled")
    total = read_solace_dump(path).count()
    settle_spans(state, read_solace_dump(path).map_batches(
        lambda t: t.filter(
            t["family"].to_pandas().eq("receive").to_numpy()),
        batch_format="pyarrow"))
    resumed = read_solace_dump(path, settled_dir=state)
    rdf = resumed.to_pandas()
    assert len(rdf) == total // 2
    assert (rdf["family"] == "egress").all()
    settle_spans(state, resumed)
    assert read_solace_dump(path, settled_dir=state).count() == 0


def test_solace_delivery_lag_matches_join(ray_session, sf_dir):
    """The distributed rgmid-join recovers the per-queue delay exactly:
    compare against a driver-side pandas join of the same decoded spans
    (small at test scale)."""
    import pandas as pd

    path = corpus.ensure_solace_dump(sf_dir)
    got = delivery_lag(read_solace_dump(path)).to_pandas() \
        .sort_values("destination").reset_index(drop=True)
    df = read_solace_dump(path).to_pandas()
    recv = df[df["family"] == "receive"][["rgmid", "end_ts"]]
    eg = df[df["family"] == "egress"][["rgmid", "destination", "start_ts"]]
    m = eg.merge(recv, on="rgmid")
    m["lag"] = (m["start_ts"] - m["end_ts"]) // pd.Timedelta(microseconds=1)
    want = m.groupby("destination", sort=True)["lag"].agg(
        n_deliveries="size", avg_lag_us="mean",
        max_lag_us="max").reset_index()
    pd.testing.assert_frame_equal(
        got[["destination", "n_deliveries", "avg_lag_us", "max_lag_us"]],
        want, check_dtype=False)
    # the staged delay formula caps at 1000 µs
    assert int(got["max_lag_us"].max()) <= 1000


def test_solace_delivery_lag_unpaired_stream(ray_session, sf_dir,
                                             tmp_path):
    """A stream with no pairable spans (egress spans settled away — the
    shape settlement resume itself produces) folds to an EMPTY result
    without raising: every fold partial carries the explicit partial
    schema (never a null-typed destination from an empty pandas
    groupby), and Ray's drop-empty-blocks convention yields a clean
    zero-row dataset (the same schemaless-empty contract pulsar's
    cursor loader guards for)."""
    path = corpus.ensure_solace_dump(sf_dir)
    state = str(tmp_path / "settled")
    settle_spans(state, read_solace_dump(path).map_batches(
        lambda t: t.filter(
            t["family"].to_pandas().eq("egress").to_numpy()),
        batch_format="pyarrow"))
    receives_only = read_solace_dump(path, settled_dir=state)
    assert delivery_lag(receives_only).count() == 0
