"""pubsub receiver analogue: subscription-dump decode + acked-message
resume + publisher round trip."""

import base64
import json
import os

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources.pubsub import (
    PUBSUB_SHARDS,
    ack_messages,
    read_pubsub_dump,
    write_pubsub_dump,
)


def test_pubsub_dump_decode(ray_session, sf_dir):
    path = corpus.ensure_pubsub_dump(sf_dir)
    ds = read_pubsub_dump(path)
    df = ds.to_pandas()
    n_turns = corpus.n_turns_for(corpus.sf_name(sf_dir))
    assert len(df) == n_turns
    # attributes splat as STRINGS (the Pub/Sub data model), data→body,
    # publishTime parsed to µs timestamps
    assert {"message_id", "ordering_key", "publish_ts", "body",
            "turn_idx", "role", "tool"} == set(df.columns)
    assert df["turn_idx"].map(type).eq(str).all()
    assert str(df["publish_ts"].dtype) == "datetime64[us]"
    # spot-check one envelope against its decoded row
    with open(os.path.join(path, "subscription-0.jsonl")) as f:
        env = json.loads(f.readline())
    row = df[df["message_id"] == env["message"]["messageId"]].iloc[0]
    assert row["body"] == base64.b64decode(
        env["message"]["data"]).decode("utf-8")
    assert row["ordering_key"] == env["message"]["orderingKey"]


def test_pubsub_ack_resume(ray_session, sf_dir, tmp_path):
    """Restarted-subscriber semantics: acked messages never redeliver;
    repeated acks append; un-acked messages always redeliver (at-least-
    once — there is no offset order to resume from, the state is a SET)."""
    path = corpus.ensure_pubsub_dump(sf_dir)
    state = str(tmp_path / "acks")
    ds = read_pubsub_dump(path)
    total = ds.count()

    first_conv = ds.take(1)[0]["ordering_key"]
    part = ds.filter(
        lambda r, c=first_conv: r["ordering_key"] == c)
    n_part = part.count()
    assert 0 < n_part < total
    ack_messages(state, part)
    remaining = read_pubsub_dump(path, ack_state=state)
    assert remaining.count() == total - n_part
    # acked ids are gone entirely, not reordered
    assert remaining.filter(
        lambda r, c=first_conv: r["ordering_key"] == c).count() == 0
    # ack everything → zero redelivery; re-acking is idempotent
    ack_messages(state, remaining)
    assert read_pubsub_dump(path, ack_state=state).count() == 0
    ack_messages(state, read_pubsub_dump(path))
    assert read_pubsub_dump(path, ack_state=state).count() == 0


def test_pubsub_publisher_roundtrip(ray_session, sf_dir, tmp_path):
    """subscriber∘publisher = identity, and an ordering key's messages
    stay in ONE shard file (the ordered-delivery guarantee)."""
    src = corpus.ensure_pubsub_dump(sf_dir)
    out = str(tmp_path / "published")
    write_pubsub_dump(read_pubsub_dump(src), out)
    files = sorted(os.listdir(out))
    assert len(files) == PUBSUB_SHARDS
    seen = {}
    for fn in files:
        with open(os.path.join(out, fn)) as f:
            for line in f:
                key = json.loads(line)["message"]["orderingKey"]
                assert seen.setdefault(key, fn) == fn  # one shard per key
    a = read_pubsub_dump(src).to_pandas().sort_values(
        "message_id").reset_index(drop=True)
    b = read_pubsub_dump(out).to_pandas().sort_values(
        "message_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
