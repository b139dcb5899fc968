"""Skew handling (hot-key detection, salted buckets) + correlation store."""

import numpy as np
import pytest


def test_detect_hot_keys_finds_corpus_skew(ray_session, sf_dir):
    from splunk_otel_collector_ray.partitioning import detect_hot_keys
    from splunk_otel_collector_ray.pipelines.logs import read_transcripts

    ds = read_transcripts(sf_dir)
    hot = detect_hot_keys(ds, "conv_id", threshold_rows=100)
    # corpus: first ~1% of convs are hot (~30% of rows); at sf0.001 that is
    # ~5 conversations of ~600 turns each
    assert 1 <= len(hot) <= 20
    assert all(k.startswith("conv-0000000") for k in hot)


def test_hot_convs_query_matches_oracle(ray_session, sf_dir):
    import duckdb

    from splunk_otel_collector_ray import corpus
    from splunk_otel_collector_ray.partitioning import key_counts
    from splunk_otel_collector_ray.pipelines.logs import read_transcripts

    pdf = key_counts(read_transcripts(sf_dir), "conv_id").to_pandas()
    got = set(pdf.loc[pdf.n > 100, "conv_id"])
    tglob = corpus.ensure_transcripts(sf_dir) + "/*.parquet"
    exp = {r[0] for r in duckdb.sql(
        f"SELECT conv_id FROM read_parquet('{tglob}') GROUP BY conv_id "
        "HAVING COUNT(*) > 100").fetchall()}
    assert got == exp


def test_salted_span_durations_equals_unsalted_on_skewed_corpus(ray_session):
    """One conversation owns 30k of ~36k turns: the salted two-pass plan must
    (a) return row-identical results to the plain whole-conv bucketing and
    (b) never put the whole hot conversation into one bucket."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from splunk_otel_collector_ray.partitioning import (
        detect_hot_keys,
        salted_bucket,
        salted_span_durations,
    )
    from splunk_otel_collector_ray.stages.metrics import span_durations

    n_hot, n_cold_convs, cold_len = 30_000, 20, 300
    conv = (["conv-hot"] * n_hot
            + [f"conv-c{i:03d}" for i in range(n_cold_convs)
               for _ in range(cold_len)])
    turn = list(range(n_hot)) + list(range(cold_len)) * n_cold_convs
    n = len(conv)
    rng = np.random.default_rng(5)
    role = np.where(rng.integers(0, 3, n) == 0, "tool", "assistant")
    tool = np.where(role == "tool", "bash", "")
    ts = pd.to_datetime(1_700_000_000_000_000
                        + np.arange(n, dtype=np.int64) * 1_000_000, unit="us")
    t = pa.table({"conv_id": conv,
                  "turn_idx": pa.array(np.array(turn, dtype=np.int32)),
                  "role": role.astype(object), "tool": tool.astype(object),
                  "ts": pa.array(ts, type=pa.timestamp("us"))})
    ds = ray.data.from_arrow(t).repartition(8)

    plain = span_durations(ds).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    salted = salted_span_durations(
        ds, hot_threshold=5000, chunk=4096).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted)

    # bound check: the hot conv's rows spread over >1 bucket, and no bucket
    # holds more than ~2 chunks of it (chunks collide only at stride `salt`)
    hot = detect_hot_keys(ds, "conv_id", 5000)
    assert hot == {"conv-hot"}
    b = salted_bucket(np.array(["conv-hot"] * n_hot, dtype=object),
                      np.arange(n_hot) // 4096, hot, num_buckets=64)
    counts = np.bincount(b, minlength=64)
    assert (counts > 0).sum() >= 4
    assert counts.max() <= 2 * 4096


def test_salted_bucket_spreads_hot_key():
    from splunk_otel_collector_ray.partitioning import salted_bucket

    keys = np.array(["hot"] * 1000 + ["cold"] * 10, dtype=object)
    sub = np.arange(1010)
    b = salted_bucket(keys, sub, {"hot"}, num_buckets=64, salt=8)
    assert len(set(b[:1000])) == 8       # hot key spread over 8 sub-buckets
    assert len(set(b[1000:])) == 1       # cold key stays on one bucket
    # deterministic
    assert (b == salted_bucket(keys, sub, {"hot"}, 64, 8)).all()


def test_correlation_store(ray_session):
    import ray

    from splunk_otel_collector_ray.state.correlation import CorrelationStore

    store = CorrelationStore.remote()
    ray.get(store.upsert.remote("ep1", {"receiver": "redis"}, ts=100.0))
    ray.get(store.upsert.remote("ep1", {"receiver": "mysql"}, ts=50.0))
    # last-write-wins by ts: the older write must not clobber
    assert ray.get(store.get.remote("ep1")) == {"receiver": "redis"}
    ray.get(store.upsert.remote("ep2", "x", ts=10.0))
    assert ray.get(store.size.remote()) == 2
    # TTL reap drops only stale entries (endpoint_tracker interval loop)
    assert ray.get(store.reap.remote(ttl_seconds=60.0, now=120.0)) == 1
    assert ray.get(store.get.remote("ep2")) is None
    # emit-once LoadOrStore semantics (evaluator.go:110-113)
    assert ray.get(store.emit_once.remote("k")) is True
    assert ray.get(store.emit_once.remote("k")) is False
    # never-upserted emit-once keys reap by their own emit time (bounded
    # memory over a long stream of one-shot status keys) …
    assert ray.get(store.emit_once.remote("s1", now=100.0)) is True
    ray.get(store.reap.remote(ttl_seconds=60.0, now=200.0))
    assert ray.get(store.emit_once.remote("s1", now=200.0)) is True
    # … while a key backed by a FRESH endpoint stays deduped across reaps
    ray.get(store.upsert.remote("ep3", "v", ts=200.0))
    assert ray.get(store.emit_once.remote("ep3", now=100.0)) is True
    ray.get(store.reap.remote(ttl_seconds=60.0, now=220.0))
    assert ray.get(store.emit_once.remote("ep3", now=220.0)) is False


@pytest.mark.parametrize("seed,n_blocks,domain", [
    (0, 37, 64 * 64),   # production-shaped: spread domain >> blocks
    (1, 128, 256),      # domain barely above block count
    (2, 5, 4096),       # few fat blocks
])
def test_bucket_fold_never_splits_a_bucket(ray_session, seed, n_blocks,
                                           domain):
    """THE bucket_fold correctness assumption, pinned directly: after the
    sort exchange, every bucket value lands WHOLE in exactly one output
    block (Ray's range partitioner sends boundary-equal keys to one
    side), so a bucket-agnostic fold sees unions of complete buckets.
    The fold here emits one (bucket, n, s) row per bucket IN ITS BLOCK —
    a bucket split across blocks would surface as duplicate bucket rows.
    Also checks the folded per-bucket sums against ground truth."""
    import pandas as pd
    import ray

    from splunk_otel_collector_ray.partitioning import bucket_fold, pd_table

    rng = np.random.default_rng(seed)
    n = 60_000
    # skewed bucket distribution (zipf-ish) over a configurable domain
    bucket = (rng.zipf(1.3, n) * 2654435761 % domain).astype("int64")
    val = rng.integers(0, 1000, n, dtype="int64")
    df = pd.DataFrame({"bucket": bucket, "val": val})
    ds = ray.data.from_pandas(
        [df.iloc[i::n_blocks].reset_index(drop=True)
         for i in range(n_blocks)])

    def fold(d: "pd.DataFrame"):
        g = d.groupby("bucket", sort=False)["val"].agg(
            n="size", s="sum").reset_index()
        return pd_table(g)

    out = bucket_fold(ds, "bucket", fold).to_pandas()
    # exactly one fold row per distinct bucket value == no bucket ever
    # straddled an output-block boundary
    assert out["bucket"].is_unique
    truth = df.groupby("bucket")["val"].agg(n="size", s="sum")
    got = out.set_index("bucket").sort_index()
    assert (got["n"] == truth["n"]).all() and (got["s"] == truth["s"]).all()
    assert len(got) == len(truth)
