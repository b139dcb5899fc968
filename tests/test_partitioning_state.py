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
