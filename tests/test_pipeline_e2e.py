"""End-to-end pipeline tests (Ray session): flagship run, per-sink equality,
resumable manifests, and the driver-style oracle parity harness."""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pytest


def test_sinkwriter_retry_idempotent_and_empty_batch(tmp_path):
    from splunk_otel_collector_ray.stages.export import SinkWriter

    batch = pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "sink": ["sink_a", "sink_b", "sink_a"],
        "severity_text": ["", "ERROR", ""],
        "tool": ["", "", "bash"],
    })
    w = SinkWriter(str(tmp_path))
    c1 = w(batch)
    files1 = sorted(glob.glob(f"{tmp_path}/**/*.parquet", recursive=True))
    c2 = w(batch)  # a Ray task retry re-executes the same batch
    files2 = sorted(glob.glob(f"{tmp_path}/**/*.parquet", recursive=True))
    assert files1 == files2          # deterministic names → same files
    assert c1.equals(c2)             # identical partial counts
    # zero-row batch (possible after upstream filters): no files, no counts
    ce = w(batch.slice(0, 0))
    assert ce.num_rows == 0
    assert sorted(glob.glob(f"{tmp_path}/**/*.parquet",
                            recursive=True)) == files1


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    out = e.entry()
    assert len(out) > 0
    assert {"sink", "severity_text", "tool", "n"} <= set(out.columns)
    assert out.n.sum() == 10_000  # every turn lands in exactly one sink


def test_flagship_counts_match_oracle(ray_session, sf_dir, tmp_path):
    import duckdb

    from splunk_otel_collector_ray import corpus
    from splunk_otel_collector_ray.pipelines.logs import run_flagship

    out = run_flagship(sf_dir, str(tmp_path / "flag"))
    tglob = os.path.join(corpus.ensure_transcripts(sf_dir), "*.parquet")
    import __ray_entry__ as e

    sql = e.oracle_sql()["route_counts"].replace(e.ORACLE_TGLOB, tglob)
    exp = dict(duckdb.sql(sql).fetchall())
    assert out["sink_counts"] == {k: int(v) for k, v in exp.items()}
    # routed parquet exists per sink (hive layout)
    assert sorted(os.path.basename(p) for p in
                  glob.glob(str(tmp_path / "flag" / "by_sink" / "sink=*"))) == [
        "sink=sink_assistant", "sink=sink_default", "sink=sink_errors",
        "sink=sink_tools"]


def test_routed_rows_stable_order_and_text_equality(ray_session, sf_dir, tmp_path):
    """North-rule check: per-turn body equality under (conv_id, turn_idx)
    ordering, reassembled from the per-sink outputs."""
    import duckdb

    from splunk_otel_collector_ray import corpus
    from splunk_otel_collector_ray.pipelines.logs import run_flagship

    out = run_flagship(sf_dir, str(tmp_path / "flag2"))
    files = glob.glob(str(tmp_path / "flag2" / "by_sink" / "sink=*" / "*.parquet"))
    got = (
        pd.concat([pd.read_parquet(f, columns=["conv_id", "turn_idx", "body"])
                   for f in files])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    import __ray_entry__ as e

    tglob = os.path.join(corpus.ensure_transcripts(sf_dir), "*.parquet")
    sql = e.oracle_sql()["parse_records"].replace(e.ORACLE_TGLOB, tglob)
    exp = (duckdb.sql(sql).fetchdf()[["conv_id", "turn_idx", "body"]]
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert got.equals(exp)


def test_resumable_skips_completed(ray_session, sf_dir, tmp_path):
    from splunk_otel_collector_ray.pipelines.logs import run_resumable
    from splunk_otel_collector_ray.state import manifest as mf

    out_dir = str(tmp_path / "res")
    r1 = run_resumable(sf_dir, out_dir)
    assert r1["processed"] and not r1["skipped"]
    r2 = run_resumable(sf_dir, out_dir)
    assert not r2["processed"] and r2["skipped"]
    # corrupting one manifest forces exactly that partition to rerun
    part = r2["skipped"][0]
    pdir = os.path.join(out_dir, f"part={part}")
    os.remove(mf.manifest_path(pdir))
    r3 = run_resumable(sf_dir, out_dir)
    assert list(r3["processed"]) == [part]
    assert set(r3["skipped"]) == set(r2["skipped"]) - {part}
    # manifest contents: lineage fields present, counts consistent
    m = mf.read_manifest(pdir)
    assert m["rows"] == sum(m["sink_counts"].values())
    assert m["fingerprint"] == mf.input_fingerprint(m["input"])


@pytest.mark.parametrize("subset", [
    {"parse_records", "parse_ts", "route_rows", "route_counts",
     "sink_aggregate", "enrich"},
    {"sanitize", "severity_transform", "truncate", "spans",
     "timestamp_offset", "filter_severity", "sampler"},
    {"recombine", "tail_sample"},
    {"events_count", "events_sum", "events_filtered", "events_window",
     "events_delta", "events_topk", "lineitem_pricing"},
    {"docs_exact_dedup", "docs_token_stats", "docs_quality", "emb_ann_topk"},
])
def test_oracle_parity(ray_session, sf_dir, subset):
    from splunk_otel_collector_ray.oracle_check import run_parity

    fails = run_parity(sf_dir, subset, log=lambda *_: None)
    assert not fails, fails


def test_resumable_resets_partial_output(ray_session, sf_dir, tmp_path):
    """A partition with files on disk but NO manifest (crash mid-write) must
    be wiped and reprocessed — the exactly-once recovery path."""
    import json

    from splunk_otel_collector_ray.pipelines.logs import run_resumable
    from splunk_otel_collector_ray.state import manifest as mf

    out_dir = str(tmp_path / "resx")
    r1 = run_resumable(sf_dir, out_dir)
    part = list(r1["processed"])[0]
    pdir = os.path.join(out_dir, f"part={part}")
    # simulate a crash: drop the manifest, plant junk partial output
    os.remove(mf.manifest_path(pdir))
    junk = os.path.join(pdir, "sink=sink_tools", "junk.parquet")
    with open(junk, "w") as f:
        f.write("not parquet")
    r2 = run_resumable(sf_dir, out_dir)
    assert part in r2["processed"]
    assert not os.path.exists(junk)  # partial output was reset
    m = mf.read_manifest(pdir)
    assert m["rows"] == r1["processed"][part]["rows"]
    # rows must equal severity roll-up too (lineage self-consistency)
    assert m["rows"] == sum(m["severity_counts"].values())


def test_resumable_multi_partition_matrix(ray_session, tmp_path):
    """3 input part files: complete ones skip, the stale one resets, a NEW
    part joins an existing run — the full skip/reset/extend matrix."""
    import pyarrow.parquet as pq

    from splunk_otel_collector_ray import corpus
    from splunk_otel_collector_ray.pipelines.logs import run_resumable
    from splunk_otel_collector_ray.state import manifest as mf

    t = corpus.build_transcripts("sf0.001")
    src = tmp_path / "src"
    src.mkdir()
    # conv-aligned thirds (conv never spans: split at conv boundaries)
    conv = t.column("conv_id").to_pandas().to_numpy()
    cuts = [0]
    for k in (1, 2):
        i = k * t.num_rows // 3
        while conv[i] == conv[i - 1]:
            i += 1
        cuts.append(i)
    cuts.append(t.num_rows)
    for k in range(3):
        pq.write_table(t.slice(cuts[k], cuts[k + 1] - cuts[k]),
                       str(src / f"part-{k:03d}.parquet"))
    out = str(tmp_path / "out")

    r1 = run_resumable(str(src), out)
    assert sorted(r1["processed"]) == ["part-000", "part-001", "part-002"]
    total = sum(m["rows"] for m in r1["processed"].values())
    assert total == t.num_rows

    # invalidate ONE partition's manifest; rewrite a NEW fourth part
    os.remove(mf.manifest_path(os.path.join(out, "part=part-001")))
    pq.write_table(t.slice(0, 500), str(src / "part-003.parquet"))
    r2 = run_resumable(str(src), out)
    assert sorted(r2["processed"]) == ["part-001", "part-003"]
    assert sorted(r2["skipped"]) == ["part-000", "part-002"]
    # reprocessed partition reproduces identical counts
    assert (r2["processed"]["part-001"]["sink_counts"]
            == r1["processed"]["part-001"]["sink_counts"])


def test_two_tier_matches_single_tier(ray_session, sf_dir, tmp_path):
    """agent→gateway split must reproduce the single-tier flagship exactly
    (same per-sink counts) — the tier boundary is pure transport."""
    from splunk_otel_collector_ray.pipelines.logs import run_flagship
    from splunk_otel_collector_ray.pipelines.two_tier import run_two_tier

    single = run_flagship(sf_dir, str(tmp_path / "single"))
    double = run_two_tier(sf_dir, str(tmp_path / "double"))
    assert double["sink_counts"] == single["sink_counts"]
    assert double["rows"] == single["rows"]


def test_two_tier_over_otlp_json_wire(ray_session, sf_dir, tmp_path):
    """transport='otlp' stages REAL ExportLogsServiceRequest JSON between
    the tiers; the gateway must see the identical stream (same per-sink
    counts as parquet staging) and the staged files must be valid OTLP-JSON
    with spec-shaped fields."""
    import json

    from splunk_otel_collector_ray.pipelines.two_tier import run_two_tier

    pq = run_two_tier(sf_dir, str(tmp_path / "pq"), transport="parquet")
    ot = run_two_tier(sf_dir, str(tmp_path / "ot"), transport="otlp")
    assert ot["sink_counts"] == pq["sink_counts"]
    assert ot["rows"] == pq["rows"]

    # binary protobuf transport: same stream, same counts
    pb = run_two_tier(sf_dir, str(tmp_path / "pb"), transport="otlp_pb")
    assert pb["sink_counts"] == pq["sink_counts"]

    staged = sorted((tmp_path / "ot" / "staging").glob("req-*.json"))
    assert staged
    req = json.loads(staged[0].read_text())
    rl = req["resourceLogs"][0]
    assert {a["key"] for a in rl["resource"]["attributes"]} >= {
        "host.name", "k8s.pod.name"}
    rec = rl["scopeLogs"][0]["logRecords"][0]
    assert rec["timeUnixNano"].isdigit()  # proto3 JSON uint64 = string
    assert "stringValue" in rec.get("body", {"stringValue": ""})


def test_transient_task_failure_retries_exactly_once(ray_session, tmp_path):
    """Retry/backoff analogue of the exporter sending_queue: a map stage
    that fails transiently (first attempt per flag file) completes under
    retry_exceptions and produces exactly the unfailed row set — no loss,
    no duplication."""
    import os

    import pyarrow as pa
    import ray.data

    flag = str(tmp_path / "failed_once")

    def flaky(batch: pa.Table) -> pa.Table:
        if not os.path.exists(flag):
            with open(flag, "w") as f:
                f.write("x")
            raise RuntimeError("transient export failure (injected)")
        return batch

    from splunk_otel_collector_ray.pipelines.logs import read_transcripts

    ds = read_transcripts("/root/testdata/sf0.001").map_batches(
        flaky, batch_format="pyarrow",
        retry_exceptions=True, max_retries=3)
    df = ds.groupby("role").count().to_pandas()
    assert os.path.exists(flag)              # the failure really fired
    assert int(df["count()"].sum()) == 10_000  # every row exactly once
