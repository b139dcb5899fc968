"""docker_stats monitor analogue: stats-API JSONL capture decode, the
basic datapoint set (derived memory.usage.total, lowercased blkio ops,
trimmed container name), and the delta-based percent gauges
(conversion.go:128-147 math: prior = previous tick, zeros first)."""

import numpy as np
import pytest

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources import dockerstats as dk


def _hand_dump(tmp_path):
    """Two hosts × two ticks × one container with hand-chosen counters."""
    vals = {(0, 0): (1_000_000, 40_000_000, 9000, 1000, 10, 20, 512, 256),
            (0, 1): (3_000_000, 90_000_000, 12000, 2000, 30, 60, 1024, 768),
            (1, 0): (0, 10_000_000, 0, 0, 0, 0, 0, 0),
            (1, 1): (0, 20_000_000, 0, 0, 0, 0, 0, 0)}
    for (h, s), (tot, sys, usg, cch, rx, tx, br, bw) in vals.items():
        d = tmp_path / f"host-{h}" / f"scrape-{s:04d}"
        d.mkdir(parents=True)
        (d / "docker").write_text(dk.render_stats_line(
            f"ctr-{h}-0", "svc-0", "img-0", tot, sys, usg, cch,
            rx, tx, br, bw) + "\n")
    return str(tmp_path)


def test_basic_set_parse(ray_session, tmp_path):
    df = dk.container_stats(_hand_dump(tmp_path)).to_pandas()
    # 2 hosts × 2 ticks × 8 basic metrics
    assert len(df) == 2 * 2 * 8
    one = df[(df.host == "host-0") & (df.ts == df.ts.min())].set_index(
        "metric")
    assert one.loc["cpu.usage.total", "value"] == 1_000_000
    assert one.loc["cpu.usage.system", "value"] == 40_000_000
    # derived used: usage − total_cache (conversion.go:156-160)
    assert one.loc["memory.usage.total", "value"] == 9000 - 1000
    assert one.loc["memory.usage.limit", "value"] == dk.DK_MEM_LIMIT
    # blkio ops land lowercased with major.minor attr (conversion.go:79-87)
    blk = one.loc["blkio.io_service_bytes_recursive.read"]
    assert blk["value"] == 512 and blk["attr"] == "8.0"
    net = one.loc["network.usage.rx_bytes"]
    assert net["value"] == 10 and net["attr"] == "eth0"
    # leading '/' trimmed from the API name (conversion.go:47)
    assert set(df["container_name"]) == {"svc-0"}
    assert set(df["container_id"]) == {"ctr-0-0", "ctr-1-0"}


def test_percent_gauges_docker_cli_math(ray_session, tmp_path):
    df = dk.container_percent(_hand_dump(tmp_path)).to_pandas()
    assert len(df) == 2 * 2 * 2
    h0 = df[df.host == "host-0"].sort_values("ts")
    cpu = h0[h0.metric == "cpu.percent"]["value"].to_numpy()
    # tick 0: prior is zeros → deltas are the raw counters
    assert cpu[0] == 1_000_000 / 40_000_000 * 2 * 100.0
    # tick 1: (Δtotal/Δsystem)·onlineCPUs·100
    assert cpu[1] == 2_000_000 / 50_000_000 * 2 * 100.0
    mem = h0[h0.metric == "memory.percent"]["value"].to_numpy()
    assert mem[0] == 100.0 * (9000 - 1000) / dk.DK_MEM_LIMIT
    # idle container: both deltas must be > 0, else 0.0 (not NaN/negative)
    h1 = df[(df.host == "host-1") & (df.metric == "cpu.percent")]
    assert (h1["value"] == 0.0).all()
    assert not df["value"].isna().any()


def test_docker_config_pipeline(ray_session, tmp_path):
    """Collector-style YAML with a docker_stats receiver builds the
    basic-set reader."""
    import yaml

    from splunk_otel_collector_ray.config import build_pipeline
    from splunk_otel_collector_ray.configio import collector_to_spec

    path = _hand_dump(tmp_path / "dump")
    doc = yaml.safe_load(f"""
receivers:
  docker_stats:
    path: {path}
exporters:
  debug:
service:
  pipelines:
    logs:
      receivers: [docker_stats]
      exporters: [debug]
""")
    df = build_pipeline(collector_to_spec(doc)).to_pandas()
    assert len(df) == 2 * 2 * 8
    assert set(df["metric"]) == set(dk._BASIC_METRICS)


def test_docker_dump_deterministic(ray_session, sf_dir):
    path = corpus.ensure_docker_dump(sf_dir)
    from splunk_otel_collector_ray.sources.procfs import _snapshot_files

    files = _snapshot_files(path, "docker")
    assert len(files) == 4 * 16  # hosts × ticks regardless of corpus size
    before = {f: open(f, "rb").read() for f in files[:8]}
    corpus.ensure_docker_dump(sf_dir, force=True)
    for f, blob in before.items():
        assert open(f, "rb").read() == blob
    # every tick holds DK_CONTAINERS JSON lines
    assert len(open(files[0]).read().splitlines()) == dk.DK_CONTAINERS
    # cumulative counters: last tick's total dominates the first's
    stats = dk.container_stats(path).to_pandas()
    tot = stats[(stats.metric == "cpu.usage.total")
                & (stats.container_id == "ctr-0-0")].sort_values("ts")
    v = tot["value"].to_numpy()
    assert len(v) == 16 and np.all(np.diff(v) >= 0)
