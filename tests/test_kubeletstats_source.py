"""kubelet_stats analogue: /stats/summary capture decode at node/pod/
container levels, present-only field emission, the volumes-monitor
gauges (volumes.go:107-125 dims + skip-absent), and the config path."""

import pytest

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources import kubeletstats as kl


def _hand_dump(tmp_path):
    """One node × two ticks, one pod with one container; the volume omits
    inodesFree and the container has no network/nanocores fields."""
    for s in range(2):
        d = tmp_path / "host-0" / f"scrape-{s:04d}"
        d.mkdir(parents=True)
        ctr = {"name": "c0",
               "cpu": {"usageCoreNanoSeconds": 7_000_000_000 * (s + 1)},
               "memory": {"workingSetBytes": 11111 * (s + 1)}}
        vol = {"name": "vol-0", "availableBytes": 500 - s,
               "capacityBytes": 1000, "inodes": 64,
               "inodesUsed": 3 + s}  # inodesFree absent
        pod = kl.pod_entry("pod-0", "ns-0", "uid-0-0",
                           cpu_ns=2_500_000_000 * (s + 1),
                           nano_cores=250_000_000,
                           ws=4096, rx=100 * (s + 1), tx=40 * (s + 1),
                           containers=[ctr], volume=vol)
        node = {"cpu": {"usageCoreNanoSeconds": 9_000_000_000 * (s + 1),
                        "usageNanoCores": 750_000_000},
                "memory": {"workingSetBytes": 22222},
                "network": {"rxBytes": 100 * (s + 1),
                            "txBytes": 40 * (s + 1)}}
        (d / "summary.json").write_text(
            kl.render_summary("host-0", node, [pod]))
    return str(tmp_path)


def test_summary_levels_and_units(ray_session, tmp_path):
    df = kl.summary_stats(_hand_dump(tmp_path)).to_pandas()
    # node 5 + pod 5 + container 2 metrics × 2 ticks
    assert len(df) == (5 + 5 + 2) * 2
    t0 = df[df.ts == df.ts.min()]
    node = t0[t0.level == "node"].set_index(["metric", "direction"])
    # cumulative ns → seconds, nanocores → cores
    assert node.loc[("k8s.node.cpu.time", ""), "value"] == 9.0
    assert node.loc[("k8s.node.cpu.usage", ""), "value"] == 0.75
    assert node.loc[("k8s.node.network.io", "receive"), "value"] == 100
    assert node.loc[("k8s.node.network.io", "transmit"), "value"] == 40
    pod = t0[t0.level == "pod"].set_index("metric")
    assert pod.loc["k8s.pod.cpu.time", "value"] == 2.5
    assert (pod["pod"] == "pod-0").all() and (
        pod["namespace"] == "ns-0").all()
    ctr = t0[t0.level == "container"]
    # container entries carry no nanocores/network → only 2 metrics
    assert set(ctr["metric"]) == {"container.cpu.time",
                                  "container.memory.working_set"}
    assert ctr[ctr.metric == "container.cpu.time"]["value"].iloc[0] == 7.0
    assert (ctr["container"] == "c0").all()


def test_volume_gauges_present_only(ray_session, tmp_path):
    df = kl.volume_stats(_hand_dump(tmp_path)).to_pandas()
    # 4 present fields (inodesFree omitted) × 2 ticks
    assert len(df) == 4 * 2
    assert "kubernetes.volume_inodes_free" not in set(df["metric"])
    one = df[df.ts == df.ts.min()].set_index("metric")["value"]
    assert one["kubernetes.volume_available_bytes"] == 500
    assert one["kubernetes.volume_capacity_bytes"] == 1000
    assert one["kubernetes.volume_inodes_used"] == 3
    assert (df["kubernetes_pod_uid"] == "uid-0-0").all()
    assert (df["volume"] == "vol-0").all()


def test_kubelet_dump_and_config(ray_session, sf_dir, tmp_path):
    import yaml

    from splunk_otel_collector_ray.config import build_pipeline
    from splunk_otel_collector_ray.configio import collector_to_spec
    from splunk_otel_collector_ray.sources.procfs import _snapshot_files

    path = corpus.ensure_kubelet_dump(sf_dir)
    files = _snapshot_files(path, "summary.json")
    assert len(files) == 4 * 16
    before = open(files[0], "rb").read()
    corpus.ensure_kubelet_dump(sf_dir, force=True)
    assert open(files[0], "rb").read() == before

    doc = yaml.safe_load(f"""
receivers:
  kubelet_stats:
    path: {path}
exporters:
  debug:
service:
  pipelines:
    logs:
      receivers: [kubelet_stats]
      exporters: [debug]
""")
    df = build_pipeline(collector_to_spec(doc)).to_pandas()
    assert set(df["level"]) == {"node", "pod", "container"}
    # node counters are cumulative and strictly above the per-tick base
    node_t = df[(df.level == "node") & (df.metric == "k8s.node.cpu.time")
                & (df.node == "host-0")].sort_values("ts")["value"]
    assert node_t.is_monotonic_increasing and len(node_t) == 16
