"""k8s_cluster analogue: object-snapshot decode — the receiver's
phase-string → 1..5 mapping, Ready-condition booleans, restart counts,
deployment replica gauges, and the config-builder path."""

import pytest

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources import k8scluster as kc


def _hand_dump(tmp_path):
    for s, (phase, ready, rst, avail) in enumerate(
            (("Running", True, 0, 2), ("Failed", False, 3, 1))):
        d = tmp_path / f"scrape-{s:04d}"
        d.mkdir(parents=True)
        pods = [{"name": "pod-0", "namespace": "ns-0", "uid": "uid-0-0",
                 "node": "host-0", "phase": phase,
                 "containers": [{"name": "c0", "restartCount": rst,
                                 "ready": phase == "Running"}]},
                {"name": "pod-1", "namespace": "ns-1", "uid": "uid-0-1",
                 "node": "host-0", "phase": "Pending", "containers": []}]
        deps = [{"name": "deploy-0", "namespace": "ns-0",
                 "desired": 4, "available": avail}]
        nodes = [{"name": "host-0", "ready": ready}]
        (d / "objects.json").write_text(
            kc.render_objects(pods, deps, nodes))
    return str(tmp_path)


def test_object_gauges(ray_session, tmp_path):
    df = kc.cluster_metrics(_hand_dump(tmp_path)).to_pandas()
    t0, t1 = sorted(df["ts"].unique())
    # phase string → the receiver's 1..5 code
    ph = df[df.metric == "k8s.pod.phase"].set_index(["pod", "ts"])["value"]
    assert ph[("pod-0", t0)] == 2 and ph[("pod-0", t1)] == 4
    assert ph[("pod-1", t0)] == 1
    ctr = df[df.pod == "pod-0"].set_index(["metric", "ts"])["value"]
    assert ctr[("k8s.container.restarts", t1)] == 3
    assert ctr[("k8s.container.ready", t0)] == 1
    assert ctr[("k8s.container.ready", t1)] == 0
    dep = df[df.deployment == "deploy-0"].set_index(
        ["metric", "ts"])["value"]
    assert dep[("k8s.deployment.desired", t0)] == 4
    assert dep[("k8s.deployment.available", t1)] == 1
    nod = df[df.metric == "k8s.node.condition_ready"].set_index(
        "ts")["value"]
    assert nod[t0] == 1 and nod[t1] == 0
    # ''-aligned absent dims keep the union schema stable
    assert (df[df.metric == "k8s.pod.phase"]["container"] == "").all()
    assert (df[df.metric == "k8s.deployment.desired"]["node"] == "").all()


def test_k8s_dump_and_config(ray_session, sf_dir):
    import yaml

    from splunk_otel_collector_ray.config import build_pipeline
    from splunk_otel_collector_ray.configio import collector_to_spec

    path = corpus.ensure_k8s_dump(sf_dir)
    files = kc._snapshot_files(path)
    assert len(files) == 16  # one snapshot per tick, no host dimension
    before = open(files[3], "rb").read()
    corpus.ensure_k8s_dump(sf_dir, force=True)
    assert open(files[3], "rb").read() == before

    doc = yaml.safe_load(f"""
receivers:
  k8s_cluster:
    path: {path}
exporters:
  debug:
service:
  pipelines:
    logs:
      receivers: [k8s_cluster]
      exporters: [debug]
""")
    df = build_pipeline(collector_to_spec(doc)).to_pandas()
    # 12 pods + 24 container-pairs ×2 + 3 deployments ×2 + 4 nodes = 70/tick
    assert len(df) == 70 * 16
    assert set(df[df.metric == "k8s.pod.phase"]["value"]) <= {1, 2, 3, 4, 5}
    # deployment availability never exceeds the desired replica count
    d = df[df.deployment != ""].pivot_table(
        index=["deployment", "ts"], columns="metric", values="value")
    assert (d["k8s.deployment.available"]
            <= d["k8s.deployment.desired"]).all()
    # restart counters are monotone per (pod, uid, container)
    r = df[df.metric == "k8s.container.restarts"].sort_values("ts")
    for _, grp in r.groupby(["uid", "container"]):
        assert grp["value"].is_monotonic_increasing
