"""Observer analogues: the endpoint tracker's service-name precedence
chain (labels → pod-owner regexp → container name → unknown), the
Running-pods-only listing, and the k8s pod owner regexp port."""

import pytest

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources import k8scluster as kc
from splunk_otel_collector_ray.sources import observers as ob


def test_pod_owner_regexp_port():
    # apimachinery rand-suffix / ordinal shapes (endpoint_tracker.go:55)
    assert ob.pod_service_name("nginx-7bf8c77b5b-2vxdz", None) == "nginx"
    assert ob.pod_service_name("web-0", None) == "web"
    assert ob.pod_service_name("solo", None) == "unknown"
    # label precedence beats the name
    assert ob.pod_service_name(
        "web-0", {"app": "x", "app.kubernetes.io/name": "y",
                  "app.kubernetes.io/instance": "z"}) == "z"
    assert ob.pod_service_name(
        "web-0", {"app": "x", "app.kubernetes.io/name": "y"}) == "y"
    assert ob.pod_service_name("web-0", {"app": "x"}) == "x"


def test_k8s_observer_running_only(ray_session, tmp_path):
    d = tmp_path / "scrape-0000"
    d.mkdir(parents=True)
    pods = [{"name": "api-12345", "namespace": "ns-0", "uid": "u1",
             "node": "host-0", "phase": "Running", "containers": []},
            {"name": "pod-9", "namespace": "ns-0", "uid": "u2",
             "node": "host-0", "phase": "Pending", "containers": []}]
    nodes = [{"name": "host-0", "uid": "nuid-0", "ready": True}]
    (d / "objects.json").write_text(kc.render_objects(pods, [], nodes))
    df = ob.k8s_observer_endpoints(str(tmp_path)).to_pandas()
    # the Pending pod does not list; the node always does
    assert len(df) == 2
    pod = df[df.endpoint_type == "pod"].iloc[0]
    assert pod["endpoint_id"] == "u1"
    assert pod["service_name"] == "api"  # owner via the suffix regexp
    assert pod["k8s_node_name"] == "host-0"
    node = df[df.endpoint_type == "k8s.node"].iloc[0]
    assert node["service_name"] == "unknown"
    assert node["k8s_node_uid"] == "nuid-0"
    assert node["k8s_pod_uid"] == ""  # ''-aligned absent dims


def test_observer_union_over_corpus(ray_session, sf_dir):
    k8s = corpus.ensure_k8s_dump(sf_dir)
    dkr = corpus.ensure_docker_dump(sf_dir)
    df = ob.observer_endpoints(k8s, dkr).to_pandas()
    assert set(df["observer"]) == {"k8s_observer", "docker_observer"}
    # containers and nodes always list: 12 containers + 4 nodes × 16 ticks
    assert (df.observer == "docker_observer").sum() == 12 * 16
    assert (df.endpoint_type == "k8s.node").sum() == 4 * 16
    pods = df[df.endpoint_type == "pod"]
    # only Running pods list, and the precedence chain maps each pod id
    assert 0 < len(pods) < 12 * 16
    svc = pods.groupby(pods["k8s_pod_name"])["service_name"].unique()
    assert list(svc["pod-0"]) == ["inst-0"]  # app.kubernetes.io/instance
    assert list(svc["pod-1"]) == ["pod"]  # owner regexp on the name
    assert list(svc["pod-2"]) == ["app-2"]  # app label
    ctr = df[df.observer == "docker_observer"].iloc[0]
    assert ctr["service_name"] == ctr["container_name"]
