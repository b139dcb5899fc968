"""Observer extension analogues: endpoint discovery → entity-state rows.

The reference registers docker/host/k8s/ecs observer extensions
(/root/reference/internal/components/components.go:186-195) whose
endpoints feed the discovery receiver's endpoint tracker, which converts
each endpoint env to entity-state events
(/root/reference/internal/receiver/discoveryreceiver/
endpoint_tracker.go).  The WATCH transports are out of scope; the
endpoints derive from the docker_stats and k8s_cluster captures this
repo already stages, and this module ports the tracker's conversion
semantics faithfully:

- ``endpointEnvToAttrs`` mapping (endpoint_tracker.go:295-352):
  container_id → container.id, container_name/name → container.name,
  pod name/namespace/uid → k8s.pod.name / k8s.namespace.name /
  k8s.pod.uid, node name/uid → k8s.node.name / k8s.node.uid.
- ``extractServiceName`` precedence (endpoint_tracker.go:362-410):
  labels app.kubernetes.io/instance → app.kubernetes.io/name → app →
  pod-name owner via the k8s name-suffix regexp
  (endpoint_tracker.go:55, built from apimachinery's rand suffix
  alphabet) → process/container name → "unknown".
- Observer listing semantics: the k8s observer lists pods that are
  scheduled and running — only Running-phase pods emit endpoints; the
  docker observer lists the engine's containers; nodes always list.

Output is one ''-aligned entity table: (ts, observer, endpoint_id,
endpoint_type, service_name, k8s_pod_name, k8s_namespace_name,
k8s_pod_uid, k8s_node_name, k8s_node_uid, container_id,
container_name).  Snapshot-bounded: the object sweep is hosts×ticks
files, never turn-bounded.
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa

from .procfs import _coords, scrape_ts_us

# endpoint_tracker.go:55 — owner-object extraction from a pod name
# (ReplicaSet hash / random suffix or ordinal)
K8S_POD_RX = re.compile(
    r"^(.+?)-(?:(?:[0-9bcdf]+-)?[bcdfghjklmnpqrstvwxz2456789]{5}|[0-9]+)$")

_COLUMNS = ("observer", "endpoint_id", "endpoint_type", "service_name",
            "k8s_pod_name", "k8s_namespace_name", "k8s_pod_uid",
            "k8s_node_name", "k8s_node_uid", "container_id",
            "container_name")


def service_name_from_labels(labels: "dict | None") -> "str | None":
    """The label-precedence head of extractServiceName
    (endpoint_tracker.go:374-387)."""
    if labels:
        for key in ("app.kubernetes.io/instance", "app.kubernetes.io/name",
                    "app"):
            if key in labels:
                return labels[key]
    return None


def pod_service_name(name: str, labels: "dict | None") -> str:
    svc = service_name_from_labels(labels)
    if svc is not None:
        return svc
    m = K8S_POD_RX.match(name)
    if m:
        return m.group(1)
    return "unknown"


def _table(rows: "dict[str, list]") -> pa.Table:
    ts = pa.array(rows.pop("ts"), type=pa.timestamp("us"))
    cols = {k: pa.array(v, type=pa.string()) for k, v in rows.items()}
    cols["ts"] = ts
    return pa.table(cols)


def _new_rows() -> "dict[str, list]":
    return {k: [] for k in ("ts",) + _COLUMNS}


def _emit(rows, ts, **kw):
    rows["ts"].append(ts)
    for c in _COLUMNS:
        rows[c].append(kw.get(c, ""))


def k8s_observer_endpoints(k8s_dump: str) -> "ray.data.Dataset":
    """PodType + K8sNodeType endpoints from the cluster snapshots: only
    Running pods list (the observer requires a scheduled, running pod);
    nodes always list, with the 'unknown' service-name fallback."""
    import ray.data

    from .k8scluster import _snapshot_files

    def parse(batch: pa.Table) -> pa.Table:
        rows = _new_rows()
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            s = int(os.path.basename(os.path.dirname(p)).split("-")[1])
            ts = scrape_ts_us(s)
            for it in json.loads(raw.decode("utf-8"))["items"]:
                md = it["metadata"]
                if it["kind"] == "Pod":
                    if it["status"]["phase"] != "Running":
                        continue
                    _emit(rows, ts, observer="k8s_observer",
                          endpoint_id=md["uid"], endpoint_type="pod",
                          service_name=pod_service_name(
                              md["name"], md.get("labels")),
                          k8s_pod_name=md["name"],
                          k8s_namespace_name=md["namespace"],
                          k8s_pod_uid=md["uid"],
                          k8s_node_name=it["spec"]["nodeName"])
                elif it["kind"] == "Node":
                    _emit(rows, ts, observer="k8s_observer",
                          endpoint_id=md.get("uid", md["name"]),
                          endpoint_type="k8s.node",
                          service_name="unknown",
                          k8s_node_name=md["name"],
                          k8s_node_uid=md.get("uid", ""))
        return _table(rows)

    return ray.data.read_binary_files(
        _snapshot_files(k8s_dump), include_paths=True).map_batches(
        parse, batch_format="pyarrow")


def docker_observer_endpoints(docker_dump: str) -> "ray.data.Dataset":
    """ContainerType endpoints from the docker stats capture: one per
    container listed by the engine; service name falls through to the
    container name (endpoint_tracker.go:405-407)."""
    from .procfs import _snapshot_ds

    def parse(batch: pa.Table) -> pa.Table:
        rows = _new_rows()
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            _host, s = _coords(p)
            ts = scrape_ts_us(s)
            for line in raw.decode("utf-8").splitlines():
                if not line:
                    continue
                st = json.loads(line)
                name = st["name"].lstrip("/")
                _emit(rows, ts, observer="docker_observer",
                      endpoint_id=st["id"], endpoint_type="container",
                      service_name=name, container_id=st["id"],
                      container_name=name)
        return _table(rows)

    return _snapshot_ds(docker_dump, "docker").map_batches(
        parse, batch_format="pyarrow")


def observer_endpoints(k8s_dump: str,
                       docker_dump: str) -> "ray.data.Dataset":
    """Both observers' entity tables unioned (same aligned schema)."""
    return k8s_observer_endpoints(k8s_dump).union(
        docker_observer_endpoints(docker_dump))
