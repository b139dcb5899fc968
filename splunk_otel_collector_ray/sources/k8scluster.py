"""k8s_cluster receiver analogue: object-state snapshots → cluster metrics.

The reference registers the contrib k8scluster receiver
(/root/reference/internal/components/components.go:238), which watches
the Kubernetes API's object state and emits point-in-time gauges per
object.  The WATCH transport is out of scope for a batch engine; the
capture is one ``objects.json`` per 10 s tick holding the public
k8s-API-shaped object list (Pods with status.phase +
containerStatuses, Deployments with spec.replicas /
status.availableReplicas, Nodes with the Ready condition), and this
module is the conversion:

  k8s.pod.phase                gauge 1..5 — the receiver's
                               Pending/Running/Succeeded/Failed/Unknown
                               mapping, dims (namespace, pod, uid, node)
  k8s.container.restarts       gauge, restartCount per containerStatus
  k8s.container.ready          gauge 0/1 from the ready bool
  k8s.deployment.desired       gauge = spec.replicas
  k8s.deployment.available     gauge = status.availableReplicas
  k8s.node.condition_ready     gauge 0/1 from the Ready condition

Scale shape: one JSON file per tick regardless of corpus scale — the
object sweep is snapshot-bounded.  The capture derivation is
corpus-swept and integer-exact (phase classifies each pod's per-tick
activity sum; availableReplicas counts its Running pods), so DuckDB
replays every value.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from .procfs import scrape_ts_us

PHASES = {"Pending": 1, "Running": 2, "Succeeded": 3, "Failed": 4,
          "Unknown": 5}
_PHASE_NAMES = {v: k for k, v in PHASES.items()}


def phase_name(code: int) -> str:
    return _PHASE_NAMES[code]


def render_objects(pods: "list[dict]", deployments: "list[dict]",
                   nodes: "list[dict]") -> str:
    """One snapshot: a k8s-API-shaped item list."""
    items = []
    for p in pods:
        md = {"name": p["name"], "namespace": p["namespace"],
              "uid": p["uid"]}
        if p.get("labels"):
            md["labels"] = p["labels"]
        items.append({
            "kind": "Pod",
            "metadata": md,
            "spec": {"nodeName": p["node"]},
            "status": {"phase": p["phase"],
                       "containerStatuses": p["containers"]},
        })
    for d in deployments:
        items.append({
            "kind": "Deployment",
            "metadata": {"name": d["name"], "namespace": d["namespace"]},
            "spec": {"replicas": d["desired"]},
            "status": {"availableReplicas": d["available"]},
        })
    for n in nodes:
        md = {"name": n["name"]}
        if n.get("uid"):
            md["uid"] = n["uid"]
        items.append({
            "kind": "Node",
            "metadata": md,
            "status": {"conditions": [
                {"type": "Ready",
                 "status": "True" if n["ready"] else "False"}]},
        })
    return json.dumps({"items": items}, separators=(",", ":"))


def _snapshot_files(path: str) -> "list[str]":
    out = []
    for scrape in sorted(os.listdir(path)):
        f = os.path.join(path, scrape, "objects.json")
        if scrape.startswith("scrape-") and os.path.isfile(f):
            out.append(f)
    if not out:
        raise FileNotFoundError(f"no objects.json snapshots under {path}")
    return out


def cluster_metrics(path: str) -> "ray.data.Dataset":
    """All object gauges as one long table: (ts, namespace, pod, uid,
    node, deployment, container, metric, value:int64) with ''-aligned
    absent dims."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"ts": [], "namespace": [], "pod": [], "uid": [],
                "node": [], "deployment": [], "container": [],
                "metric": [], "value": []}

        def emit(ts, metric, value, namespace="", pod="", uid="",
                 node="", deployment="", container=""):
            rows["ts"].append(ts)
            rows["namespace"].append(namespace)
            rows["pod"].append(pod)
            rows["uid"].append(uid)
            rows["node"].append(node)
            rows["deployment"].append(deployment)
            rows["container"].append(container)
            rows["metric"].append(metric)
            rows["value"].append(value)

        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            s = int(os.path.basename(os.path.dirname(p)).split("-")[1])
            ts = scrape_ts_us(s)
            for it in json.loads(raw.decode("utf-8"))["items"]:
                kind, md = it["kind"], it["metadata"]
                if kind == "Pod":
                    dims = dict(namespace=md["namespace"],
                                pod=md["name"], uid=md["uid"],
                                node=it["spec"]["nodeName"])
                    emit(ts, "k8s.pod.phase",
                         PHASES[it["status"]["phase"]], **dims)
                    for cs in it["status"].get("containerStatuses", []):
                        emit(ts, "k8s.container.restarts",
                             cs["restartCount"], container=cs["name"],
                             **dims)
                        emit(ts, "k8s.container.ready",
                             1 if cs["ready"] else 0,
                             container=cs["name"], **dims)
                elif kind == "Deployment":
                    emit(ts, "k8s.deployment.desired",
                         it["spec"]["replicas"],
                         namespace=md["namespace"],
                         deployment=md["name"])
                    emit(ts, "k8s.deployment.available",
                         it["status"]["availableReplicas"],
                         namespace=md["namespace"],
                         deployment=md["name"])
                elif kind == "Node":
                    ready = any(
                        c["type"] == "Ready" and c["status"] == "True"
                        for c in it["status"]["conditions"])
                    emit(ts, "k8s.node.condition_ready",
                         1 if ready else 0, node=md["name"])
        ts = pa.array(rows.pop("ts"), type=pa.timestamp("us"))
        value = pa.array(rows.pop("value"), type=pa.int64())
        cols = {k: pa.array(v, type=pa.string()) for k, v in rows.items()}
        cols["ts"] = ts
        cols["value"] = value
        return pa.table(cols)

    return ray.data.read_binary_files(
        _snapshot_files(path), include_paths=True).map_batches(
        parse, batch_format="pyarrow")
