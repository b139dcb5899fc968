"""kubelet_stats receiver analogue: /stats/summary captures → datapoints.

The reference registers the contrib kubeletstats receiver
(/root/reference/internal/components/components.go:243) and ships an
in-tree kubelet consumer — the smartagent kubernetes/volumes monitor,
which POSTs to the kubelet's ``/stats/summary/`` endpoint and emits one
gauge per present volume field with pod dims
(/root/reference/internal/signalfx-agent/pkg/monitors/kubernetes/volumes/
volumes.go:85-127, request `:131-136`).  As with hostmetrics and
docker_stats, the POLLING side is out of scope; the capture is one
``summary.json`` per node per 10 s tick holding the public k8s
stats/v1alpha1 Summary shape (node / pods / containers / volumeStats),
and this module is the conversion math:

  summary_stats(path)  node/pod/container long table —
    k8s.node.cpu.time / k8s.pod.cpu.time / container.cpu.time
        cumulative seconds = usageCoreNanoSeconds / 1e9
    k8s.node.cpu.usage / k8s.pod.cpu.usage
        gauge cores = usageNanoCores / 1e9
    k8s.{node,pod}.memory.working_set / container.memory.working_set
        gauge bytes = workingSetBytes
    k8s.{node,pod}.network.io
        cumulative bytes, attr direction = receive(rxBytes) /
        transmit(txBytes)
  volume_stats(path)  the volumes-monitor gauges —
    kubernetes.volume_available_bytes / _capacity_bytes / _inodes /
    _inodes_free / _inodes_used, dims (volume, kubernetes_pod_name,
    kubernetes_namespace, kubernetes_pod_uid), each emitted only when
    the field is present (volumes.go:107-125)

Scale shape: nodes × ticks JSON files regardless of corpus scale; the
per-file decode is snapshot-bounded.  All counters derive
integer-exactly from the transcript corpus; the /1e9 divisions are
single int→double ops, IEEE-identical to the SQL twins.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .procfs import _coords, _snapshot_ds, scrape_ts_us

KS_PODS = 3  # pods per node; a turn lands on pod (conv // 2) % 3
KS_CONTAINERS = 2  # containers per pod; a turn lands on turn_idx % 2
KS_VOL_CAPACITY = 68_719_476_736  # 64 GiB per-pod volume
KS_VOL_INODES = 1_048_576

_NS = 1_000_000_000.0


def render_summary(node: str, node_stats: dict, pods: "list[dict]") -> str:
    """The /stats/summary JSON subset the conversions read."""
    return json.dumps({"node": {"nodeName": node, **node_stats},
                       "pods": pods}, separators=(",", ":"))


def pod_entry(name: str, namespace: str, uid: str, cpu_ns: int,
              nano_cores: int, ws: int, rx: int, tx: int,
              containers: "list[dict]", volume: dict) -> dict:
    return {
        "podRef": {"name": name, "namespace": namespace, "uid": uid},
        "cpu": {"usageCoreNanoSeconds": cpu_ns,
                "usageNanoCores": nano_cores},
        "memory": {"workingSetBytes": ws},
        "network": {"rxBytes": rx, "txBytes": tx},
        "containers": containers,
        "volumeStats": [volume],
    }


def summary_stats(path: str) -> "ray.data.Dataset":
    """Node/pod/container metrics as one long table: (node, ts, level,
    pod, namespace, container, metric, direction, value:double)."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"node": [], "ts": [], "level": [], "pod": [],
                "namespace": [], "container": [], "metric": [],
                "direction": [], "value": []}

        def emit(node, ts, level, pod, ns, ctr, metric, direction, v):
            rows["node"].append(node)
            rows["ts"].append(ts)
            rows["level"].append(level)
            rows["pod"].append(pod)
            rows["namespace"].append(ns)
            rows["container"].append(ctr)
            rows["metric"].append(metric)
            rows["direction"].append(direction)
            rows["value"].append(float(v))

        def stats_of(node, ts, level, pod, ns, ctr, prefix, st):
            cpu, mem = st.get("cpu"), st.get("memory")
            if cpu and "usageCoreNanoSeconds" in cpu:
                emit(node, ts, level, pod, ns, ctr, prefix + ".cpu.time",
                     "", cpu["usageCoreNanoSeconds"] / _NS)
            if cpu and "usageNanoCores" in cpu:
                emit(node, ts, level, pod, ns, ctr, prefix + ".cpu.usage",
                     "", cpu["usageNanoCores"] / _NS)
            if mem and "workingSetBytes" in mem:
                emit(node, ts, level, pod, ns, ctr,
                     prefix + ".memory.working_set", "",
                     mem["workingSetBytes"])
            net = st.get("network")
            if net:
                emit(node, ts, level, pod, ns, ctr,
                     prefix + ".network.io", "receive", net["rxBytes"])
                emit(node, ts, level, pod, ns, ctr,
                     prefix + ".network.io", "transmit", net["txBytes"])

        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            _host, s = _coords(p)
            ts = scrape_ts_us(s)
            doc = json.loads(raw.decode("utf-8"))
            node = doc["node"]["nodeName"]
            stats_of(node, ts, "node", "", "", "", "k8s.node",
                     doc["node"])
            for pod in doc.get("pods", []):
                ref = pod["podRef"]
                stats_of(node, ts, "pod", ref["name"], ref["namespace"],
                         "", "k8s.pod", pod)
                for ctr in pod.get("containers", []):
                    stats_of(node, ts, "container", ref["name"],
                             ref["namespace"], ctr["name"], "container",
                             ctr)
        ts = pa.array(rows.pop("ts"), type=pa.timestamp("us"))
        value = pa.array(rows.pop("value"), type=pa.float64())
        cols = {k: pa.array(v, type=pa.string()) for k, v in rows.items()}
        cols["ts"] = ts
        cols["value"] = value
        return pa.table(cols)

    return _snapshot_ds(path, "summary.json").map_batches(
        parse, batch_format="pyarrow")


_VOLUME_FIELDS = (
    ("availableBytes", "kubernetes.volume_available_bytes"),
    ("capacityBytes", "kubernetes.volume_capacity_bytes"),
    ("inodes", "kubernetes.volume_inodes"),
    ("inodesFree", "kubernetes.volume_inodes_free"),
    ("inodesUsed", "kubernetes.volume_inodes_used"))


def volume_stats(path: str) -> "ray.data.Dataset":
    """The volumes-monitor gauges (volumes.go:107-125): one row per
    present field per pod volume, dims exactly the monitor's."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"node": [], "ts": [], "volume": [],
                "kubernetes_pod_name": [], "kubernetes_namespace": [],
                "kubernetes_pod_uid": [], "metric": [], "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            _host, s = _coords(p)
            ts = scrape_ts_us(s)
            doc = json.loads(raw.decode("utf-8"))
            node = doc["node"]["nodeName"]
            for pod in doc.get("pods", []):
                ref = pod["podRef"]
                for v in pod.get("volumeStats", []):
                    for field, metric in _VOLUME_FIELDS:
                        if field not in v:
                            continue
                        rows["node"].append(node)
                        rows["ts"].append(ts)
                        rows["volume"].append(v["name"])
                        rows["kubernetes_pod_name"].append(ref["name"])
                        rows["kubernetes_namespace"].append(
                            ref["namespace"])
                        rows["kubernetes_pod_uid"].append(ref["uid"])
                        rows["metric"].append(metric)
                        rows["value"].append(v[field])
        ts = pa.array(rows.pop("ts"), type=pa.timestamp("us"))
        value = pa.array(rows.pop("value"), type=pa.int64())
        cols = {k: pa.array(v, type=pa.string()) for k, v in rows.items()}
        cols["ts"] = ts
        cols["value"] = value
        return pa.table(cols)

    return _snapshot_ds(path, "summary.json").map_batches(
        parse, batch_format="pyarrow")
