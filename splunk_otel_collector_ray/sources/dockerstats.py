"""docker_stats monitor analogue: Docker stats-API capture → datapoints.

The reference's smartagent docker monitor polls the Docker engine API and
converts each container's StatsResponse into SignalFx datapoints
(/root/reference/internal/signalfx-agent/pkg/monitors/docker/
conversion.go:30-207).  As with hostmetrics/kafka/pubsub, the POLLING side
is out of scope for a batch engine; the DATA semantics port over a
*capture*: one ``docker`` JSONL file per host per 10 s tick, one
stats-API JSON object per container line.  This module is the conversion
math:

  basic set (conversion.go's always-on metrics):
    cpu.usage.total / cpu.usage.system        cumulative ns counters
    memory.usage.limit                        gauge bytes
    memory.usage.total                        gauge Usage − total_cache
                                              (conversion.go:156-160)
    network.usage.rx_bytes / tx_bytes         cumulative, attr interface
    blkio.io_service_bytes_recursive.read/
      .write                                  cumulative, op lowercased,
                                              attr major.minor
                                              (conversion.go:60-91)
  enhanced gauges (container_percent):
    cpu.percent      (Δtotal/Δsystem)·onlineCPUs·100, zero unless both
                     deltas are positive; prior = previous tick's counters
                     (zeros at the first tick, like the monitor's first
                     poll) — conversion.go:128-147
    memory.percent   100·(usage − cache)/limit — conversion.go:165-167

Dimensions mirror ConvertStatsToMetrics (conversion.go:40-55): container
name with the leading '/' trimmed, image, id; host comes from the capture
coordinates.  All counters derive integer-exactly from the transcript
corpus, so DuckDB oracles replay every value (the two percent gauges are
single int→double divisions, IEEE-identical on both sides).

Scale shape: hosts × ticks JSONL files regardless of corpus scale; the
per-line json loop is snapshot-bounded, never turn-bounded.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .procfs import _coords, _snapshot_ds, scrape_ts_us

DK_CONTAINERS = 3  # containers per host; a turn lands on conv % 3
DK_MEM_LIMIT = 2_147_483_648  # 2 GiB memory_stats.limit
DK_ONLINE_CPUS = 2

_BASIC_METRICS = (
    "cpu.usage.total", "cpu.usage.system", "memory.usage.limit",
    "memory.usage.total", "network.usage.rx_bytes",
    "network.usage.tx_bytes", "blkio.io_service_bytes_recursive.read",
    "blkio.io_service_bytes_recursive.write")


def render_stats_line(cid: str, name: str, image: str, total_ns: int,
                      system_ns: int, mem_usage: int, mem_cache: int,
                      rx: int, tx: int, blk_read: int,
                      blk_write: int) -> str:
    """One stats-API JSON object (the subset the monitor reads), field
    names per the Docker engine API / moby container.StatsResponse."""
    return json.dumps({
        "id": cid, "name": "/" + name, "image": image,
        "cpu_stats": {"cpu_usage": {"total_usage": total_ns},
                      "system_cpu_usage": system_ns,
                      "online_cpus": DK_ONLINE_CPUS},
        "memory_stats": {"usage": mem_usage, "limit": DK_MEM_LIMIT,
                         "stats": {"cache": mem_cache,
                                   "total_cache": mem_cache}},
        "networks": {"eth0": {"rx_bytes": rx, "tx_bytes": tx}},
        "blkio_stats": {"io_service_bytes_recursive": [
            {"major": 8, "minor": 0, "op": "Read", "value": blk_read},
            {"major": 8, "minor": 0, "op": "Write", "value": blk_write}]},
    }, separators=(",", ":"))


def _decode_lines(batch: pa.Table):
    for p, raw in zip(batch["path"].to_pylist(),
                      batch["bytes"].to_pylist()):
        host, s = _coords(p)
        ts = scrape_ts_us(s)
        for line in raw.decode("utf-8").splitlines():
            if line:
                yield host, s, ts, json.loads(line)


def container_stats(path: str) -> "ray.data.Dataset":
    """The basic (non-enhanced) metric set as one long table:
    (host, ts, container_name, container_id, container_image, metric,
    attr, value:int64) — attr carries the interface for network.* and
    major.minor for blkio.*, '' elsewhere."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "container_name": [],
                "container_id": [], "container_image": [], "metric": [],
                "attr": [], "value": []}

        def emit(host, ts, st, metric, attr, value):
            rows["host"].append(host)
            rows["ts"].append(ts)
            rows["container_name"].append(st["name"].lstrip("/"))
            rows["container_id"].append(st["id"])
            rows["container_image"].append(st["image"])
            rows["metric"].append(metric)
            rows["attr"].append(attr)
            rows["value"].append(value)

        for host, _s, ts, st in _decode_lines(batch):
            cpu, mem = st["cpu_stats"], st["memory_stats"]
            emit(host, ts, st, "cpu.usage.total", "",
                 cpu["cpu_usage"]["total_usage"])
            emit(host, ts, st, "cpu.usage.system", "",
                 cpu["system_cpu_usage"])
            emit(host, ts, st, "memory.usage.limit", "", mem["limit"])
            emit(host, ts, st, "memory.usage.total", "",
                 mem["usage"] - mem["stats"].get("total_cache", 0))
            for iface, n in st.get("networks", {}).items():
                emit(host, ts, st, "network.usage.rx_bytes", iface,
                     n["rx_bytes"])
                emit(host, ts, st, "network.usage.tx_bytes", iface,
                     n["tx_bytes"])
            for e in st["blkio_stats"]["io_service_bytes_recursive"]:
                if not e.get("op"):
                    continue
                emit(host, ts, st,
                     "blkio.io_service_bytes_recursive."
                     + e["op"].lower(),
                     f"{e['major']}.{e['minor']}", e["value"])
        ts = pa.array(rows.pop("ts"), type=pa.timestamp("us"))
        value = pa.array(rows.pop("value"), type=pa.int64())
        cols = {k: pa.array(v, type=pa.string()) for k, v in rows.items()}
        cols["ts"] = ts
        cols["value"] = value
        return pa.table(cols)

    return _snapshot_ds(path, "docker").map_batches(
        parse, batch_format="pyarrow")


def container_percent(path: str) -> "ray.data.Dataset":
    """The enhanced percent gauges: cpu.percent (delta vs the previous
    tick, zeros as the first tick's prior — the monitor's in-memory
    ``prior`` starts empty) and memory.percent, per (host, ts,
    container).  Snapshot-bounded input → one small_fold pass."""
    import pandas as pd

    from ..partitioning import small_fold

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "s": [], "container_name": [],
                "total": [], "system": [], "usage": [], "cache": [],
                "limit": []}
        for host, s, ts, st in _decode_lines(batch):
            rows["host"].append(host)
            rows["ts"].append(ts)
            rows["s"].append(s)
            rows["container_name"].append(st["name"].lstrip("/"))
            rows["total"].append(st["cpu_stats"]["cpu_usage"]
                                 ["total_usage"])
            rows["system"].append(st["cpu_stats"]["system_cpu_usage"])
            rows["usage"].append(st["memory_stats"]["usage"])
            rows["cache"].append(st["memory_stats"]["stats"]
                                 .get("cache", 0))
            rows["limit"].append(st["memory_stats"]["limit"])
        t = {k: pa.array(v) for k, v in rows.items()}
        t["ts"] = pa.array(rows["ts"], type=pa.timestamp("us"))
        return pa.table(t)

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["host", "container_name", "s"],
                          kind="mergesort")
        keys = ["host", "container_name"]
        dt = (g["total"] - g.groupby(keys, sort=False)["total"]
              .shift(1).fillna(0)).to_numpy(dtype="float64")
        ds = (g["system"] - g.groupby(keys, sort=False)["system"]
              .shift(1).fillna(0)).to_numpy(dtype="float64")
        cpu_pct = np.zeros(len(g))
        ok = (dt > 0) & (ds > 0)
        cpu_pct[ok] = dt[ok] / ds[ok] * DK_ONLINE_CPUS * 100.0
        mem_pct = (100.0
                   * (g["usage"].to_numpy(dtype="float64")
                      - g["cache"].to_numpy(dtype="float64"))
                   / g["limit"].to_numpy(dtype="float64"))
        out = pd.concat([
            g[["host", "ts", "container_name"]].assign(
                metric="cpu.percent", value=cpu_pct),
            g[["host", "ts", "container_name"]].assign(
                metric="memory.percent", value=mem_pct)])
        return out[["host", "ts", "container_name", "metric", "value"]]

    ds = _snapshot_ds(path, "docker").map_batches(
        parse, batch_format="pyarrow")
    return small_fold(ds, fold, batch_format="pandas")
