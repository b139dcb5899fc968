"""hostmetrics scraper analogue: /proc snapshot dumps → ``system.*``
datapoints.

The reference enables the hostmetrics receiver's cpu/disk/filesystem/
memory/network/load/paging/processes scrapers at a 10 s collection
interval (/root/reference/cmd/otelcol/config/collector/
full_config_linux.yaml:104-120).  The POLLING side (an agent reading the
live /proc at each tick) is out of scope for a batch engine, but the DATA
semantics port cleanly — exactly the treatment the kafka/pubsub/eventhub/
pulsar/solace receivers got: the input is a *capture* of what the agent
would have read (one directory per host per scrape tick holding verbatim
``/proc/stat``, ``/proc/meminfo``, ``/proc/net/dev``, ``/proc/diskstats``
and ``/proc/loadavg`` text), and this module is the scraper math that
turns those files into the OTel metric scheme:

  cpu        system.cpu.time            cumulative double seconds,
                                        attrs (cpu, state×8)
  memory     system.memory.usage        gauge bytes, attr state — with the
                                        Linux scraper's derived ``used`` =
                                        MemTotal−MemFree−Buffers−Cached
  network    system.network.io/packets  cumulative, attrs (device, direction)
  disk       system.disk.operations/io  cumulative ops / sector-bytes,
                                        attrs (device, direction)
  load       system.cpu.load_average.*  gauge doubles parsed digit-exact
  processes  system.processes.created   cumulative; .count gauges by status
  filesystem system.filesystem.usage    gauge bytes + .inodes.usage, attrs
                                        (device, mountpoint, fstype, state)
  paging     system.paging.usage        gauge swap bytes (used/free/cached);
             system.paging.operations   cumulative by (direction, type)
             system.paging.faults       cumulative by type, minor =
                                        pgfault − pgmajfault like the real
                                        scraper
  cpu util   system.cpu.utilization     per-interval delta(state)/delta(all)
                                        — the cumulativetodelta processor
                                        shape applied to scraped counters

Scale shape: a dump holds hosts × scrapes snapshot FILES (a few KB each) —
the per-file Python parse loop is bounded by snapshot count, never by turn
count, and each ``scrape_*`` reader passes the exact file list to
``read_binary_files`` so only that scraper's files leave storage.  All
derived datapoints use integer arithmetic (or a single int/int double
division) so a DuckDB oracle replays them bit-exactly.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa

# dump geometry (shared with corpus.ensure_proc_dump and the SQL oracles)
HM_HOSTS = 4
HM_SCRAPES = 16
HM_CPUS = 2
HM_INTERVAL_US = 10_000_000  # 10 s tick, full_config_linux.yaml:106
HM_BASE_US = 1_767_225_600_000_000  # == corpus.BASE_EPOCH_US (2026-01-01)
HM_TOTAL_KB = 67_108_864  # MemTotal: a 64 GiB host
HM_SWAP_KB = 8_388_608  # SwapTotal: 8 GiB
USER_HZ = 100  # jiffies → seconds divisor (the kernel's exported clock tick)

CPU_STATES = ("user", "nice", "system", "idle", "iowait", "irq",
              "softirq", "steal")
MEM_STATES = ("used", "free", "buffered", "cached")
# filesystem capture geometry: (device, mountpoint, fstype, total_kb,
# inodes_total) per mounted fs — two mounts per host like a root+data split
FS_MOUNTS = (("sda1", "/", "ext4", 268_435_456, 16_777_216),
             ("sdb1", "/data", "xfs", 134_217_728, 16_777_216))

# ---------------------------------------------------------------------------
# render (the capture writer — corpus.ensure_proc_dump drives these)
# ---------------------------------------------------------------------------


def render_stat(cpu_jiffies: "list[list[int]]", processes: int,
                procs_running: int, procs_blocked: int) -> str:
    """Verbatim ``/proc/stat`` text: per-cpu jiffy counters in CPU_STATES
    field order plus the fork/state process lines the processes scraper
    reads. ``cpu_jiffies[c]`` is the 8-state row for cpuN."""
    total = [sum(col) for col in zip(*cpu_jiffies)]
    lines = ["cpu  " + " ".join(str(v) for v in total)]
    for c, row in enumerate(cpu_jiffies):
        lines.append(f"cpu{c} " + " ".join(str(v) for v in row))
    lines += [
        "intr 0", "ctxt 0", f"btime {HM_BASE_US // 1_000_000}",
        f"processes {processes}",
        f"procs_running {procs_running}",
        f"procs_blocked {procs_blocked}",
    ]
    return "\n".join(lines) + "\n"


def render_meminfo(free_kb: int, buffers_kb: int, cached_kb: int,
                   swap_free_kb: int = HM_SWAP_KB,
                   swap_cached_kb: int = 0) -> str:
    return (f"MemTotal:       {HM_TOTAL_KB} kB\n"
            f"MemFree:        {free_kb} kB\n"
            f"Buffers:        {buffers_kb} kB\n"
            f"Cached:         {cached_kb} kB\n"
            f"SwapCached:     {swap_cached_kb} kB\n"
            f"SwapTotal:      {HM_SWAP_KB} kB\n"
            f"SwapFree:       {swap_free_kb} kB\n")


def render_vmstat(pgpgin: int, pgpgout: int, pswpin: int, pswpout: int,
                  pgfault: int, pgmajfault: int) -> str:
    """``/proc/vmstat`` counter lines the paging scraper reads (cumulative
    page-io, swap-io and fault counts)."""
    return (f"pgpgin {pgpgin}\npgpgout {pgpgout}\n"
            f"pswpin {pswpin}\npswpout {pswpout}\n"
            f"pgfault {pgfault}\npgmajfault {pgmajfault}\n")


def render_df(used_kb: "dict[str, tuple[int, int]]") -> str:
    """Filesystem capture (the df/statvfs view the filesystem scraper
    would take): one row per FS_MOUNTS entry —
    device mount fstype total_kb used_kb inodes_total inodes_used."""
    lines = []
    for dev, mount, fstype, total_kb, itotal in FS_MOUNTS:
        u, iu = used_kb[dev]
        lines.append(f"{dev} {mount} {fstype} {total_kb} {u} {itotal} {iu}")
    return "\n".join(lines) + "\n"


def render_net_dev(ifaces: "dict[str, tuple[int, int, int, int]]") -> str:
    """``/proc/net/dev`` with its two header lines; per interface the
    16-field counter row (rx bytes/packets + 6 zeros, tx likewise)."""
    lines = [
        "Inter-|   Receive                                                "
        "|  Transmit",
        " face |bytes    packets errs drop fifo frame compressed multicast"
        "|bytes    packets errs drop fifo colls carrier compressed",
    ]
    for name, (rxb, rxp, txb, txp) in ifaces.items():
        lines.append(f"{name:>6}: {rxb} {rxp} 0 0 0 0 0 0 "
                     f"{txb} {txp} 0 0 0 0 0 0")
    return "\n".join(lines) + "\n"


def render_diskstats(devs: "dict[str, tuple[int, int, int, int]]") -> str:
    """``/proc/diskstats`` rows: major minor name reads merged sectors ms
    writes merged sectors ms (+ in-flight/io-ms tail zeros)."""
    lines = []
    for i, (name, (rd, rsect, wr, wsect)) in enumerate(devs.items()):
        lines.append(f"   8 {i * 16:>7} {name} {rd} 0 {rsect} 0 "
                     f"{wr} 0 {wsect} 0 0 0 0")
    return "\n".join(lines) + "\n"


def render_loadavg(l1_centi: int, l5_centi: int, l15_centi: int,
                   running: int, total: int, last_pid: int) -> str:
    def d(c: int) -> str:
        return f"{c // 100}.{c % 100:02d}"

    return (f"{d(l1_centi)} {d(l5_centi)} {d(l15_centi)} "
            f"{running}/{total} {last_pid}\n")


# ---------------------------------------------------------------------------
# parse (the scraper readers)
# ---------------------------------------------------------------------------

_COORD_RX = re.compile(r"(host-\d+)/scrape-(\d+)/")
_STAT_CPU_RX = re.compile(
    r"^cpu(\d+) +(\d+) +(\d+) +(\d+) +(\d+) +(\d+) +(\d+) +(\d+) +(\d+)",
    re.M)
_STAT_KV_RX = re.compile(r"^(processes|procs_running|procs_blocked) +(\d+)",
                         re.M)
_MEMINFO_RX = re.compile(r"^(MemTotal|MemFree|Buffers|Cached): +(\d+) kB",
                         re.M)
_SWAP_RX = re.compile(r"^(SwapCached|SwapTotal|SwapFree): +(\d+) kB", re.M)
_VMSTAT_RX = re.compile(
    r"^(pgpgin|pgpgout|pswpin|pswpout|pgfault|pgmajfault) (\d+)", re.M)
_DF_RX = re.compile(
    r"^(\S+) (\S+) (\S+) (\d+) (\d+) (\d+) (\d+)", re.M)
_NET_RX = re.compile(r"^ *(\w+): +(\d+) +(\d+)(?: +\d+){6} +(\d+) +(\d+)",
                     re.M)
_DISK_RX = re.compile(
    r"^ +\d+ +\d+ +(\w+) +(\d+) +\d+ +(\d+) +\d+ +(\d+) +\d+ +(\d+)", re.M)
_LOAD_RX = re.compile(
    r"^(\d+)\.(\d+) (\d+)\.(\d+) (\d+)\.(\d+) (\d+)/(\d+)")


def _coords(path: str) -> "tuple[str, int]":
    m = _COORD_RX.search(path)
    if m is None:
        raise ValueError(f"not a proc-dump path: {path}")
    return m.group(1), int(m.group(2))


def scrape_ts_us(scrape: int) -> int:
    return HM_BASE_US + scrape * HM_INTERVAL_US


def _snapshot_files(path: str, fname: str) -> "list[str]":
    """Exact file list for one scraper family — hosts × scrapes paths, so
    the read never touches the other families' files."""
    out = []
    for host in sorted(os.listdir(path)):
        hdir = os.path.join(path, host)
        if not (host.startswith("host-") and os.path.isdir(hdir)):
            continue
        for scrape in sorted(os.listdir(hdir)):
            f = os.path.join(hdir, scrape, fname)
            if scrape.startswith("scrape-") and os.path.isfile(f):
                out.append(f)
    if not out:
        raise FileNotFoundError(f"no {fname} snapshots under {path}")
    return out


def _snapshot_ds(path: str, fname: str) -> "ray.data.Dataset":
    import ray.data

    return ray.data.read_binary_files(_snapshot_files(path, fname),
                                      include_paths=True)


def _dp_table(rows: "dict[str, list]", value_type: pa.DataType) -> pa.Table:
    ts = pa.array(rows.pop("ts"), type=pa.timestamp("us"))
    cols = {k: pa.array(v, type=pa.string()) for k, v in rows.items()
            if k != "value"}
    cols["ts"] = ts
    cols["value"] = pa.array(rows["value"], type=value_type)
    return pa.table(cols)


def scrape_cpu(path: str) -> "ray.data.Dataset":
    """system.cpu.time: cumulative CPU seconds by (host, cpu, state) —
    jiffies / USER_HZ, every /proc/stat state emitted (zeros included,
    like the real scraper's full state dimension)."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "cpu": [], "state": [], "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            host, s = _coords(p)
            ts = scrape_ts_us(s)
            for m in _STAT_CPU_RX.finditer(raw.decode("ascii")):
                for i, state in enumerate(CPU_STATES):
                    rows["host"].append(host)
                    rows["ts"].append(ts)
                    rows["cpu"].append("cpu" + m.group(1))
                    rows["state"].append(state)
                    rows["value"].append(int(m.group(2 + i)) / USER_HZ)
        return _dp_table(rows, pa.float64())

    return _snapshot_ds(path, "stat").map_batches(
        parse, batch_format="pyarrow")


def scrape_memory(path: str) -> "ray.data.Dataset":
    """system.memory.usage: gauge bytes by (host, state) with the Linux
    scraper's derived used = MemTotal − MemFree − Buffers − Cached."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "state": [], "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            host, s = _coords(p)
            kv = {m.group(1): int(m.group(2))
                  for m in _MEMINFO_RX.finditer(raw.decode("ascii"))}
            used = (kv["MemTotal"] - kv["MemFree"] - kv["Buffers"]
                    - kv["Cached"])
            vals = {"used": used, "free": kv["MemFree"],
                    "buffered": kv["Buffers"], "cached": kv["Cached"]}
            for state in MEM_STATES:
                rows["host"].append(host)
                rows["ts"].append(scrape_ts_us(s))
                rows["state"].append(state)
                rows["value"].append(vals[state] * 1024)
        return _dp_table(rows, pa.int64())

    return _snapshot_ds(path, "meminfo").map_batches(
        parse, batch_format="pyarrow")


def scrape_network(path: str) -> "ray.data.Dataset":
    """system.network.io / system.network.packets: cumulative byte and
    packet counters by (host, device, direction)."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "device": [], "direction": [],
                "metric": [], "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            host, s = _coords(p)
            ts = scrape_ts_us(s)
            for m in _NET_RX.finditer(raw.decode("ascii")):
                dev, rxb, rxp, txb, txp = (m.group(1), int(m.group(2)),
                                           int(m.group(3)), int(m.group(4)),
                                           int(m.group(5)))
                for metric, direction, v in (
                        ("system.network.io", "receive", rxb),
                        ("system.network.io", "transmit", txb),
                        ("system.network.packets", "receive", rxp),
                        ("system.network.packets", "transmit", txp)):
                    rows["host"].append(host)
                    rows["ts"].append(ts)
                    rows["device"].append(dev)
                    rows["direction"].append(direction)
                    rows["metric"].append(metric)
                    rows["value"].append(v)
        return _dp_table(rows, pa.int64())

    return _snapshot_ds(path, "net_dev").map_batches(
        parse, batch_format="pyarrow")


def scrape_disk(path: str) -> "ray.data.Dataset":
    """system.disk.operations (ops) / system.disk.io (sector bytes):
    cumulative by (host, device, direction)."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "device": [], "direction": [],
                "metric": [], "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            host, s = _coords(p)
            ts = scrape_ts_us(s)
            for m in _DISK_RX.finditer(raw.decode("ascii")):
                dev, rd, rsect, wr, wsect = (m.group(1), int(m.group(2)),
                                             int(m.group(3)), int(m.group(4)),
                                             int(m.group(5)))
                for metric, direction, v in (
                        ("system.disk.operations", "read", rd),
                        ("system.disk.operations", "write", wr),
                        ("system.disk.io", "read", rsect * 512),
                        ("system.disk.io", "write", wsect * 512)):
                    rows["host"].append(host)
                    rows["ts"].append(ts)
                    rows["device"].append(dev)
                    rows["direction"].append(direction)
                    rows["metric"].append(metric)
                    rows["value"].append(v)
        return _dp_table(rows, pa.int64())

    return _snapshot_ds(path, "diskstats").map_batches(
        parse, batch_format="pyarrow")


def scrape_load(path: str) -> "ray.data.Dataset":
    """system.cpu.load_average.{1m,5m,15m}: gauge doubles. The decimal
    text parses digit-exact (int.int → centi-int → /100.0) so the value
    equals the writer's integer/100.0 double bit-for-bit."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "metric": [], "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            host, s = _coords(p)
            m = _LOAD_RX.match(raw.decode("ascii"))
            if m is None:
                raise ValueError(f"unparseable loadavg in {p}")
            for i, metric in enumerate(("system.cpu.load_average.1m",
                                        "system.cpu.load_average.5m",
                                        "system.cpu.load_average.15m")):
                centi = int(m.group(2 * i + 1)) * 100 + int(m.group(2 * i + 2))
                rows["host"].append(host)
                rows["ts"].append(scrape_ts_us(s))
                rows["metric"].append(metric)
                rows["value"].append(centi / 100.0)
        return _dp_table(rows, pa.float64())

    return _snapshot_ds(path, "loadavg").map_batches(
        parse, batch_format="pyarrow")


def scrape_processes(path: str) -> "ray.data.Dataset":
    """system.processes.created (cumulative forks) + system.processes.count
    gauges by status (running/blocked), from /proc/stat's process lines."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "metric": [], "status": [],
                "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            host, s = _coords(p)
            kv = {m.group(1): int(m.group(2))
                  for m in _STAT_KV_RX.finditer(raw.decode("ascii"))}
            for metric, status, v in (
                    ("system.processes.created", "", kv["processes"]),
                    ("system.processes.count", "running",
                     kv["procs_running"]),
                    ("system.processes.count", "blocked",
                     kv["procs_blocked"])):
                rows["host"].append(host)
                rows["ts"].append(scrape_ts_us(s))
                rows["metric"].append(metric)
                rows["status"].append(status)
                rows["value"].append(v)
        return _dp_table(rows, pa.int64())

    return _snapshot_ds(path, "stat").map_batches(
        parse, batch_format="pyarrow")


def scrape_filesystem(path: str) -> "ray.data.Dataset":
    """system.filesystem.usage (gauge bytes) + system.filesystem.
    inodes.usage (gauge counts) by (host, device, mountpoint, fstype,
    state∈{used,free}) — free derived from the mount's capture totals."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "device": [], "mountpoint": [],
                "fstype": [], "state": [], "metric": [], "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            host, s = _coords(p)
            ts = scrape_ts_us(s)
            for m in _DF_RX.finditer(raw.decode("ascii")):
                dev, mount, fstype = m.group(1), m.group(2), m.group(3)
                total, used = int(m.group(4)), int(m.group(5))
                itotal, iused = int(m.group(6)), int(m.group(7))
                for metric, st, v in (
                        ("system.filesystem.usage", "used", used * 1024),
                        ("system.filesystem.usage", "free",
                         (total - used) * 1024),
                        ("system.filesystem.inodes.usage", "used", iused),
                        ("system.filesystem.inodes.usage", "free",
                         itotal - iused)):
                    rows["host"].append(host)
                    rows["ts"].append(ts)
                    rows["device"].append(dev)
                    rows["mountpoint"].append(mount)
                    rows["fstype"].append(fstype)
                    rows["state"].append(st)
                    rows["metric"].append(metric)
                    rows["value"].append(v)
        return _dp_table(rows, pa.int64())

    return _snapshot_ds(path, "df").map_batches(
        parse, batch_format="pyarrow")


def scrape_paging(path: str) -> "ray.data.Dataset":
    """system.paging.usage (gauge swap bytes by state used/free/cached,
    used = SwapTotal − SwapFree − SwapCached) from meminfo;
    system.paging.operations (cumulative, direction×type: major =
    swap-io pswpin/pswpout, minor = page-io pgpgin/pgpgout) and
    system.paging.faults (cumulative by type, minor = pgfault −
    pgmajfault) from vmstat."""

    def parse_mem(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "metric": [], "state": [],
                "direction": [], "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            host, s = _coords(p)
            kv = {m.group(1): int(m.group(2))
                  for m in _SWAP_RX.finditer(raw.decode("ascii"))}
            used = kv["SwapTotal"] - kv["SwapFree"] - kv["SwapCached"]
            for st, v in (("used", used), ("free", kv["SwapFree"]),
                          ("cached", kv["SwapCached"])):
                rows["host"].append(host)
                rows["ts"].append(scrape_ts_us(s))
                rows["metric"].append("system.paging.usage")
                rows["state"].append(st)
                rows["direction"].append("")
                rows["value"].append(v * 1024)
        return _dp_table(rows, pa.int64())

    def parse_vm(batch: pa.Table) -> pa.Table:
        rows = {"host": [], "ts": [], "metric": [], "state": [],
                "direction": [], "value": []}
        for p, raw in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
            host, s = _coords(p)
            ts = scrape_ts_us(s)
            kv = {m.group(1): int(m.group(2))
                  for m in _VMSTAT_RX.finditer(raw.decode("ascii"))}
            # state column doubles as the operation/fault `type` attr
            for metric, typ, direction, v in (
                    ("system.paging.operations", "major", "page_in",
                     kv["pswpin"]),
                    ("system.paging.operations", "major", "page_out",
                     kv["pswpout"]),
                    ("system.paging.operations", "minor", "page_in",
                     kv["pgpgin"]),
                    ("system.paging.operations", "minor", "page_out",
                     kv["pgpgout"]),
                    ("system.paging.faults", "major", "",
                     kv["pgmajfault"]),
                    ("system.paging.faults", "minor", "",
                     kv["pgfault"] - kv["pgmajfault"])):
                rows["host"].append(host)
                rows["ts"].append(ts)
                rows["metric"].append(metric)
                rows["state"].append(typ)
                rows["direction"].append(direction)
                rows["value"].append(v)
        return _dp_table(rows, pa.int64())

    mem = _snapshot_ds(path, "meminfo").map_batches(
        parse_mem, batch_format="pyarrow")
    vm = _snapshot_ds(path, "vmstat").map_batches(
        parse_vm, batch_format="pyarrow")
    return mem.union(vm)


SCRAPERS = {
    "cpu": (scrape_cpu, "system.cpu.time"),
    "memory": (scrape_memory, "system.memory.usage"),
    "network": (scrape_network, None),  # metric column already present
    "disk": (scrape_disk, None),
    "load": (scrape_load, None),
    "processes": (scrape_processes, None),
    "filesystem": (scrape_filesystem, None),
    "paging": (scrape_paging, None),
}

_UNION_ATTRS = ("cpu", "state", "device", "direction", "status",
                "mountpoint", "fstype")


def read_hostmetrics(path: str, scrapers: "tuple[str, ...] | list[str]"
                     = ("cpu", "disk", "filesystem", "memory", "network",
                        "load", "paging", "processes")) -> "ray.data.Dataset":
    """Config-builder entry: the enabled scrapers' datapoints as ONE
    aligned long table (host, ts, metric, cpu, state, device, direction,
    status, value:double) — absent attributes are '', values cast to the
    OTel double domain. Mirrors the receiver's scrapers: map
    (full_config_linux.yaml:107-118)."""

    def align(metric_const: "str | None"):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {"host": t["host"], "ts": t["ts"]}
            if metric_const is not None:
                cols["metric"] = pa.array([metric_const] * n,
                                          type=pa.string())
            else:
                cols["metric"] = t["metric"]
            for a in _UNION_ATTRS:
                cols[a] = (t[a] if a in t.column_names
                           else pa.array([""] * n, type=pa.string()))
            cols["value"] = t["value"].cast(pa.float64())
            return pa.table(cols)
        return fn

    parts = []
    for name in scrapers:
        if name not in SCRAPERS:
            raise ValueError(f"unknown hostmetrics scraper {name!r}; "
                             f"available: {sorted(SCRAPERS)}")
        read, metric_const = SCRAPERS[name]
        parts.append(read(path).map_batches(align(metric_const),
                                            batch_format="pyarrow"))
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


def cpu_utilization(path: str) -> "ray.data.Dataset":
    """system.cpu.utilization: per-interval delta(state) / delta(all
    states) per (host, cpu) — the cumulativetodelta shape applied to the
    scraped counters; the first scrape has no predecessor and is dropped,
    a zero total interval yields 0.0 (both exactly as the SQL twin).

    The counter table is snapshot-bounded (hosts × ticks × cpus × states
    rows, independent of corpus scale), so the series fold is a
    ``small_fold`` — one vectorized pandas pass over the whole tiny
    stream, no bucketed exchange."""
    import pandas as pd

    from ..partitioning import small_fold

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["host", "cpu", "state", "ts"], kind="mergesort")
        jif = (g["value"].to_numpy() * USER_HZ).round().astype("int64")
        g = g.assign(_j=jif)
        lag = g.groupby(["host", "cpu", "state"], sort=False)["_j"].shift(1)
        keep = lag.notna()
        d = g.loc[keep, ["host", "ts", "cpu", "state"]].copy()
        d["_d"] = (g.loc[keep, "_j"] - lag[keep]).astype("int64").to_numpy()
        total = d.groupby(["host", "cpu", "ts"],
                          sort=False)["_d"].transform("sum")
        t = total.to_numpy()
        val = np.zeros(len(d), dtype="float64")
        np.divide(d["_d"].to_numpy(), t, out=val, where=t > 0)
        d["value"] = val
        return d[["host", "ts", "cpu", "state", "value"]]

    return small_fold(scrape_cpu(path), fold, batch_format="pandas")
