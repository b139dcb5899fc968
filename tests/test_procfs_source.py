"""hostmetrics scraper analogue: /proc snapshot capture decode, scraper
math (derived used-memory, cumulative counters, digit-exact loadavg),
the cumulativetodelta-shaped utilization, and the config-builder path."""

import numpy as np
import pandas as pd
import pytest

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources import procfs as pf


@pytest.fixture(scope="module")
def proc_dump(sf_dir):
    return corpus.ensure_proc_dump(sf_dir)


def _hand_dump(tmp_path):
    """A two-host, two-tick capture with hand-chosen counters."""
    for h, s, ju in ((0, 0, [100, 7]), (0, 1, [250, 19]), (1, 0, [40, 0]),
                     (1, 1, [40, 360])):
        d = tmp_path / f"host-{h}" / f"scrape-{s:04d}"
        d.mkdir(parents=True)
        (d / "stat").write_text(pf.render_stat(
            [[ju[c], 0, 2 * ju[c], 30 + ju[c], 0, 0, 0, 0]
             for c in range(2)],
            processes=10 * (s + 1), procs_running=h + s,
            procs_blocked=s))
        (d / "meminfo").write_text(pf.render_meminfo(
            free_kb=1000 - 10 * s, buffers_kb=8, cached_kb=16))
        (d / "net_dev").write_text(pf.render_net_dev(
            {"eth0": (100 * (s + 1), s + 1, 50 * (s + 1), s + 1),
             "lo": (7, 1, 7, 1)}))
        (d / "diskstats").write_text(pf.render_diskstats(
            {"sda": (5 * (s + 1), 80 * (s + 1), 3, 40),
             "sdb": (0, 0, 1, 8)}))
        (d / "loadavg").write_text(pf.render_loadavg(
            152, 101, 50, h + s, 10 * (s + 1), 1234))
        (d / "vmstat").write_text(pf.render_vmstat(
            pgpgin=100 * (s + 1), pgpgout=60 * (s + 1),
            pswpin=5 * (s + 1), pswpout=3 * (s + 1),
            pgfault=1000 * (s + 1), pgmajfault=7 * (s + 1)))
        (d / "df").write_text(pf.render_df(
            {"sda1": (5000 + 100 * s, 200 + s),
             "sdb1": (9000 + 50 * s, 400 + s)}))
    return str(tmp_path)


def test_render_parse_roundtrip_cpu(ray_session, tmp_path):
    path = _hand_dump(tmp_path)
    df = pf.scrape_cpu(path).to_pandas()
    # hosts × ticks × cpus × 8 states
    assert len(df) == 2 * 2 * 2 * 8
    row = df[(df.host == "host-0") & (df.cpu == "cpu0")
             & (df.state == "user")].sort_values("ts")
    assert list(row["value"]) == [1.0, 2.5]  # 100, 250 jiffies / USER_HZ
    sysr = df[(df.host == "host-1") & (df.cpu == "cpu1")
              & (df.state == "system")].sort_values("ts")
    assert list(sysr["value"]) == [0.0, 7.2]
    assert (df[df.state.isin(["nice", "iowait", "irq", "softirq",
                              "steal"])]["value"] == 0.0).all()
    # scrape tick → 10 s spaced timestamps from the corpus epoch
    ts = sorted(df["ts"].unique())
    assert (ts[1] - ts[0]) == pd.Timedelta(seconds=10)


def test_memory_derived_used(ray_session, tmp_path):
    """The Linux scraper's used = MemTotal − MemFree − Buffers − Cached,
    all states in bytes."""
    df = pf.scrape_memory(_hand_dump(tmp_path)).to_pandas()
    one = df[(df.host == "host-0")
             & (df.ts == df.ts.min())].set_index("state")["value"]
    assert one["free"] == 1000 * 1024
    assert one["buffered"] == 8 * 1024
    assert one["cached"] == 16 * 1024
    assert one["used"] == (pf.HM_TOTAL_KB - 1000 - 8 - 16) * 1024


def test_network_disk_load_processes_parse(ray_session, tmp_path):
    path = _hand_dump(tmp_path)
    net = pf.scrape_network(path).to_pandas()
    eth = net[(net.host == "host-0") & (net.device == "eth0")
              & (net.metric == "system.network.io")]
    assert set(zip(eth["direction"], eth["value"])) == {
        ("receive", 100), ("receive", 200),
        ("transmit", 50), ("transmit", 100)}
    dsk = pf.scrape_disk(path).to_pandas()
    sda = dsk[(dsk.host == "host-1") & (dsk.device == "sda")]
    io_read = sda[(sda.metric == "system.disk.io")
                  & (sda.direction == "read")].sort_values("ts")
    assert list(io_read["value"]) == [80 * 512, 160 * 512]
    ld = pf.scrape_load(path).to_pandas()
    # digit-exact decimal parse: 1.52 == 152/100.0 bit-for-bit
    assert (ld[ld.metric == "system.cpu.load_average.1m"]["value"]
            == 152 / 100.0).all()
    assert (ld[ld.metric == "system.cpu.load_average.15m"]["value"]
            == 50 / 100.0).all()
    pr = pf.scrape_processes(path).to_pandas()
    created = pr[(pr.host == "host-0")
                 & (pr.metric == "system.processes.created")]
    assert sorted(created["value"]) == [10, 20]
    running = pr[(pr.metric == "system.processes.count")
                 & (pr.status == "running") & (pr.host == "host-1")]
    assert sorted(running["value"]) == [1, 2]


def test_filesystem_paging_parse(ray_session, tmp_path):
    path = _hand_dump(tmp_path)
    fs = pf.scrape_filesystem(path).to_pandas()
    # 2 hosts × 2 ticks × 2 mounts × 2 metrics × 2 states
    assert len(fs) == 2 * 2 * 2 * 2 * 2
    root = fs[(fs.host == "host-0") & (fs.device == "sda1")
              & (fs.metric == "system.filesystem.usage")]
    assert set(root["mountpoint"]) == {"/"} and set(root["fstype"]) == {
        "ext4"}
    used = root[root.state == "used"].sort_values("ts")
    assert list(used["value"]) == [5000 * 1024, 5100 * 1024]
    free = root[root.state == "free"].sort_values("ts")
    assert list(free["value"]) == [(268_435_456 - 5000) * 1024,
                                   (268_435_456 - 5100) * 1024]
    ino = fs[(fs.device == "sdb1")
             & (fs.metric == "system.filesystem.inodes.usage")
             & (fs.state == "used")]
    assert sorted(ino["value"].unique()) == [400, 401]

    pg = pf.scrape_paging(path).to_pandas()
    one = pg[(pg.host == "host-1") & (pg.ts == pg.ts.max())]
    ops = one[one.metric == "system.paging.operations"].set_index(
        ["state", "direction"])["value"]
    assert ops[("major", "page_in")] == 10  # pswpin tick 1
    assert ops[("minor", "page_out")] == 120  # pgpgout tick 1
    flt = one[one.metric == "system.paging.faults"].set_index(
        "state")["value"]
    assert flt["major"] == 14
    assert flt["minor"] == 2000 - 14  # pgfault − pgmajfault
    usage = one[one.metric == "system.paging.usage"].set_index(
        "state")["value"]
    # hand dump renders default swap lines: free=SwapTotal, cached=0
    assert usage["free"] == pf.HM_SWAP_KB * 1024
    assert usage["used"] == 0 and usage["cached"] == 0


def test_cpu_utilization_matches_pandas_reference(ray_session, proc_dump):
    """delta(state)/delta(all states) per (host, cpu, interval), first
    tick dropped — engine vs a straight pandas recompute off the scraped
    counters."""
    cpu = pf.scrape_cpu(proc_dump).to_pandas()
    got = pf.cpu_utilization(proc_dump).to_pandas()
    ref = cpu.sort_values(["host", "cpu", "state", "ts"]).copy()
    ref["j"] = (ref["value"] * pf.USER_HZ).round().astype("int64")
    lag = ref.groupby(["host", "cpu", "state"])["j"].shift(1)
    ref["d"] = ref["j"] - lag
    ref = ref[lag.notna()]
    tot = ref.groupby(["host", "cpu", "ts"])["d"].transform("sum")
    ref["value"] = np.where(tot > 0, ref["d"] / tot, 0.0)
    cols = ["host", "ts", "cpu", "state", "value"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        ref[cols].sort_values(cols).reset_index(drop=True))
    # utilizations over one (host, cpu, interval) partition to 1 —
    # except zero-activity intervals (empty derivation cells), which the
    # scraper defines as all-zero rather than 0/0
    sums = got.groupby(["host", "cpu", "ts"])["value"].sum().to_numpy()
    assert np.all(np.isclose(sums, 1.0) | (sums == 0.0))
    assert np.isclose(sums, 1.0).mean() > 0.9


def test_proc_dump_deterministic_and_scaled(ray_session, sf_dir, proc_dump):
    """Snapshot count is hosts×ticks regardless of corpus size, and a
    forced regeneration is byte-identical."""
    import os

    files = pf._snapshot_files(proc_dump, "stat")
    assert len(files) == pf.HM_HOSTS * pf.HM_SCRAPES
    before = {f: open(f, "rb").read()
              for f in pf._snapshot_files(proc_dump, "meminfo")}
    corpus.ensure_proc_dump(sf_dir, force=True)
    for f, blob in before.items():
        assert open(f, "rb").read() == blob
    # counters are cumulative: last tick's stat dominates the first's
    first = open(files[0]).read().splitlines()[1]
    last = open(files[pf.HM_SCRAPES - 1]).read().splitlines()[1]
    assert int(last.split()[1]) >= int(first.split()[1])
    assert os.path.basename(files[0]) == "stat"


def test_hostmetrics_config_pipeline(ray_session, tmp_path):
    """Collector-style YAML with a hostmetrics receiver builds the
    aligned union of the enabled scrapers' datapoints."""
    import yaml

    from splunk_otel_collector_ray.config import build_pipeline
    from splunk_otel_collector_ray.configio import collector_to_spec

    path = _hand_dump(tmp_path / "dump")
    yaml_doc = f"""
receivers:
  hostmetrics:
    path: {path}
    scrapers: [cpu, memory]
exporters:
  debug:
service:
  pipelines:
    logs:
      receivers: [hostmetrics]
      exporters: [debug]
"""
    ds = build_pipeline(collector_to_spec(yaml.safe_load(yaml_doc)))
    df = ds.to_pandas()
    assert set(df["metric"]) == {"system.cpu.time", "system.memory.usage"}
    assert list(df.columns) == ["host", "ts", "metric", "cpu", "state",
                                "device", "direction", "status",
                                "mountpoint", "fstype", "value"]
    assert str(df["value"].dtype) == "float64"
    # absent attrs align as '' so the union is schema-stable
    assert (df.loc[df.metric == "system.memory.usage", "cpu"] == "").all()
    n_cpu = 2 * 2 * 2 * 8
    n_mem = 2 * 2 * 4
    assert len(df) == n_cpu + n_mem
    with pytest.raises(ValueError, match="unknown hostmetrics scraper"):
        pf.read_hostmetrics(path, scrapers=["cpu", "bogus"])
