"""Property-based (hypothesis) round-trips for the capture codecs the
scraper-family sources read — render an arbitrary snapshot, re-extract
every counter with the exact regexes the scrapers use. The render/parse
edge is where these sources' defects would live (field order, spacing,
digit-exact decimals, absent-field handling); the fixture corpora can't
sweep arbitrary magnitudes — hypothesis can."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from splunk_otel_collector_ray.sources import dockerstats as dk
from splunk_otel_collector_ray.sources import procfs as pf

cnt = st.integers(min_value=0, max_value=2 ** 62)
small = st.integers(min_value=0, max_value=10 ** 9)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(cnt, min_size=8, max_size=8),
                min_size=1, max_size=4), small, small, small)
def test_stat_roundtrip(jiffies, procs, running, blocked):
    text = pf.render_stat(jiffies, procs, running, blocked)
    rows = {int(m.group(1)): [int(m.group(2 + i)) for i in range(8)]
            for m in pf._STAT_CPU_RX.finditer(text)}
    assert rows == {c: row for c, row in enumerate(jiffies)}
    kv = {m.group(1): int(m.group(2))
          for m in pf._STAT_KV_RX.finditer(text)}
    assert kv == {"processes": procs, "procs_running": running,
                  "procs_blocked": blocked}


@settings(max_examples=60, deadline=None)
@given(small, small, small, small, small)
def test_meminfo_swap_roundtrip(free, buf, cached, sw_free, sw_cached):
    text = pf.render_meminfo(free, buf, cached, sw_free, sw_cached)
    kv = {m.group(1): int(m.group(2))
          for m in pf._MEMINFO_RX.finditer(text)}
    assert (kv["MemFree"], kv["Buffers"], kv["Cached"]) == (
        free, buf, cached)
    sw = {m.group(1): int(m.group(2)) for m in pf._SWAP_RX.finditer(text)}
    assert sw == {"SwapCached": sw_cached, "SwapTotal": pf.HM_SWAP_KB,
                  "SwapFree": sw_free}


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(st.sampled_from(["eth0", "lo", "eth1", "bond0"]),
                       st.tuples(cnt, cnt, cnt, cnt),
                       min_size=1, max_size=4))
def test_net_dev_roundtrip(ifaces):
    text = pf.render_net_dev(ifaces)
    got = {m.group(1): (int(m.group(2)), int(m.group(3)),
                        int(m.group(4)), int(m.group(5)))
           for m in pf._NET_RX.finditer(text)}
    assert got == ifaces


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10 ** 6),
       st.integers(min_value=0, max_value=10 ** 6),
       st.integers(min_value=0, max_value=10 ** 6), small, small)
def test_loadavg_digit_exact(l1, l5, l15, running, total):
    text = pf.render_loadavg(l1, l5, l15, running, total, 1)
    m = pf._LOAD_RX.match(text)
    assert m is not None
    for i, centi in enumerate((l1, l5, l15)):
        got = int(m.group(2 * i + 1)) * 100 + int(m.group(2 * i + 2))
        assert got == centi
        # the scraper's centi-int / 100.0 equals the writer's double
        assert got / 100.0 == centi / 100.0
    assert (int(m.group(7)), int(m.group(8))) == (running, total)


@settings(max_examples=60, deadline=None)
@given(cnt, cnt, cnt, cnt, cnt, cnt)
def test_vmstat_roundtrip(pgin, pgout, swin, swout, flt, mflt):
    text = pf.render_vmstat(pgin, pgout, swin, swout, flt, mflt)
    kv = {m.group(1): int(m.group(2))
          for m in pf._VMSTAT_RX.finditer(text)}
    assert kv == {"pgpgin": pgin, "pgpgout": pgout, "pswpin": swin,
                  "pswpout": swout, "pgfault": flt, "pgmajfault": mflt}


@settings(max_examples=60, deadline=None)
@given(st.tuples(small, small), st.tuples(small, small))
def test_df_roundtrip(fs1, fs2):
    text = pf.render_df({"sda1": fs1, "sdb1": fs2})
    got = {}
    for m in pf._DF_RX.finditer(text):
        dev, mount, fstype = m.group(1), m.group(2), m.group(3)
        total, used = int(m.group(4)), int(m.group(5))
        itotal, iused = int(m.group(6)), int(m.group(7))
        spec = {d: (mnt, ft, t, it) for d, mnt, ft, t, it in pf.FS_MOUNTS}
        assert (mount, fstype, total, itotal) == spec[dev]
        got[dev] = (used, iused)
    assert got == {"sda1": fs1, "sdb1": fs2}


@settings(max_examples=60, deadline=None)
@given(cnt, cnt, cnt, cnt, cnt, cnt, cnt, cnt)
def test_docker_stats_line_roundtrip(total, system, usage, cache,
                                     rx, tx, br, bw):
    line = dk.render_stats_line("ctr-0-1", "svc-1", "img-1", total,
                                system, usage, cache, rx, tx, br, bw)
    st_ = json.loads(line)
    assert st_["name"] == "/svc-1"  # API names carry the leading slash
    assert st_["cpu_stats"]["cpu_usage"]["total_usage"] == total
    assert st_["cpu_stats"]["system_cpu_usage"] == system
    # the monitor's derived total: usage − total_cache
    mem = st_["memory_stats"]
    assert mem["usage"] - mem["stats"]["total_cache"] == usage - cache
    net = st_["networks"]["eth0"]
    assert (net["rx_bytes"], net["tx_bytes"]) == (rx, tx)
    blk = {e["op"]: e["value"]
           for e in st_["blkio_stats"]["io_service_bytes_recursive"]}
    assert blk == {"Read": br, "Write": bw}
