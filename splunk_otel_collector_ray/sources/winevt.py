"""windows_event_log receiver analogue: raw Windows Event XML → log records.

The reference's canonical Windows logs config subscribes channels with
``raw: true`` (the XML event is the record body) and drops events by
provider and by event id
(/root/reference/cmd/otelcol/config/collector/splunk_logs_config_windows.yaml:2-27
— ``exclude_providers: [XENAGENT, "Tenable Nessus Agent"]``; the Security
channel's EventCode 4662/566 ``exclude_events`` note). The batch analogue
parses the well-known ``<System>`` fields out of the raw XML with one RE2
``extract_regex`` pass per field (the System element's field set is fixed
by the Windows event schema), maps the Windows Level (1 Critical … 5
Verbose) onto OTel severity, and applies the provider/event-id exclusion
table — no per-row XML DOM, no Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Windows Level → OTel severity (1=Critical, 2=Error, 3=Warning,
# 4=Informational, 5=Verbose; 0=LogAlways → INFO)
_LEVEL_TEXT = np.array(["INFO", "FATAL", "ERROR", "WARN", "INFO", "DEBUG"],
                       dtype=object)
_LEVEL_NUM = np.array([9, 21, 17, 13, 9, 5], dtype=np.int8)

_FIELDS = {
    "provider": r"Provider Name='(?P<v>[^']*)'",
    "event_id": r"<EventID>(?P<v>[0-9]+)</EventID>",
    "level": r"<Level>(?P<v>[0-9]+)</Level>",
    "system_time": r"SystemTime='(?P<v>[^']*)'",
    "channel": r"<Channel>(?P<v>[^<]*)</Channel>",
    "computer": r"<Computer>(?P<v>[^<]*)</Computer>",
}


def parse_windows_events(
    batch: pa.Table, text_col: str = "text",
    exclude_providers: tuple = (), exclude_event_ids: tuple = (),
) -> pa.Table:
    """Raw event XML rows → typed record columns, exclusions applied."""
    xml = batch[text_col]
    if isinstance(xml, pa.ChunkedArray):
        xml = xml.combine_chunks()
    got = {}
    for name, rx in _FIELDS.items():
        ex = pc.extract_regex(xml, rx)
        got[name] = pc.fill_null(pc.struct_field(ex, "v"), "")

    event_id = pc.cast(
        pc.if_else(pc.equal(got["event_id"], ""), "0", got["event_id"]),
        pa.int64()).to_numpy(zero_copy_only=False)
    level = pc.cast(
        pc.if_else(pc.equal(got["level"], ""), "0", got["level"]),
        pa.int64()).to_numpy(zero_copy_only=False)
    lvl = np.clip(level, 0, 5)
    # Arrow strptime has no %f: parse the second-resolution prefix, then
    # add the fractional digits as a µs duration (vectorized)
    st = pc.extract_regex(
        got["system_time"],
        r"^(?P<base>[0-9][0-9\-]*T[0-9:]+)(?:\.(?P<frac>[0-9]+))?Z?$")
    ts0 = pc.strptime(pc.struct_field(st, "base"),
                      format="%Y-%m-%dT%H:%M:%S", unit="us",
                      error_is_null=True)
    frac = pc.fill_null(pc.struct_field(st, "frac"), "").to_pandas()
    frac6 = frac.str.slice(0, 6)
    digits = frac6.str.len().to_numpy()
    us = (pd.to_numeric(frac6.where(frac6 != "", "0")).to_numpy(np.int64)
          * 10 ** (6 - np.maximum(digits, 1)))
    ts = pc.add(ts0, pa.array(us, type=pa.duration("us")))

    out = pa.table({
        "channel": got["channel"],
        "provider": got["provider"],
        "event_id": pa.array(event_id),
        "level": pa.array(level),
        "severity_text": pa.array(_LEVEL_TEXT[lvl], type=pa.string()),
        "severity_number": pa.array(_LEVEL_NUM[lvl], type=pa.int8()),
        "ts": ts,
        "computer": got["computer"],
        "body": xml,
    })
    keep = np.ones(out.num_rows, dtype=bool)
    if exclude_providers:
        keep &= ~np.isin(got["provider"].to_numpy(zero_copy_only=False),
                         np.asarray(exclude_providers, dtype=object))
    if exclude_event_ids:
        keep &= ~np.isin(event_id, np.asarray(exclude_event_ids))
    return out.filter(pa.array(keep))


def read_windows_events(ds: "ray.data.Dataset", text_col: str = "text",
                        exclude_providers: tuple = (),
                        exclude_event_ids: tuple = ()) -> "ray.data.Dataset":
    return ds.map_batches(
        parse_windows_events,
        fn_kwargs={"text_col": text_col,
                   "exclude_providers": tuple(exclude_providers),
                   "exclude_event_ids": tuple(exclude_event_ids)},
        batch_format="pyarrow")
