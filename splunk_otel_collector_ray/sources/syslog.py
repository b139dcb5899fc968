"""syslog receiver analogue: RFC 5424 frame parse → log records.

The reference registers the upstream syslog receiver
(/root/reference/internal/components/components.go:275), whose rfc5424
mode parses ``<PRI>VERSION TIMESTAMP HOSTNAME APP-NAME PROCID MSGID
STRUCTURED-DATA [MSG]`` frames: PRI decomposes as facility·8 + severity
(severity → OTel level via the same syslog table the journald receiver
uses), nil fields are ``-``, and the first structured-data element's
``[id k="v" ...]`` params become attributes. (The RFC 3164-style BSD
format is covered as transcript parse family 2 in stages/parse.py.)

Vectorized: ONE RE2 ``extract_regex`` pass frames the record; PRI math,
the severity gather and the timestamp parse are array ops. Only the
structured-data params need a second small regex pass over the (usually
short) SD field.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .journald import PRIORITY_NUMBER, PRIORITY_TEXT

_RX_5424 = (
    r"^<(?P<pri>[0-9]{1,3})>(?P<ver>[0-9]+) "
    r"(?P<ts>\S+) (?P<host>\S+) (?P<app>\S+) (?P<proc>\S+) (?P<msgid>\S+) "
    r"(?P<sd>-|\[[^\]]*\])(?: (?P<msg>.*))?$")


def parse_syslog_5424(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """RFC 5424 lines → typed record columns; malformed lines dropped
    (the receiver NACKs undecodable frames)."""
    lines = batch[text_col]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    ex = pc.extract_regex(lines, _RX_5424)
    ok = pc.is_valid(ex).to_numpy(zero_copy_only=False)
    ex = ex.filter(pa.array(ok))

    def f(name: str) -> pa.Array:
        return pc.fill_null(pc.struct_field(ex, name), "")

    def nil_to_empty(arr: pa.Array) -> pa.Array:
        return pc.if_else(pc.equal(arr, "-"), pa.scalar(""), arr)

    pri = f("pri").cast(pa.int64()).to_numpy(zero_copy_only=False)
    sev = (pri % 8).astype(np.int64)
    facility = pri // 8

    # RFC 5424 timestamp: 2026-01-01T00:00:10.123456Z or ±hh:mm offset;
    # second-resolution strptime + fractional µs + explicit offset math
    tex = pc.extract_regex(
        f("ts"),
        r"^(?P<base>[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9:]{8})"
        r"(?:\.(?P<frac>[0-9]+))?"
        r"(?P<off>Z|[+-][0-9]{2}:[0-9]{2})$")
    ts0 = pc.strptime(pc.struct_field(tex, "base"),
                      format="%Y-%m-%dT%H:%M:%S", unit="us",
                      error_is_null=True)
    frac = pc.fill_null(pc.struct_field(tex, "frac"), "").to_pandas()
    frac6 = frac.str.slice(0, 6)
    import pandas as pd

    us = (pd.to_numeric(frac6.where(frac6 != "", "0"))
          .to_numpy(np.int64)
          * 10 ** (6 - np.maximum(frac6.str.len().to_numpy(), 1)))
    off = pc.fill_null(pc.struct_field(tex, "off"), "Z").to_pandas()
    sign = np.where(off.str.startswith("-"), 1, -1)  # -05:00 is behind UTC
    oh = pd.to_numeric(off.str.slice(1, 3), errors="coerce").fillna(0)
    om = pd.to_numeric(off.str.slice(4, 6), errors="coerce").fillna(0)
    off_us = (sign * (oh * 3600 + om * 60) * 1_000_000).astype(np.int64)
    ts = pc.add(ts0, pa.array(us + off_us, type=pa.duration("us")))

    # first SD element id + params "k=v,…" (canonical join, no quotes)
    sd = nil_to_empty(f("sd"))
    sdx = pc.extract_regex(sd, r"^\[(?P<sdid>[^ \]]+)(?P<params>[^\]]*)\]$")
    sd_id = pc.fill_null(pc.struct_field(sdx, "sdid"), "")
    # ` k="v" k2="v2"` → `k=v,k2=v2`: separator `" ` → `,`, then strip
    # quotes — vectorized (RFC escapes embedded quotes as \" so a bare
    # `" ` cannot occur inside a param value)
    params = pc.fill_null(pc.struct_field(sdx, "params"), "").to_pandas()
    sd_params = (params.str.strip()
                 .str.replace('" ', ",", regex=False)
                 .str.replace('"', "", regex=False))

    return pa.table({
        "facility": pa.array(facility),
        "severity_text": pa.array(PRIORITY_TEXT[sev], type=pa.string()),
        "severity_number": pa.array(PRIORITY_NUMBER[sev], type=pa.int8()),
        "version": f("ver").cast(pa.int64()),
        "ts": ts,
        "hostname": nil_to_empty(f("host")),
        "appname": nil_to_empty(f("app")),
        "proc_id": nil_to_empty(f("proc")),
        "msg_id": nil_to_empty(f("msgid")),
        "sd_id": sd_id,
        "sd_params": pa.array(sd_params.to_numpy(dtype=object),
                              type=pa.string()),
        "body": nil_to_empty(f("msg")),
    })


def read_syslog_5424(ds: "ray.data.Dataset",
                     text_col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(parse_syslog_5424,
                          fn_kwargs={"text_col": text_col},
                          batch_format="pyarrow")
