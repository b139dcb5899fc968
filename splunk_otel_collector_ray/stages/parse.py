"""Vectorized parse stage — the stanza operator chain of `filelog`, Ray-Data-first.

Reproduces (semantically, not mechanically) the reference's per-source operator
chains (citations into /root/reference):

- regex_parser with named capture groups → attributes
  (apache access: cmd/otelcol/config/collector/logs_config_linux.yaml:50-54)
- embedded `timestamp:` sub-parser (strptime layouts incl. %z, %L ms, epoch,
  %c locale; logs_config_linux.yaml:52-54,503-506) — parse_from field is
  consumed, record ts replaced, input ts kept as observed_ts fallback
- embedded `severity:` sub-parser with custom mapping tables
  (logs_config_linux.yaml:71-78 apache, :491-497 redis)
- json_parser (docker: logs_config_linux.yaml:155-171)
- move log→body + retain projection (logs_config_linux.yaml:78-84)
- router first-match classification (redis two-way router
  logs_config_linux.yaml:479-485; format families here play the role of the
  per-file sources of logs_config_linux.yaml:723-753)

Hot path is Arrow-native: classification and field extraction run through
pyarrow.compute's RE2 kernels (`match_substring_regex`, `extract_regex`) on
the zero-copy `text` column — no Python-level regex loop; only timestamp
strptime and the tiny severity dictionary map go through pandas. The
attributes open-map is materialized as a real Arrow `map<string,string>`
column built from flat offset/key/value arrays.

Deployment shapes: plain function stage via ``ParseStage.as_fn()`` (fuses with
read and downstream task stages; state cached per worker process) or an actor
pool via ``map_batches(ParseStage, concurrency=N)`` (mirrors once-per-instance
Configure, receiver.go:91-127) when fleet-wide fusion matters less than
isolation.

Output schema (FIXTURES.md §2):
  conv_id, turn_idx, role, tool            passthrough (+ any extra columns)
  ts          timestamp[us]   parsed from text when matched, else input ts
  observed_ts timestamp[us]   the input ts (ingest-time surrogate)
  log_format  string          detected family (= com.splunk.sourcetype value)
  body        string          message remnant after `move`, else raw line
  severity_text string / severity_number int8
  attributes  map<string,string>
  span_id     string          deterministic surrogate for tool-call turns
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.severity import (
    APACHE_ERROR_LEVELS,
    DEFAULT_LEVELS,
    ETCD_LEVELS,
    JSON_LEVEL_MAP,
    MONGODB_LEVELS,
    REDIS_LEVELS,
    SEVERITY_NUMBER,
)

# family -> attribute keys kept after the chain's `retain` projection
FAMILY_ATTR_KEYS: dict[str, list[str]] = {
    # no move/retain in the apache-access chain → all capture groups kept
    # (time consumed by the timestamp sub-parser)
    "apache_access": [
        "host", "remote_logname", "user", "method", "path",
        "protocol", "code", "size", "referer", "agent",
    ],
    "apache_error": ["module"],        # retain: logs_config_linux.yaml:81-84
    "syslog": ["program"],             # retain: logs_config_linux.yaml:529-534
    "docker": ["stream"],              # retain: logs_config_linux.yaml:164-167
    "redis_server": ["redis_role"],    # retain attributes.role :510-513
    "redis_handler": ["redis_role"],
    "mongodb": ["ctx"],                # retain: logs_config_linux.yaml:294-297
    "etcd": [],                        # retain only log.file.path :188-191
    "json_level": [],                  # transform deletes Level/message/time
    "pii": [],
    "plain": [],
    "cassandra": ["thread"],           # retain: logs_config_linux.yaml:111-114
    "java_stack": [],                  # stack fragments (multiline :95-97)
    "jetty9": [],                      # retain only log.file.path :226-228
    "memcached": [],                   # no operators :268-274
    "mysql_error": [],                 # retain only log.file.path :326-328
    "mysql_query": [],                 # retain only log.file.path :355-357
    "mysql_slow": [],                  # no operators :365-375
    "nginx_error": [],                 # retain only log.file.path :410-412
    "postgresql": [],                  # retain only log.file.path :430-432
    "rabbitmq": [],                    # retain only log.file.path :454-456
    "tomcat": ["thread", "function"],  # retain :557-560
    "zookeeper": ["thread", "class"],  # retain :621-624
    # NCSA common (jetty9-request :255-266 / tomcat access :592-604): no
    # retain op → all capture groups kept, time consumed by the ts sub-parser
    "ncsa_common": [
        "host", "remote_logname", "user", "method", "path",
        "protocol", "code", "size",
    ],
}

FAMILIES = list(FAMILY_ATTR_KEYS)

# extraction patterns (verbatim semantics from the shipped configs; all-named
# groups so pyarrow's RE2 extract_regex can run them)
RX = {
    # NCSA combined (logs_config_linux.yaml:51)
    "apache_access": (
        r'^(?P<host>.+) (?P<remote_logname>.+) (?P<user>.+) \[(?P<time>.+)\] '
        r'"(?P<method>.+) (?P<path>.+) (?P<protocol>.+)" (?P<code>\d+) '
        r'(?P<size>\d+) "(?P<referer>.+)" "(?P<agent>.+)"$'),
    "apache_error": (
        r"^\[(?P<time>.+?)\] \[(?P<module>\w+):(?P<level>\w+)\] "
        r"\[pid (?P<pid>\d+):tid (?P<tid>\d+)\] (?P<log>.*)$"),
    "syslog": (
        r"^(?P<time>.+?) (?P<hostname>\S+) (?P<program>[^ :\[]+)"
        r"\[?(?P<pid>\d+)?\]?: (?P<log>.*)$"),
    "redis_server": (
        r"^(?P<pid>\d+):(?P<role>\S*) (?P<time>.+?) (?P<level>.) (?P<log>.*)$"),
    "redis_handler": (
        r"^(?P<pid>\d+):(?P<role>\S*) \((?P<time>\d+)\) (?P<log>.*)$"),
    "docker": (
        r'^\{"log":"(?P<log>.*)","stream":"(?P<stream>[a-z]+)",'
        r'"time":"(?P<time>[^"]+)"\}$'),
    "json_level": (
        r'^\{"Level":"(?P<level>[A-Z]+)","message":"(?P<message>.*)",'
        r'"time":"(?P<time>[^"]+)"\}$'),
    # mongodb json_parser + attributes.t.$$date ts + s severity
    # (logs_config_linux.yaml:275-300)
    "mongodb": (
        r'^\{"t":\{"\$date":"(?P<time>[^"]+)"\},"s":"(?P<level>[A-Z0-9]+)",'
        r'"c":"(?P<component>[A-Z]+)","ctx":"(?P<ctx>[^"]+)",'
        r'"msg":"(?P<log>.*)"\}$'),
    # etcd capnslog (logs_config_linux.yaml:180-187)
    "etcd": r"^(?P<time>.+?) (?P<level>\w) \| (?P<log>.*)$",
    "pii": r"(?P<before>.*)\d\d\d\d-\d\d\d-\d\d\d\d(?P<after>.*)",
    # logs_config_linux.yaml:99 (cassandra regex_parser)
    "cassandra": (
        r"^(?P<level>\w+) +\[(?P<thread>[\w:]+)\] (?P<time>.+) "
        r"(?P<source_file>\S+):(?P<source_line>\d+) - (?P<log>[\s\S]*)$"),
    # logs_config_linux.yaml:216 (jetty9 regex_parser)
    "jetty9": (
        r"^(?P<time>[\d-]{10} [\d:.]{12}):(?P<level>\w+):"
        r"(?P<class>[\w.]+):(?P<thread>[\w:]+?): (?P<log>.*)$"),
    # logs_config_linux.yaml:317 (mysql-error regex_parser)
    "mysql_error": r"^(?P<time>.+?) \d+ \[(?P<level>\w+)\] (?P<log>[\s\S]*)$",
    # logs_config_linux.yaml:348 (mysql-query parse_query_log)
    "mysql_query": r"^(?P<time>\d{6} [\d:.]+)\s+(?P<log>[\s\S]*)$",
    # logs_config_linux.yaml:394 (nginx-error regex_parser)
    "nginx_error": (
        r"^(?P<time>.+?) \[(?P<level>\w+)\] (?P<pid>\d+)#(?P<tid>\d+): "
        r"(?P<log>.*)$"),
    # logs_config_linux.yaml:421 (postgresql regex_parser)
    "postgresql": r"^(?P<time>.+?) \[(?P<pid>\d+)\] (?P<log>.*)$",
    # logs_config_linux.yaml:443 (rabbitmq regex_parser)
    "rabbitmq": (
        r"^(?P<time>.+?) \[(?P<level>\w+)\] <(?P<erlang_pid>[\d.]+)> "
        r"(?P<log>[\s\S]*)$"),
    # logs_config_linux.yaml:548 (tomcat regex_parser)
    "tomcat": (
        r"^(?P<time>.+?) (?P<level>\w+) \[(?P<thread>[\w:-]+)\] "
        r"(?P<function>\S+) (?P<log>[\s\S]*)$"),
    # logs_config_linux.yaml:612 (zookeeper regex_parser)
    "zookeeper": (
        r"^(?P<time>.+?) - (?P<level>\w+) +\[(?P<thread>[\w:]+?):"
        r"(?P<class>\w+)@(?P<line>\d+|\?)\] - (?P<log>.*)$"),
    # logs_config_linux.yaml:259 (jetty9-request NCSA common)
    "ncsa_common": (
        r'^(?P<host>.+) (?P<remote_logname>.+) (?P<user>.+) '
        r'\[(?P<time>.+)\] "(?P<method>.+) (?P<path>.+) (?P<protocol>.+)" '
        r'(?P<code>\d+) (?P<size>\d+)$'),
}

# data-driven parse plans for the round-2 families: (ts pandas format,
# tz-aware, strip-from-time, severity table, lower severity token, body group)
SIMPLE_FAMILY: dict[str, tuple] = {
    "cassandra":  ("%Y-%m-%d %H:%M:%S", False, None, DEFAULT_LEVELS, True, "log"),
    "jetty9":     ("%Y-%m-%d %H:%M:%S.%f", False, None, DEFAULT_LEVELS, True, "log"),
    "mysql_error": ("%Y-%m-%d %H:%M:%S", False, None, DEFAULT_LEVELS, True, "log"),
    "mysql_query": ("%y%m%d %H:%M:%S", False, None, None, False, "log"),
    "nginx_error": ("%Y/%m/%d %H:%M:%S", False, None, APACHE_ERROR_LEVELS,
                    False, "log"),
    # layout '%Y-%m-%d %H:%M:%S.%L %Z' (:426) — the %Z zone name is stripped
    # before the strptime kernel (corpus always stamps UTC)
    "postgresql": ("%Y-%m-%d %H:%M:%S.%f", False, " UTC", None, False, "log"),
    "rabbitmq":   ("%Y-%m-%d %H:%M:%S.%f", False, None, DEFAULT_LEVELS, True, "log"),
    "tomcat":     ("%d-%b-%Y %H:%M:%S", False, None, DEFAULT_LEVELS, True, "log"),
    "zookeeper":  ("%Y-%m-%d %H:%M:%S", False, None, DEFAULT_LEVELS, True, "log"),
    "ncsa_common": ("%d/%b/%Y:%H:%M:%S %z", True, None, None, False, None),
}

# detection, in router order (first match wins) — stanza router exprs; the
# JSON/bracket families are cheap prefix tests, the rest anchored RE2.
# The per-family patterns are mutually exclusive by construction (each is
# anchored on a distinct timestamp/level shape), so ordering among them only
# matters for the shared-prefix groups noted inline.
DETECT: list[tuple[str, str, str]] = [  # (family, kind, pattern)
    ("docker", "prefix", '{"log":'),
    ("json_level", "prefix", '{"Level":'),
    ("mongodb", "prefix", '{"t":'),
    ("apache_error", "prefix", "["),
    ("memcached", "prefix", "<"),
    ("java_stack", "regex", r"^(\tat |Caused by: )"),
    ("mysql_slow", "regex", r"^(# Time: |# User@Host: |SELECT )"),
    ("etcd", "regex",
     r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} [A-Z] \| "),
    ("jetty9", "regex",
     r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}:[A-Z]+:"),
    ("postgresql", "regex",
     r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3} UTC \[\d+\] "),
    ("rabbitmq", "regex",
     r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3} \[[a-z]+\] <"),
    ("mysql_error", "regex",
     r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} \d+ \[\w+\] "),
    ("zookeeper", "regex",
     r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} - [A-Z]+ +\["),
    ("mysql_query", "regex", r"^\d{6} \d{2}:\d{2}:\d{2}"),
    ("nginx_error", "regex",
     r"^\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2} \[[a-z0-9]+\] \d+#\d+: "),
    ("tomcat", "regex",
     r"^\d{2}-[A-Z][a-z]{2}-\d{4} \d{2}:\d{2}:\d{2} [A-Z]+ \["),
    ("cassandra", "regex", r"^[A-Z]+ +\[[\w:]+\] \d"),
    # redis router expr order: handler first (logs_config_linux.yaml:480-485)
    ("redis_handler", "regex", r"^[0-9]+:[\w-]+ \([0-9]+\) "),
    ("redis_server", "regex", r"^[0-9]+:[A-Z] "),
    # combined NCSA before common NCSA: combined requires the trailing
    # "referer" "agent" pair that common lines lack (and vice versa: common
    # requires end-of-line after size) — disjoint, order kept for clarity
    ("apache_access", "regex", RX["apache_access"]),
    ("ncsa_common", "regex", RX["ncsa_common"]),
    ("syslog", "regex", r"^[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2} \S+ "),
    # sanitization family: any line bearing a phone-shaped token
    # (examples/otel-logs-sanitization-splunk/otel-collector-config.yml:6)
    ("pii", "regex", r"\d{4}-\d{3}-\d{4}"),
]


def _np(arr) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False)


_MONTH_NUM = {m: f"{i:02d}" for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"], 1)}

# layouts with %a/%b/%z, where pandas' strptime is ~30× slower than numeric
# formats — parsed on a vectorized fast path (fixed-width slice + month map +
# numeric strptime + numeric zone offset), with a per-row strptime fallback
# for anything the slicing mis-reads (e.g. space-padded days)
_FAST_LAYOUTS = {
    "%d/%b/%Y:%H:%M:%S %z", "%a %b %d %H:%M:%S %Y",
    "%d %b %Y %H:%M:%S.%f", "%d-%b-%Y %H:%M:%S",
}


_MONTH_NAMES_ARR = pa.array(list(_MONTH_NUM))
_MONTH_NUMS_ARR = pa.array(list(_MONTH_NUM.values()))


def _fast_strptime(raw, layout: str) -> pd.Series:
    """Fast vectorized parse for the %b-month layouts; returns naive-UTC.

    Arrow-kernel path (utf8 slices + dictionary month map + null-joining
    concat + ``pc.strptime(error_is_null=True)`` — no per-row Python, r5)
    with the original pandas construction as a whole-batch fallback when
    a slice is so mis-shaped the numeric casts fail; per-row mis-reads
    (non-padded days etc.) still drop to real strptime row-wise."""
    if isinstance(raw, np.ndarray):
        arr = pa.array(pd.Series(raw, dtype=object).fillna("").astype(str),
                       type=pa.string())
    else:
        arr = raw if not isinstance(raw, pa.ChunkedArray) \
            else raw.combine_chunks()
    try:
        return _fast_strptime_arrow(arr, layout)
    except (pa.lib.ArrowInvalid, pa.lib.ArrowNotImplementedError):
        return _fast_strptime_pandas(
            pd.Series(_np(arr), dtype=object), layout)


def _fast_strptime_arrow(arr: pa.Array, layout: str) -> pd.Series:
    s = pc.fill_null(arr, "")

    def sl(a: int, b: int | None) -> pa.Array:
        return pc.utf8_slice_codeunits(s, a, b if b is not None else 2**30)

    def mon(a: int, b: int) -> pa.Array:
        return pc.take(_MONTH_NUMS_ARR,
                       pc.index_in(sl(a, b), value_set=_MONTH_NAMES_ARR))

    def iso_of(y, m, d, hms) -> pa.Array:  # null month → null iso → null ts
        ymd = pc.binary_join_element_wise(y, m, d, "-")
        return pc.binary_join_element_wise(ymd, hms, " ")

    def parse(iso: pa.Array) -> pd.Series:
        return pc.strptime(iso, format="%Y-%m-%d %H:%M:%S", unit="us",
                           error_is_null=True).to_pandas() \
            .astype("datetime64[ns]")  # match the historical pandas dtype

    def num(piece: pa.Array) -> np.ndarray:  # "" → 0; garbage raises →
        z = pc.if_else(pc.equal(piece, ""), "0", piece)  # pandas fallback
        return pc.cast(z, pa.int64()).to_numpy(zero_copy_only=False)

    if layout == "%d/%b/%Y:%H:%M:%S %z":
        out = parse(iso_of(sl(7, 11), mon(3, 6), sl(0, 2), sl(12, 20)))
        sign = np.where(_np(pc.equal(sl(21, 22), "-")), -1, 1)
        mins = num(sl(22, 24)) * 60 + num(sl(24, 26))
        out = out - pd.to_timedelta(sign * mins, unit="m")
    elif layout == "%a %b %d %H:%M:%S %Y":
        out = parse(iso_of(sl(20, 24), mon(4, 7), sl(8, 10), sl(11, 19)))
    elif layout == "%d %b %Y %H:%M:%S.%f":
        out = parse(iso_of(sl(7, 11), mon(3, 6), sl(0, 2), sl(12, 20)))
        frac = pc.utf8_rpad(sl(21, 27), 6, "0")  # ".%f" → exact µs
        out = out + pd.to_timedelta(num(frac), unit="us")
    elif layout == "%d-%b-%Y %H:%M:%S":
        out = parse(iso_of(sl(7, 11), mon(3, 6), sl(0, 2), sl(12, 20)))
    else:  # pragma: no cover - guarded by _FAST_LAYOUTS
        raise ValueError(layout)

    svals = pd.Series(_np(s), dtype=object)
    bad = out.isna() & (svals != "")
    if bad.any():  # slicing mis-read (non-padded day etc.) → real strptime
        slow = pd.to_datetime(svals[bad], format=layout, errors="coerce",
                              utc="%z" in layout)
        if getattr(slow.dt, "tz", None) is not None:
            slow = slow.dt.tz_convert("UTC").dt.tz_localize(None)
        out = out.copy()
        out[bad] = slow
    return out


def _rendered_len(fmt: str) -> int:
    """Character width of a fixed-width numeric strftime layout."""
    return len(fmt.replace("%Y", "####").replace("%y", "##")
               .replace("%m", "##").replace("%d", "##").replace("%H", "##")
               .replace("%M", "##").replace("%S", "##"))


def _numeric_strptime(tarr, fmt: str) -> pd.Series:
    """Arrow-kernel strptime for fixed-width NUMERIC layouts, with a
    trailing ``.%f`` fraction (and optional literal ``Z``) handled by a
    prefix/fraction split — bit-equal to ``pd.to_datetime(format=fmt,
    errors="coerce")`` including its reject-on-trailing-garbage rule
    (pinned by test). Falls back to pandas when a fraction slice is so
    mis-shaped the int cast fails."""
    arr = tarr if not isinstance(tarr, pa.ChunkedArray) \
        else tarr.combine_chunks()
    try:
        return _numeric_strptime_arrow(arr, fmt)
    except (pa.lib.ArrowInvalid, pa.lib.ArrowNotImplementedError):
        return pd.to_datetime(pd.Series(_np(arr), dtype=object), format=fmt,
                              errors="coerce")


def _numeric_strptime_arrow(arr: pa.Array, fmt: str) -> pd.Series:
    full = pc.fill_null(arr, "")
    base, z_req = fmt, False
    if base.endswith("Z"):
        base, z_req = base[:-1], True
    frac_sub = None
    sub_unit = "us"
    bad = None
    s = full
    if base.endswith(".%f"):
        base = base[:-3]
        ln = _rendered_len(base)
        lens = _np(pc.utf8_length(full))
        # pandas %f demands '.' then 1-6 digits then END (then the literal
        # Z when the layout carries one) — replicate the reject rule
        dot = _np(pc.equal(pc.utf8_slice_codeunits(full, ln, ln + 1), "."))
        if z_req:
            # pandas' ISO fast-path accepts 1-9 fraction digits (ns) when
            # the layout ends in a literal — replicate, in nanoseconds
            bad = ~(dot & _np(pc.ends_with(full, "Z"))
                    & (lens >= ln + 3) & (lens <= ln + 11))
            frac = pc.replace_substring(
                pc.utf8_slice_codeunits(full, ln + 1, ln + 10), "Z", "")
            width = 9
        else:
            bad = ~(dot & (lens >= ln + 2) & (lens <= ln + 7))
            frac = pc.utf8_slice_codeunits(full, ln + 1, ln + 7)
            width = 6
        sub_unit = "ns" if width == 9 else "us"
        frac_sub = pc.cast(pc.utf8_rpad(frac, width, "0"),
                           pa.int64()).to_numpy(zero_copy_only=False)
        s = pc.utf8_slice_codeunits(full, 0, ln)
    elif z_req:
        bad = ~_np(pc.ends_with(full, "Z"))
        s = pc.utf8_slice_codeunits(full, 0, _rendered_len(base))
    out = pc.strptime(s, format=base, unit="us",
                      error_is_null=True).to_pandas() \
        .astype("datetime64[ns]")
    if frac_sub is not None:
        out = out + pd.to_timedelta(frac_sub, unit=sub_unit)
    if bad is not None and bad.any():
        out = out.copy()
        out[bad] = pd.NaT
    return out


def _fast_strptime_pandas(s: pd.Series, layout: str) -> pd.Series:
    s = s.fillna("").astype(str)
    s.index = pd.RangeIndex(len(s))

    def mon(a: int, b: int) -> pd.Series:
        return s.str.slice(a, b).map(_MONTH_NUM)

    if layout == "%d/%b/%Y:%H:%M:%S %z":
        iso = (s.str.slice(7, 11) + "-" + mon(3, 6) + "-" + s.str.slice(0, 2)
               + " " + s.str.slice(12, 20))
        out = pd.to_datetime(iso, format="%Y-%m-%d %H:%M:%S", errors="coerce")
        sign = np.where(s.str.slice(21, 22) == "-", -1, 1)
        mins = (pd.to_numeric(s.str.slice(22, 24), errors="coerce") * 60
                + pd.to_numeric(s.str.slice(24, 26), errors="coerce"))
        out = out - pd.to_timedelta(sign * mins, unit="m")
    elif layout == "%a %b %d %H:%M:%S %Y":
        iso = (s.str.slice(20, 24) + "-" + mon(4, 7) + "-"
               + s.str.slice(8, 10) + " " + s.str.slice(11, 19))
        out = pd.to_datetime(iso, format="%Y-%m-%d %H:%M:%S", errors="coerce")
    elif layout == "%d %b %Y %H:%M:%S.%f":
        iso = (s.str.slice(7, 11) + "-" + mon(3, 6) + "-" + s.str.slice(0, 2)
               + " " + s.str.slice(12))
        out = pd.to_datetime(iso, format="%Y-%m-%d %H:%M:%S.%f",
                             errors="coerce")
    elif layout == "%d-%b-%Y %H:%M:%S":
        iso = (s.str.slice(7, 11) + "-" + mon(3, 6) + "-" + s.str.slice(0, 2)
               + " " + s.str.slice(12, 20))
        out = pd.to_datetime(iso, format="%Y-%m-%d %H:%M:%S", errors="coerce")
    else:  # pragma: no cover - guarded by _FAST_LAYOUTS
        raise ValueError(layout)

    bad = out.isna() & (s != "")
    if bad.any():
        slow = pd.to_datetime(s[bad], format=layout, errors="coerce",
                              utc="%z" in layout)
        if getattr(slow.dt, "tz", None) is not None:
            slow = slow.dt.tz_convert("UTC").dt.tz_localize(None)
        out = out.copy()
        out[bad] = slow
    return out


class ParseStage:
    """Arrow-native parse stage for ``map_batches`` (RE2 kernels, no row loop)."""

    def __init__(self) -> None:
        self.detect = DETECT
        self.rx = RX

    def classify(self, text: pa.Array) -> tuple[np.ndarray, list[str]]:
        """First-match router → (int8 family codes, family name list).

        Codes (not object strings) keep the hot path allocation-free; code
        len(names) == 'plain' fallback. Short-circuit evaluation: each
        detect pattern only scans rows no earlier pattern claimed (first
        match wins anyway), which cuts the RE2 row-scans from
        #families × n to roughly the sum of the shrinking remainders —
        the win that keeps 23 families near the 11-family parse cost.
        """
        n = len(text)
        codes = np.full(n, -1, dtype=np.int16)
        names = []
        unclaimed = np.ones(n, dtype=bool)
        for i, (name, kind, pat) in enumerate(self.detect):
            names.append(name)
            idx = np.flatnonzero(unclaimed)
            if not len(idx):
                continue
            sub = text if len(idx) == n else text.take(
                pa.array(idx, type=pa.int64()))
            if kind == "prefix":
                m = pc.starts_with(sub, pat)
            else:
                m = pc.match_substring_regex(sub, pat)
            hit = idx[_np(m)]
            codes[hit] = i
            unclaimed[hit] = False
        codes[codes < 0] = len(names)
        return codes.astype(np.int8), [*names, "plain"]

    # -- the batch transform ----------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if text.null_count:  # null body → empty line (classifies as plain)
            text = pc.fill_null(text, "")
        ts_in_np = _np(batch.column("ts")).astype("datetime64[us]")
        codes, names = self.classify(text)

        body = text  # default: raw line — stays Arrow end to end
        sev_text = np.full(n, "", dtype=object)
        sev_num = np.zeros(n, dtype=np.int8)
        ts_out = ts_in_np.copy()
        attr_vals: dict[str, dict[str, np.ndarray]] = {}

        def put_ts(idx: np.ndarray, parsed: pd.Series) -> None:
            v = parsed.to_numpy()
            v = v.astype("datetime64[us]")
            ok = ~pd.isna(v)
            ts_out[idx[ok]] = v[ok]  # failures keep observed-time fallback

        def put_body(mask: np.ndarray, sub: pa.Array, vals: pa.Array) -> None:
            # null extraction (parse failure) keeps the raw line — coalesce,
            # then scatter into body via Arrow's replace_with_mask (no Python
            # string objects are materialized)
            nonlocal body
            body = pc.replace_with_mask(
                body, pa.array(mask), pc.coalesce(vals, sub))

        def put_sev(idx: np.ndarray, tokens: pa.Array, table: dict) -> None:
            s = pd.Series(_np(tokens).astype(object)).map(table).fillna("")
            sev_text[idx] = s.to_numpy()
            sev_num[idx] = s.map(SEVERITY_NUMBER).fillna(0).astype(np.int8)

        def attrs_of(family: str, fields, idx) -> None:
            keys = FAMILY_ATTR_KEYS[family]
            if not keys:
                return
            out = {}
            for out_key in keys:
                fname = "role" if out_key == "redis_role" else out_key
                v = _np(fields[fname]).astype(object)
                out[out_key] = np.where(pd.isna(v), "", v)
            attr_vals[family] = out

        for fam_code, family in enumerate(names):
            if family == "plain" or family not in self.rx:
                # raw-passthrough families (memcached, mysql_slow, java_stack)
                # have no operator chain: body = line, no ts/severity
                continue
            mask = codes == fam_code
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            sub = text.take(pa.array(idx, type=pa.int64()))
            st = pc.extract_regex(sub, self.rx[family])
            f = self._fields(st)

            if family == "apache_access":
                put_ts(idx, _fast_strptime(
                    f["time"], "%d/%b/%Y:%H:%M:%S %z"))
                attrs_of(family, f, idx)
            elif family == "apache_error":
                put_ts(idx, _fast_strptime(
                    f["time"], "%a %b %d %H:%M:%S %Y"))
                put_sev(idx, f["level"], APACHE_ERROR_LEVELS)
                put_body(mask, sub, f["log"])
                attrs_of(family, f, idx)
            elif family == "syslog":
                # no year in the layout (%b %e %H:%M:%S) — stanza infers the
                # current year; we pin it to the observed (input) ts year
                years = ts_in_np[idx].astype("datetime64[Y]").astype(int) + 1970
                withyear = pd.Series(years.astype(str)) + " " + pd.Series(
                    _np(f["time"]).astype(object)).fillna("")
                put_ts(idx, pd.to_datetime(
                    withyear, format="%Y %b %d %H:%M:%S", errors="coerce"))
                put_body(mask, sub, f["log"])
                attrs_of(family, f, idx)
            elif family == "docker":
                put_ts(idx, _numeric_strptime(
                    f["time"], "%Y-%m-%dT%H:%M:%S.%fZ"))
                put_body(mask, sub, pc.replace_substring(f["log"], "\\n", "\n"))
                attrs_of(family, f, idx)
            elif family == "redis_server":
                put_ts(idx, _fast_strptime(
                    f["time"], "%d %b %Y %H:%M:%S.%f"))
                put_sev(idx, f["level"], REDIS_LEVELS)
                put_body(mask, sub, f["log"])
                attrs_of(family, f, idx)
            elif family == "redis_handler":
                # layout_type: epoch, layout: s (logs_config_linux.yaml:503-506)
                put_ts(idx, pd.to_datetime(pd.to_numeric(
                    pd.Series(_np(f["time"]).astype(object)), errors="coerce"),
                    unit="s", errors="coerce"))
                put_body(mask, sub, f["log"])
                attrs_of(family, f, idx)
            elif family == "mongodb":
                # layout '%Y-%m-%dT%H:%M:%S.%L%z' (logs_config_linux.yaml:280)
                put_ts(idx, pd.to_datetime(
                    _np(f["time"]), format="%Y-%m-%dT%H:%M:%S.%f%z",
                    errors="coerce", utc=True).tz_localize(None))
                put_sev(idx, f["level"], MONGODB_LEVELS)
                put_body(mask, sub, f["log"])
                attrs_of(family, f, idx)
            elif family == "etcd":
                put_ts(idx, _numeric_strptime(
                    f["time"], "%Y-%m-%d %H:%M:%S"))
                put_sev(idx, f["level"], ETCD_LEVELS)
                put_body(mask, sub, f["log"])
            elif family == "json_level":
                put_sev(idx, f["level"], JSON_LEVEL_MAP)
                # transform deletes Level/message/time; body stays raw line
            elif family == "pii":
                # regex_parser parse_to body.parsed + add body
                # EXPR(before + "XXX-XXX-XXXX" + after)
                put_body(mask, sub, pc.binary_join_element_wise(
                    f["before"], f["after"], "XXX-XXX-XXXX"))
            elif family in SIMPLE_FAMILY:
                ts_fmt, tz, strip, sev_table, sev_lower, body_grp = \
                    SIMPLE_FAMILY[family]
                tarr = f["time"]
                if strip:
                    tarr = pc.replace_substring(tarr, strip, "")
                if ts_fmt in _FAST_LAYOUTS:
                    parsed = _fast_strptime(tarr, ts_fmt)
                elif not tz:  # fixed-width numeric layout → Arrow kernels
                    parsed = _numeric_strptime(tarr, ts_fmt)
                else:
                    parsed = pd.to_datetime(
                        _np(tarr), format=ts_fmt, errors="coerce", utc=tz)
                    parsed = parsed.tz_localize(None)
                put_ts(idx, parsed)
                if sev_table is not None:
                    tok = pc.utf8_lower(f["level"]) if sev_lower else f["level"]
                    put_sev(idx, tok, sev_table)
                if body_grp is not None:
                    put_body(mask, sub, f[body_grp])
                attrs_of(family, f, idx)

        # deterministic tool-call span ids (FIXTURES.md §2): surrogate for the
        # collector's trace/span context on tool-call turns; raw line sources
        # (sources/filelog) carry no transcript columns → no spans
        span_id = np.full(n, "", dtype=object)
        has_transcript_cols = {"role", "tool", "conv_id",
                               "turn_idx"} <= set(batch.column_names)
        if has_transcript_cols:
            role = batch.column("role")
            tool = batch.column("tool")
            has_span = _np(pc.and_(pc.equal(role, "tool"),
                                   pc.not_equal(tool, "")))
        if has_transcript_cols and has_span.any():
            import binascii

            sidx = np.flatnonzero(has_span)
            conv_sub = pc.cast(pc.utf8_slice_codeunits(
                batch.column("conv_id").take(pa.array(sidx)), 5, 32), pa.int64())
            turn_sub = _np(batch.column("turn_idx").take(pa.array(sidx))).astype(
                np.int64)
            raw = _np(conv_sub) * 100_000 + turn_sub
            # vectorized 016x: big-endian u64 bytes → one hexlify → S16 view
            hexes = binascii.hexlify(raw.astype(">u8").tobytes())
            span_id[sidx] = np.frombuffer(hexes, dtype="S16").astype("U16")

        fam_names = np.asarray(names, dtype=object)
        attributes = self._build_map(codes, fam_names, attr_vals, n)

        # passthrough-preserving output: keep every input column except the
        # consumed `text` and the replaced `ts` (original ts → observed_ts),
        # so upstream-added columns (e.g. a lineage `part` id) survive.
        cols = {name: col for name, col in zip(batch.column_names, batch.columns)
                if name not in ("text", "ts")}
        cols["ts"] = pa.array(ts_out, type=pa.timestamp("us"))
        cols["observed_ts"] = batch.column("ts")
        # format names materialize via Arrow take on the tiny name list —
        # a C-level string build, no per-row Python objects
        cols["log_format"] = pc.take(
            pa.array(names, type=pa.string()), pa.array(codes, type=pa.int8()))
        cols["body"] = body
        cols["severity_text"] = pa.array(sev_text, type=pa.string())
        cols["severity_number"] = pa.array(sev_num, type=pa.int8())
        cols["attributes"] = attributes
        cols["span_id"] = pa.array(span_id, type=pa.string())
        return pa.table(cols)

    # per-worker-process singleton so the compiled chain can run as a plain
    # FUNCTION stage (fusable with the read and downstream task stages) —
    # for heavyweight state use the class as an actor pool instead.
    _singleton: "ParseStage | None" = None

    @classmethod
    def as_fn(cls):
        def parse_batch(batch: pa.Table) -> pa.Table:
            if cls._singleton is None:
                cls._singleton = cls()
            return cls._singleton(batch)

        return parse_batch

    @classmethod
    def classify_fn(cls):
        """Router classification ONLY (log_format column on the raw text) —
        for stages that run BEFORE parsing, like multiline framing, which in
        the reference frames raw lines before the operator chain sees them."""

        def classify_batch(batch: pa.Table) -> pa.Table:
            if cls._singleton is None:
                cls._singleton = cls()
            text = batch["text"]
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            if text.null_count:
                text = pc.fill_null(text, "")
            codes, names = cls._singleton.classify(text)
            return batch.append_column("log_format", pc.take(
                pa.array(names, type=pa.string()),
                pa.array(codes, type=pa.int8())))

        return classify_batch

    @staticmethod
    def _fields(st: pa.StructArray) -> dict[str, pa.Array]:
        """extract_regex fields with parse-failure rows as NULLs.

        StructArray.field() does NOT propagate the struct-level validity —
        a non-matching row's children read as empty strings, which would
        silently clobber `body` with "" instead of keeping the raw line
        (stanza on_error=send keeps the record). Mask them back to null so
        every downstream coalesce/strptime fallback fires."""
        valid = pc.is_valid(st)
        if pc.all(valid, min_count=0).as_py():
            return {fld.name: st.field(fld.name) for fld in st.type}
        nulls = pa.nulls(len(st), pa.string())
        return {fld.name: pc.if_else(valid, st.field(fld.name), nulls)
                for fld in st.type}

    @staticmethod
    def _build_map(
        codes: np.ndarray, fam_names: np.ndarray,
        attr_vals: dict[str, dict[str, np.ndarray]], n: int
    ) -> pa.Array:
        """Build map<string,string> from per-family flat arrays, no row loop."""
        code_of = {name: i for i, name in enumerate(fam_names)}
        counts = np.zeros(n, dtype=np.int64)
        for name, vals in attr_vals.items():
            counts[codes == code_of[name]] = len(vals)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        total = int(offsets[-1])
        keys_flat = np.empty(total, dtype=object)
        vals_flat = np.empty(total, dtype=object)
        for name, vals in attr_vals.items():
            idx = np.flatnonzero(codes == code_of[name])
            starts = offsets[idx]
            for j, k in enumerate(vals):
                keys_flat[starts + j] = k
                vals_flat[starts + j] = vals[k]
        return pa.MapArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(keys_flat, type=pa.string()),
            pa.array(vals_flat, type=pa.string()),
        )
