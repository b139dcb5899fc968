"""ParseStage unit tests — stanza operator-chain semantics on fixed lines.

Pinned against the reference configs (see stages/parse.py citations):
regex/json parse, timestamp layouts, severity mapping tables, move/retain,
router first-match, sanitization EXPR.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.stages.parse import FAMILY_ATTR_KEYS, ParseStage


def _parse_lines(lines, ts="2026-03-01T12:00:00"):
    n = len(lines)
    t = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(n)]),
        "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
        "role": pa.array(["user"] * n),
        "tool": pa.array([""] * n),
        "text": pa.array(lines),
        "ts": pa.array([pd.Timestamp(ts)] * n, type=pa.timestamp("us")),
    })
    return ParseStage()(t).to_pandas()


def test_apache_access():
    line = ('10.1.2.3 - frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326 "-" "Mozilla"')
    r = _parse_lines([line]).iloc[0]
    assert r.log_format == "apache_access"
    attrs = dict(r.attributes)
    assert attrs["host"] == "10.1.2.3"
    assert attrs["method"] == "GET"
    assert attrs["code"] == "200"
    # %z layout → UTC naive (13:55:36 -0700 == 20:55:36 UTC)
    assert r.ts == pd.Timestamp("2000-10-10 20:55:36")
    assert r.body == line  # no move in the apache-access chain
    assert r.severity_number == 0


def test_apache_error_severity_mapping():
    # custom map: fatal:emerg, error3:alert, error2:crit, info2:notice
    cases = {"emerg": ("FATAL", 21), "alert": ("ERROR3", 19),
             "crit": ("ERROR2", 18), "error": ("ERROR", 17),
             "warn": ("WARN", 13), "notice": ("INFO2", 10),
             "info": ("INFO", 9), "debug": ("DEBUG", 5), "trace1": ("TRACE", 1)}
    lines = [f"[Thu Jun 27 06:58:09 2024] [core:{lvl}] [pid 10:tid 20] boom"
             for lvl in cases]
    df = _parse_lines(lines)
    for (lvl, (txt, num)), (_, row) in zip(cases.items(), df.iterrows()):
        assert row.severity_text == txt, lvl
        assert row.severity_number == num, lvl
        assert row.body == "boom"
        assert dict(row.attributes) == {"module": "core"}
        assert row.ts == pd.Timestamp("2024-06-27 06:58:09")


def test_syslog():
    r = _parse_lines(["Mar 01 06:15:30 web-1 sshd[4321]: session opened"]).iloc[0]
    assert r.log_format == "syslog"
    assert r.body == "session opened"
    assert dict(r.attributes) == {"program": "sshd"}
    # year inferred from the observed (input) ts
    assert r.ts == pd.Timestamp("2026-03-01 06:15:30")


def test_docker_json():
    r = _parse_lines(['{"log":"hello world\\n","stream":"stderr",'
                      '"time":"2024-01-02T03:04:05.123456Z"}']).iloc[0]
    assert r.log_format == "docker"
    assert r.body == "hello world\n"        # move log → body keeps the \n
    assert dict(r.attributes) == {"stream": "stderr"}
    assert r.ts == pd.Timestamp("2024-01-02 03:04:05.123456")


def test_redis_router_first_match():
    # router order: handler pattern first, then server
    # (logs_config_linux.yaml:480-485)
    hnd = "123:signal-handler (1767225687) Received SIGTERM"
    srv = "123:M 01 Jan 2026 00:01:27.005 # Server started"
    df = _parse_lines([hnd, srv])
    assert list(df.log_format) == ["redis_handler", "redis_server"]
    assert df.iloc[0].body == "Received SIGTERM"
    assert df.iloc[0].ts == pd.Timestamp("2026-01-01 00:01:27")  # epoch secs
    assert df.iloc[1].severity_text == "WARN"  # '#' symbol map
    assert df.iloc[1].ts == pd.Timestamp("2026-01-01 00:01:27.005")
    assert dict(df.iloc[1].attributes) == {"redis_role": "M"}


def test_redis_symbol_severities():
    syms = {"#": ("WARN", 13), "*": ("INFO", 9), "-": ("INFO2", 10),
            ".": ("DEBUG", 5)}
    lines = [f"9:M 01 Jan 2026 00:00:00.000 {s} msg" for s in syms]
    df = _parse_lines(lines)
    for (s, (txt, num)), (_, row) in zip(syms.items(), df.iterrows()):
        assert (row.severity_text, row.severity_number) == (txt, num), s


def test_json_level_transform():
    cases = {"DETAIL": "DEBUG", "LOG": "INFO", "SEVERE": "WARN"}
    lines = [f'{{"Level":"{k}","message":"m","time":"2026-01-01T00:00:00"}}'
             for k in cases]
    df = _parse_lines(lines)
    assert list(df.severity_text) == list(cases.values())
    assert all(len(a) == 0 for a in df.attributes)  # delete_key'd


def test_mongodb_structured():
    cases = {"F": ("FATAL", 21), "E": ("ERROR", 17), "W": ("WARN", 13),
             "I": ("INFO", 9), "D1": ("DEBUG", 5), "D2": ("DEBUG2", 6),
             "D3": ("DEBUG3", 7), "D4": ("DEBUG4", 8)}
    lines = ['{"t":{"$date":"2026-02-03T04:05:06.123+00:00"},"s":"%s",'
             '"c":"NETWORK","ctx":"conn7","msg":"hello"}' % lvl
             for lvl in cases]
    df = _parse_lines(lines)
    assert (df.log_format == "mongodb").all()
    for (lvl, (txt, num)), (_, row) in zip(cases.items(), df.iterrows()):
        assert (row.severity_text, row.severity_number) == (txt, num), lvl
        assert row.body == "hello"
        assert dict(row.attributes) == {"ctx": "conn7"}
        assert row.ts == pd.Timestamp("2026-02-03 04:05:06.123")


def test_etcd():
    cases = {"C": "FATAL", "E": "ERROR", "W": "WARN", "N": "INFO2",
             "I": "INFO", "D": "DEBUG", "T": "TRACE"}
    lines = [f"2026-02-03 04:05:06 {lvl} | raft ready" for lvl in cases]
    df = _parse_lines(lines)
    assert (df.log_format == "etcd").all()
    assert df.severity_text.tolist() == list(cases.values())
    assert (df.body == "raft ready").all()
    assert (df.ts == pd.Timestamp("2026-02-03 04:05:06")).all()


def test_pii_sanitization():
    r = _parse_lines(["call 1234-567-8901 now"]).iloc[0]
    assert r.log_format == "pii"
    assert r.body == "call XXX-XXX-XXXX now"


def test_plain_passthrough():
    r = _parse_lines(["just some text"]).iloc[0]
    assert r.log_format == "plain"
    assert r.body == "just some text"
    assert r.severity_number == 0 and r.severity_text == ""
    assert len(r.attributes) == 0


def test_unparseable_ts_falls_back_to_observed():
    r = _parse_lines(["[not a real time] [core:error] [pid 1:tid 2] x"]).iloc[0]
    assert r.log_format == "apache_error"
    assert r.ts == r.observed_ts  # strptime failed → observed-time fallback


def test_detection_matches_generation_arithmetic():
    """Engine regex-router classification == corpus fmt arithmetic, full sf."""
    t = corpus.build_transcripts("sf0.001")
    df = ParseStage()(t).to_pandas()
    conv_seq = df.conv_id.str.slice(5).astype(np.int64)
    fmt = (conv_seq * 1000003 + df.turn_idx * 7919) % corpus.N_FORMATS
    names = {0: "apache_access", 1: "apache_error", 2: "syslog", 3: "docker",
             5: "plain", 6: "pii", 7: "json_level", 8: "docker",
             9: "mongodb", 10: "etcd", 12: "jetty9", 13: "memcached",
             14: "mysql_error", 15: "mysql_query", 16: "mysql_slow",
             17: "nginx_error", 18: "postgresql", 19: "rabbitmq",
             20: "tomcat", 21: "zookeeper", 22: "ncsa_common"}
    exp = np.where(
        fmt == 4,
        np.where(df.turn_idx % 2 == 0, "redis_server", "redis_handler"),
        np.where(
            fmt == 11,
            np.where((conv_seq + df.turn_idx) % 5 == 4, "java_stack",
                     "cassandra"),
            pd.Series(fmt).map(names)))
    assert (df.log_format.to_numpy() == exp).all()


def test_null_empty_and_garbage_text_fall_through_to_plain():
    df = _parse_lines(["", "total garbage \x01\x02", '{"log":"incomplete'])
    # empty + control-char garbage → plain passthrough, no severity, no crash
    assert df.log_format.tolist() == ["plain", "plain", "docker"]
    assert (df.severity_number[:2] == 0).all()
    # docker prefix matched but the record fails the full regex → raw body
    assert df.body.iloc[2] == '{"log":"incomplete'
    t = pa.table({
        "conv_id": ["conv-00000001"], "turn_idx": pa.array([0], type=pa.int32()),
        "role": ["user"], "tool": [""],
        "text": pa.array([None], type=pa.string()),
        "ts": pa.array([pd.Timestamp("2026-01-01")], type=pa.timestamp("us")),
    })
    out = ParseStage()(t).to_pandas()
    assert out.log_format.iloc[0] == "plain" and out.body.iloc[0] == ""


def test_span_ids_only_for_tool_calls():
    t = corpus.build_transcripts("sf0.001")
    df = ParseStage()(t).to_pandas()
    has = df.span_id != ""
    assert ((df.role == "tool") & (df.tool != "")).equals(has)
    assert df.loc[has, "span_id"].str.len().eq(16).all()


def test_passthrough_columns_survive():
    t = corpus.build_transcripts("sf0.001").slice(0, 100)
    t = t.append_column("part", pa.array(["p0"] * 100))
    out = ParseStage()(t)
    assert "part" in out.column_names


def test_family_attr_keys_retained_only():
    t = corpus.build_transcripts("sf0.001")
    df = ParseStage()(t).to_pandas()
    for fam, keys in FAMILY_ATTR_KEYS.items():
        sub = df[df.log_format == fam]
        if len(sub):
            assert all(sorted(dict(a)) == sorted(keys) for a in sub.attributes.head(20))


def test_csv_parse_quoting_and_malformed():
    import pyarrow as pa

    from splunk_otel_collector_ray.stages.structured import csv_parse

    t = pa.table({"line": [
        'a,b,c',                      # plain
        '1,"x, y",z',                 # quoted field with delimiter inside
        '2,"he said ""hi""",w',       # doubled-quote escape
        'only,two',                   # malformed: too few fields → ''
        ',,',                         # empty fields
    ]})
    out = csv_parse(t, "line", ["f", "g", "h"]).to_pydict()
    assert out["f"] == ["a", "1", "2", "", ""]
    assert out["g"] == ["b", "x, y", 'he said "hi"', "", ""]
    assert out["h"] == ["c", "z", "w", "", ""]


def test_uri_parse_components():
    import pyarrow as pa

    from splunk_otel_collector_ray.stages.structured import uri_parse

    t = pa.table({"u": [
        "https://example.com:8443/a/b?x=1&y=2#frag",
        "http://example.org/",
        "ftp://files.example.net",
        "not a uri",
    ]})
    out = uri_parse(t, "u").to_pydict()
    assert out["scheme"] == ["https", "http", "ftp", ""]
    assert out["host"] == ["example.com", "example.org", "files.example.net",
                           ""]
    assert out["port"] == ["8443", "", "", ""]
    assert out["path"] == ["/a/b", "/", "", ""]
    assert out["query"] == ["x=1&y=2", "", "", ""]
    assert out["fragment"] == ["frag", "", "", ""]


def test_kv_explode_first_delimiter_and_ids():
    import pyarrow as pa

    from splunk_otel_collector_ray.stages.structured import kv_explode

    t = pa.table({"rid": [10, 11], "line": [
        "a=1 b=two c=",          # empty value kept
        "nopairs here",          # no matches → contributes no rows
    ]})
    out = kv_explode(t, "line", ["rid"]).to_pydict()
    assert out["rid"] == [10, 10, 10]
    assert out["key"] == ["a", "b", "c"]
    assert out["value"] == ["1", "two", ""]


def test_json_array_parse_flat_subset():
    import pyarrow as pa

    from splunk_otel_collector_ray.stages.structured import json_array_parse

    t = pa.table({"line": [
        '[7, "purchase", 12]',
        '[8, "with, comma", 0]',
        '[9, "esc \\" quote", 1]',
        "not an array",
    ]})
    out = json_array_parse(t, "line", ["a", "b", "c"]).to_pydict()
    assert out["a"] == ["7", "8", "9", ""]
    assert out["b"] == ["purchase", "with, comma", 'esc \\" quote', ""]
    assert out["c"] == ["12", "0", "1", ""]


def test_numeric_strptime_matches_pandas_coerce():
    """The Arrow numeric-layout strptime must be bit-equal to
    pd.to_datetime(format=..., errors='coerce') — including the
    reject-on-trailing-garbage rule, variable 1-6 digit fractions,
    pandas' 1-9-digit ns fast-path for the trailing-Z layout, and
    empty/null/garbage rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from splunk_otel_collector_ray.stages.parse import _numeric_strptime

    cases = {
        "%Y-%m-%d %H:%M:%S": [
            "2026-01-05 13:04:05", "2026-1-5 13:04:05", "", None,
            "2026-01-05 13:04:05 extra", "garbage", "2026-13-40 99:99:99"],
        "%Y/%m/%d %H:%M:%S": ["2026/01/05 13:04:05", "", None, "x"],
        "%y%m%d %H:%M:%S": ["260105 13:04:05", "", None, "26010 13:04:05"],
        "%Y-%m-%d %H:%M:%S.%f": [
            "2026-01-05 13:04:05.123", "2026-01-05 13:04:05.123456",
            "2026-01-05 13:04:05.1", "2026-01-05 13:04:05",
            "2026-01-05 13:04:05.", "2026-01-05 13:04:05.1234567",
            "", None, "junk", "2026-01-05 13:04:05.12Z"],
        "%Y-%m-%dT%H:%M:%S.%fZ": [
            "2026-01-05T13:04:05.123Z", "2026-01-05T13:04:05.123456Z",
            "2026-01-05T13:04:05.1Z", "2026-01-05T13:04:05.123",
            "2026-01-05T13:04:05.Z", "", None, "junk",
            "2026-01-05T13:04:05.1234567Z",
            "2026-01-05T13:04:05.123456789Z",
            "2026-01-05T13:04:05.1234567890Z", "2026-01-05T13:04:05Z"],
    }
    for fmt, vals in cases.items():
        raw = pd.Series(np.array(vals, dtype=object),
                        dtype=object).fillna("").astype(str)
        new = _numeric_strptime(
            pa.array(raw, type=pa.string()), fmt).reset_index(drop=True)
        old = pd.to_datetime(raw, format=fmt,
                             errors="coerce").reset_index(drop=True)
        assert new.equals(old), fmt


def test_fast_strptime_matches_pandas_construction():
    """The Arrow %b-month fast path must equal the historical pandas
    slice construction on padded, non-padded, empty, null and garbage."""
    import numpy as np
    import pandas as pd

    from splunk_otel_collector_ray.stages.parse import (
        _fast_strptime, _fast_strptime_pandas)

    cases = {
        "%d/%b/%Y:%H:%M:%S %z": [
            "01/Jan/2026:00:00:01 +0000", "15/Mar/2026:23:59:59 -0530",
            "1/Jan/2026:00:00:01 +0000", "", "garbage", None,
            "31/Dec/2025:12:00:00 +1400"],
        "%a %b %d %H:%M:%S %Y": [
            "Mon Jan 05 13:04:05 2026", "Tue Feb 17 00:00:00 2026",
            "Mon Jan  5 13:04:05 2026", "", None, "xx"],
        "%d %b %Y %H:%M:%S.%f": [
            "05 Jan 2026 13:04:05.123", "17 Feb 2026 00:00:00.1",
            "05 Jan 2026 13:04:05.123456", "", None, "junk"],
        "%d-%b-%Y %H:%M:%S": [
            "05-Jan-2026 13:04:05", "17-Feb-2026 00:00:00", "", None, "no"],
    }
    for layout, vals in cases.items():
        raw = np.array(vals, dtype=object)
        new = _fast_strptime(raw, layout).reset_index(drop=True)
        old = _fast_strptime_pandas(
            pd.Series(raw, dtype=object), layout).reset_index(drop=True)
        assert new.equals(old), layout
