"""Routing first-match semantics + enrichment broadcast-lookup semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa

from splunk_otel_collector_ray.stages.enrich import EnrichStage, build_dim_table
from splunk_otel_collector_ray.stages.route import RouteStage


def _batch(rows):
    df = pd.DataFrame(rows)
    df["severity_number"] = df["severity_number"].astype(np.int8)
    return pa.Table.from_pandas(df, preserve_index=False)


def test_first_match_wins():
    # a record matching rules 1 AND 2 must land only in sink_tools
    t = _batch([
        {"conv_id": "conv-00000001", "role": "tool", "tool": "bash",
         "severity_number": 21, "log_format": "apache_error"},
        {"conv_id": "conv-00000002", "role": "assistant", "tool": "",
         "severity_number": 17, "log_format": "apache_error"},
        {"conv_id": "conv-00000003", "role": "assistant", "tool": "",
         "severity_number": 9, "log_format": "plain"},
        {"conv_id": "conv-00000004", "role": "user", "tool": "",
         "severity_number": 0, "log_format": "plain"},
        # role=='tool' but tool=='' → rule 1 does NOT match
        {"conv_id": "conv-00000005", "role": "tool", "tool": "",
         "severity_number": 0, "log_format": "plain"},
    ])
    out = RouteStage()(t).to_pandas()
    assert list(out.sink) == ["sink_tools", "sink_errors", "sink_assistant",
                              "sink_default", "sink_default"]


def test_route_stage_sinks_list():
    rs = RouteStage()
    assert rs.sinks == ["sink_tools", "sink_errors", "sink_assistant",
                        "sink_default"]


def test_enrich_lookup_and_override():
    t = _batch([
        {"conv_id": "conv-00000000", "role": "user", "tool": "",
         "severity_number": 0, "log_format": "plain"},
        {"conv_id": "conv-00000065", "role": "user", "tool": "",
         "severity_number": 0, "log_format": "syslog"},
    ])
    # pre-existing host.name must be OVERRIDDEN (extraDimensions merge)
    t = t.append_column("host.name", pa.array(["stale", "stale"]))
    out = EnrichStage()(t).to_pandas()
    dims = build_dim_table()
    # conv 0 → bucket 0; conv 65 → bucket 1
    assert out["k8s.pod.name"].tolist() == ["pod-00", "pod-01"]
    assert out["host.name"].tolist() == [
        dims.loc[0, "host.name"], dims.loc[1, "host.name"]]
    assert (out["com.splunk.source"] == "transcripts").all()
    assert out["com.splunk.sourcetype"].tolist() == ["plain", "syslog"]


def test_dim_table_deterministic():
    assert build_dim_table().equals(build_dim_table())
