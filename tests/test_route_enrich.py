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


def test_enrich_join_variant_matches_broadcast(ray_session):
    """Shuffle-join enrichment (large-dim path) must produce the same dim
    values as the broadcast lookup."""
    import ray.data

    from splunk_otel_collector_ray import corpus
    from splunk_otel_collector_ray.stages.enrich import (
        EnrichStage,
        enrich_via_join,
    )

    t = corpus.build_transcripts("sf0.001").slice(0, 2000)
    t = t.append_column("log_format", pa.array(["plain"] * 2000))
    cols = ["conv_id", "turn_idx", "k8s.pod.name", "k8s.namespace.name",
            "cloud.provider", "host.name"]
    joined = (
        enrich_via_join(ray.data.from_arrow(t))
        .to_pandas()[cols]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    broadcast = (
        EnrichStage()(t).to_pandas()[cols]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert joined.equals(broadcast)


def test_actor_pool_path_matches_function_path(ray_session, sf_dir):
    """use_actors=True (actor pools) and the fused function path must agree."""
    from splunk_otel_collector_ray.pipelines.aggregate import grouped_count
    from splunk_otel_collector_ray.pipelines.logs import build_logs_dataset

    a = grouped_count(build_logs_dataset(sf_dir), ["sink"]).to_pandas()
    b = grouped_count(build_logs_dataset(sf_dir, use_actors=True),
                      ["sink"]).to_pandas()
    a = a.sort_values("sink").reset_index(drop=True)
    b = b.sort_values("sink").reset_index(drop=True)
    assert a.equals(b)
