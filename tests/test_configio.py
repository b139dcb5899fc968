"""YAML config loading + env/file interpolation (configio.py) — the confmap /
configsource layer (internal/configsource/source.go:45-81)."""

import os
import textwrap

import pytest

from splunk_otel_collector_ray.configio import (
    build_pipeline_from_yaml,
    collector_to_spec,
    interpolate,
    load_yaml_pipeline,
)


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("GRAFT_T_DIR", "/data/x")
    obj = {"source": {"transcripts": "${env:GRAFT_T_DIR}"},
           "nested": ["a-${env:GRAFT_T_DIR}-b", 7]}
    out = interpolate(obj)
    assert out["source"]["transcripts"] == "/data/x"
    assert out["nested"] == ["a-/data/x-b", 7]


def test_env_default_and_missing():
    out = interpolate({"v": "${env:GRAFT_NOT_SET_123:-fallback}"}, env={})
    assert out["v"] == "fallback"
    with pytest.raises(KeyError):
        interpolate({"v": "${env:GRAFT_NOT_SET_123}"}, env={})


def test_file_interpolation(tmp_path):
    p = tmp_path / "secret.txt"
    p.write_text("s3cr3t\n")
    assert interpolate({"v": f"${{file:{p}}}"})["v"] == "s3cr3t"


def test_collector_style_conversion():
    doc = {
        "receivers": {"filelog/transcripts": {"path": "/root/testdata/sf0.001"}},
        "processors": {"transform/log": {"statements": ["set(x, 1)"]},
                       "filter_severity": {"min": 13}},
        "exporters": {"file/out": {"path": "/tmp/out"}},
        "service": {"pipelines": {"logs": {
            "receivers": ["filelog/transcripts"],
            "processors": ["transform/log", "filter_severity"],
            "exporters": ["file/out"],
        }}},
    }
    spec = collector_to_spec(doc)
    assert spec["source"] == {"transcripts": "/root/testdata/sf0.001"}
    assert [s["type"] for s in spec["stages"]] == ["transform",
                                                   "filter_severity"]
    assert spec["stages"][0]["statements"] == ["set(x, 1)"]
    assert spec["sink"]["parquet"] == "/tmp/out"


def test_collector_wire_receivers_build(ray_session, sf_dir, tmp_path):
    """kafka / splunk_hec / otlp receiver types resolve through
    collector_to_spec → build_pipeline to the real wire-format readers,
    including kafka's consumer-group offsets_state resume."""
    from splunk_otel_collector_ray import corpus
    from splunk_otel_collector_ray.config import build_pipeline
    from splunk_otel_collector_ray.sources.kafka import (commit_offsets,
                                                         read_kafka_dump)

    n_turns = corpus.n_turns_for(corpus.sf_name(sf_dir))
    kpath = corpus.ensure_kafka_dump(sf_dir)

    def build(recv_name, cfg):
        doc = {"receivers": {recv_name: cfg},
               "service": {"pipelines": {"logs": {
                   "receivers": [recv_name], "processors": []}}}}
        return build_pipeline(collector_to_spec(doc))

    assert build("kafka/in", {"path": kpath}).count() == n_turns
    hpath = corpus.ensure_hec_jsonl(sf_dir)
    assert build("splunk_hec/in", {"path": hpath}).count() == n_turns

    # kafka offsets_state: committed marks make the re-read empty
    state = str(tmp_path / "g.offsets.json")
    commit_offsets(state, read_kafka_dump(kpath))
    assert build("kafka/in", {"path": kpath,
                              "offsets_state": state}).count() == 0

    # azureeventhub: Capture dump resolves to the record-explode reader;
    # checkpoint_state makes the re-read empty (processor resume)
    from splunk_otel_collector_ray.sources.eventhub import (
        checkpoint_sequences, read_eventhub_capture)

    epath = corpus.ensure_eventhub_dump(sf_dir)
    assert build("azureeventhub/in", {"path": epath}).count() == n_turns
    estate = str(tmp_path / "eh.checkpoint.json")
    checkpoint_sequences(estate, read_eventhub_capture(epath))
    assert build("azureeventhub/in", {
        "path": epath, "checkpoint_state": estate}).count() == 0

    # pulsar: partition dump resolves to the batch-entry reader; a fully
    # acked cursor_state makes the re-read empty (subscription resume)
    from splunk_otel_collector_ray.sources.pulsar import (ack_entries,
                                                          compact_cursor,
                                                          read_pulsar_dump)

    ppath = corpus.ensure_pulsar_dump(sf_dir)
    assert build("pulsar/in", {"path": ppath}).count() == n_turns
    pstate = str(tmp_path / "pulsar_cursor")
    ack_entries(pstate, read_pulsar_dump(ppath))
    compact_cursor(pstate, ppath)
    assert build("pulsar/in", {"path": ppath,
                               "cursor_state": pstate}).count() == 0

    # solace: telemetry queue dump resolves to the span reader (two
    # spans per turn); a fully settled settled_state empties the re-read
    from splunk_otel_collector_ray.sources.solace import (
        read_solace_dump, settle_spans)

    spath = corpus.ensure_solace_dump(sf_dir)
    assert build("solace/in", {"path": spath}).count() == 2 * n_turns
    sstate = str(tmp_path / "solace_settled")
    settle_spans(sstate, read_solace_dump(spath))
    assert build("solace/in", {"path": spath,
                               "settled_state": sstate}).count() == 0

    # otlp (json + protobuf encodings) over a staged hop
    from splunk_otel_collector_ray.pipelines.two_tier import run_agent_tier

    jdir = str(tmp_path / "otlp_json")
    run_agent_tier(sf_dir, jdir, transport="otlp")
    assert build("otlp/in", {"path": jdir}).count() == n_turns
    pdir = str(tmp_path / "otlp_pb")
    run_agent_tier(sf_dir, pdir, transport="otlp_pb")
    assert build("otlp/in", {"path": pdir,
                             "encoding": "protobuf"}).count() == n_turns


def test_collector_parquet_receiver_filter_pushdown(ray_session):
    """A collector-style parquet receiver's ``filter`` reaches the read as
    a pushed-down row predicate (prune-at-the-read; row groups that fail
    the predicate never leave storage)."""
    from splunk_otel_collector_ray.config import build_pipeline

    doc = {
        "receivers": {"parquet/events": {
            "path": "/root/testdata/sf0.001/events.parquet",
            "columns": ["event_type", "value"],
            "filter": "event_type == 'error'",
        }},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet/events"], "processors": [],
        }}},
    }
    spec = collector_to_spec(doc)
    assert spec["source"]["filter"] == "event_type == 'error'"
    t = build_pipeline(spec).limit(10_000).to_pandas()
    assert set(t.columns) == {"event_type", "value"}
    assert len(t) > 0 and (t["event_type"] == "error").all()


def test_yaml_builds_flagship_and_matches_config_pipeline(
        ray_session, tmp_path, monkeypatch):
    """A YAML-loaded pipeline must produce the same per-sink counts as the
    dict-built config_pipeline (the round-1 oracle-checked query)."""
    from splunk_otel_collector_ray.config import build_pipeline
    from splunk_otel_collector_ray.pipelines.aggregate import grouped_count

    monkeypatch.setenv("GRAFT_YAML_SF", "/root/testdata/sf0.001")
    yml = tmp_path / "pipeline.yaml"
    yml.write_text(textwrap.dedent("""
        receivers:
          filelog/transcripts:
            path: ${env:GRAFT_YAML_SF}
        service:
          pipelines:
            logs:
              receivers: [filelog/transcripts]
              processors: [parse, enrich, route]
    """))
    ds = build_pipeline_from_yaml(str(yml))
    got = grouped_count(ds, ["sink"]).to_pandas().sort_values("sink")

    ref = build_pipeline({
        "source": {"transcripts": "/root/testdata/sf0.001"},
        "stages": [{"type": "parse"}, {"type": "enrich"}, {"type": "route"}],
    })
    exp = grouped_count(ref, ["sink"]).to_pandas().sort_values("sink")
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_converter_chain(tmp_path):
    from splunk_otel_collector_ray.configio import (
        overwrite_properties,
        remove_stages,
    )

    yml = tmp_path / "native.yaml"
    yml.write_text(
        "source:\n  transcripts: /x\n"
        "stages:\n- type: parse\n- type: truncate\n  n: 10\n- type: route\n")
    spec = load_yaml_pipeline(str(yml), converters=[
        overwrite_properties({"stages.1.n": 5, "source.transcripts": "/y"}),
        remove_stages("route"),
    ])
    assert spec["source"]["transcripts"] == "/y"
    assert spec["stages"] == [{"type": "parse"}, {"type": "truncate", "n": 5}]


def test_multi_pipeline_service_chain(ray_session, tmp_path):
    """Agent→gateway service: the gateway pipeline's receiver names the
    agent pipeline's file exporter, so it consumes the staged table; the
    pipelines run in dependency order even when listed consumer-first."""
    import shutil
    import textwrap

    import pyarrow.parquet as pq

    from splunk_otel_collector_ray.configio import run_service_from_yaml

    staging = tmp_path / "staging"
    yml = tmp_path / "service.yaml"
    yml.write_text(textwrap.dedent(f"""
        receivers:
          filelog/transcripts:
            path: /root/testdata/sf0.001
        exporters:
          file/staging:
            path: {staging}
        service:
          pipelines:
            gateway:
              receivers: [file/staging]
              processors: [route]
            agent:
              receivers: [filelog/transcripts]
              processors: [parse, enrich]
              exporters: [file/staging]
    """))
    res = run_service_from_yaml(str(yml))
    assert list(res) == ["agent", "gateway"]   # dependency order
    assert res["gateway"] == 10_000            # every staged row routed
    staged = pq.read_table(sorted(staging.glob("*.parquet"))[0])
    assert "log_format" in staged.column_names  # agent tier parsed
    # rerunning the same service must NOT double-count: the parquet sink
    # clears its staging dir before the producer writes (ADVICE r2)
    res2 = run_service_from_yaml(str(yml))
    assert res2["gateway"] == 10_000
    shutil.rmtree(staging, ignore_errors=True)
    # splice mode: the forward-connector transport hands the producer's
    # lazy Dataset straight to the consumer — same counts, no staging dir
    res3 = run_service_from_yaml(str(yml), splice=True)
    assert res3 == {"agent": "spliced", "gateway": 10_000}
    assert not staging.exists()


def test_kitchen_sink_yaml_equals_dict_built(ray_session, tmp_path):
    """A YAML pipeline chaining parse → OTTL statements → severity filter →
    route → sample must equal the identical dict-built pipeline."""
    import textwrap

    from splunk_otel_collector_ray.config import build_pipeline
    from splunk_otel_collector_ray.pipelines.aggregate import grouped_count

    stages = [
        {"type": "parse"},
        {"type": "transform", "statements": [
            'set(severity_text, "NOTICE") where severity_number == 10']},
        {"type": "filter_severity", "min": 9},
        {"type": "route"},
        {"type": "sample", "pct": 50},
    ]
    yml = tmp_path / "sink.yaml"
    yml.write_text(textwrap.dedent("""
        source:
          transcripts: /root/testdata/sf0.001
        stages:
        - type: parse
        - type: transform
          statements:
          - set(severity_text, "NOTICE") where severity_number == 10
        - type: filter_severity
          min: 9
        - type: route
        - type: sample
          pct: 50
    """))
    got = grouped_count(build_pipeline_from_yaml(str(yml)),
                        ["sink", "severity_text"]).to_pandas()
    exp = grouped_count(build_pipeline(
        {"source": {"transcripts": "/root/testdata/sf0.001"},
         "stages": stages}), ["sink", "severity_text"]).to_pandas()
    key = ["sink", "severity_text"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        exp.sort_values(key).reset_index(drop=True))
    assert (got.severity_text != "INFO2").all()  # statement rewrote INFO2


def test_native_spec_yaml_passthrough(tmp_path):
    yml = tmp_path / "native.yaml"
    yml.write_text("source:\n  transcripts: /x\nstages:\n- type: parse\n")
    spec = load_yaml_pipeline(str(yml))
    assert spec == {"source": {"transcripts": "/x"},
                    "stages": [{"type": "parse"}]}


def test_config_source_registry_custom_provider(tmp_path):
    """r2 VERDICT item 7: the ${env:}/${file:} interpolations generalize to
    a provider registry (source.go:49-81 Retrieve contract) — a custom
    in-memory backend registers and resolves; unknown schemes error with
    the registered list; ':-default' applies when a provider misses."""
    import pytest

    from splunk_otel_collector_ray.configio import (
        interpolate,
        register_config_source,
        unregister_config_source,
    )

    store = {"db/password": "s3cret"}
    register_config_source("vaulttest", lambda sel, env: store.get(sel))
    try:
        doc = {"a": "${vaulttest:db/password}",
               "b": "${vaulttest:missing:-fallback}",
               "c": "${env:HOME:-x}"}
        out = interpolate(doc, {"HOME": "/h"})
        assert out == {"a": "s3cret", "b": "fallback", "c": "/h"}
        with pytest.raises(KeyError, match="resolved nothing"):
            interpolate({"x": "${vaulttest:missing}"}, {})
        with pytest.raises(KeyError, match="unknown config source"):
            interpolate({"x": "${zookeeper:node}"}, {})
    finally:
        unregister_config_source("vaulttest")


def test_dry_run_and_telemetry_migration(tmp_path):
    """r2 VERDICT item 8: dry_run echoes the effective spec without
    building; migrate_telemetry_resource_attributes rewrites legacy flat
    resource keys into the declarative attributes list form."""
    import textwrap

    import yaml

    from splunk_otel_collector_ray.configio import (
        dry_run,
        dry_run_yaml,
        load_yaml_pipeline,
        migrate_telemetry_resource_attributes,
        overwrite_properties,
    )

    yml = tmp_path / "p.yaml"
    yml.write_text(textwrap.dedent("""
        receivers:
          filelog/transcripts:
            path: /root/testdata/sf0.001
        processors:
          truncate:
            n: 10
        service:
          telemetry:
            resource:
              deployment.environment: prod
              schema_url: https://example/schema
          pipelines:
            logs:
              receivers: [filelog/transcripts]
              processors: [truncate]
    """))
    seen: list = []
    spec = load_yaml_pipeline(
        str(yml),
        converters=[overwrite_properties({"stages.0.n": 5}), dry_run(seen)],
        doc_converters=[migrate_telemetry_resource_attributes])
    assert len(seen) == 1 and seen[0] == spec
    assert spec["stages"][0]["n"] == 5      # dry-run saw the converted spec
    echoed = yaml.safe_load(dry_run_yaml(str(yml)))
    assert echoed["stages"][0]["n"] == 10   # unconverted echo
    # document-converter effect
    doc = yaml.safe_load(yml.read_text())
    migrated = migrate_telemetry_resource_attributes(doc)
    res = migrated["service"]["telemetry"]["resource"]
    assert res["attributes"] == [
        {"name": "deployment.environment", "value": "prod"}]
    assert res["schema_url"] == "https://example/schema"
    # idempotent: already-declarative form passes through untouched
    assert migrate_telemetry_resource_attributes(migrated) == migrated


def test_store_backed_config_source(tmp_path):
    """make_store_source: the offline vault/zookeeper analogue — selector
    is a dotted path into a YAML document backend (file, re-read per
    resolve, or dict)."""
    from splunk_otel_collector_ray.configio import (
        interpolate,
        make_store_source,
        register_config_source,
        unregister_config_source,
    )

    f = tmp_path / "secret.yaml"
    f.write_text("data:\n  token: s3cr3t\n  port: 8088\nflat: v\n")
    register_config_source("vault", make_store_source(str(f)))
    try:
        out = interpolate({"a": "${vault:data.token}",
                           "b": "${vault:data.port}",
                           "c": "${vault:flat}",
                           "d": "${vault:data.missing:-dflt}"}, {})
        assert out == {"a": "s3cr3t", "b": "8088", "c": "v", "d": "dflt"}
        # dict backend + non-leaf selector resolves nothing
        register_config_source("zk", make_store_source({"x": {"y": 1}}))
        assert interpolate({"v": "${zk:x.y}"}, {})["v"] == "1"
        with pytest.raises(KeyError, match="resolved nothing"):
            interpolate({"v": "${zk:x}"}, {})  # maps aren't scalar values
    finally:
        unregister_config_source("vault")
        unregister_config_source("zk")


def test_run_pipeline_refuses_to_clear_non_parquet_dir(ray_session, tmp_path):
    """review fix: the staging-clear guard must refuse a sink dir holding
    non-parquet files instead of recursively deleting user data."""
    from splunk_otel_collector_ray.config import run_pipeline

    sink = tmp_path / "user_data"
    sink.mkdir()
    (sink / "important.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to clear"):
        run_pipeline({
            "source": {"transcripts": "/root/testdata/sf0.001"},
            "stages": [{"type": "parse"}],
            "sink": {"parquet": str(sink)},
        })
    assert (sink / "important.txt").read_text() == "do not delete"


def test_filelog_include_exclude_globs(ray_session, tmp_path):
    """filelog include/exclude file-glob lists prune part files BEFORE the
    read (logs_config_linux.yaml filelog include/exclude arrays)."""
    import textwrap

    from splunk_otel_collector_ray.pipelines.logs import read_transcripts

    full = read_transcripts("/root/testdata/sf0.1").count()
    only0 = read_transcripts("/root/testdata/sf0.1",
                             include=["part-000.parquet"]).count()
    rest = read_transcripts("/root/testdata/sf0.1",
                            exclude=["part-000.parquet"]).count()
    assert 0 < only0 < full and only0 + rest == full
    with pytest.raises(ValueError, match="selected no files"):
        read_transcripts("/root/testdata/sf0.1", include=["nope-*.parquet"])
    # through the YAML surface
    yml = tmp_path / "inc.yaml"
    yml.write_text(textwrap.dedent("""
        receivers:
          filelog/transcripts:
            path: /root/testdata/sf0.1
            include: ["part-000.parquet"]
        service:
          pipelines:
            logs:
              receivers: [filelog/transcripts]
    """))
    assert build_pipeline_from_yaml(str(yml)).count() == only0


def test_disable_excessive_internal_metrics_converter():
    from splunk_otel_collector_ray.configio import (
        _RELABEL_CURRENT, _RELABEL_V1, _RELABEL_V2,
        disable_excessive_internal_metrics)

    custom = [{"source_labels": ["__name__"], "regex": "mine", "action": "keep"}]
    doc = {"receivers": {"prometheus/internal": {"config": {"scrape_configs": [
        {"job_name": "otel-collector",
         "metric_relabel_configs": list(_RELABEL_V1)},
        {"job_name": "otel-agent",
         "metric_relabel_configs": list(_RELABEL_V2)},
        {"job_name": "otel-custom", "metric_relabel_configs": custom},
        {"job_name": "other-job",
         "metric_relabel_configs": list(_RELABEL_V1)},
        {"job_name": "otel-unset"},
    ]}}}}
    out = disable_excessive_internal_metrics(doc)
    scs = out["receivers"]["prometheus/internal"]["config"]["scrape_configs"]
    # V1 and V2 upgrade to current; custom, non-otel jobs, and unset stay
    assert scs[0]["metric_relabel_configs"] == _RELABEL_CURRENT
    assert scs[1]["metric_relabel_configs"] == _RELABEL_CURRENT
    assert scs[2]["metric_relabel_configs"] == custom
    assert scs[3]["metric_relabel_configs"] == _RELABEL_V1
    assert "metric_relabel_configs" not in scs[4]
    # input untouched (deepcopy discipline)
    assert doc["receivers"]["prometheus/internal"]["config"][
        "scrape_configs"][0]["metric_relabel_configs"] == _RELABEL_V1


def test_remove_opamp_extension_gate():
    from splunk_otel_collector_ray.configio import (
        OPAMP_EXTENSION, remove_opamp_extension)

    doc = {"service": {"extensions": [OPAMP_EXTENSION, "health_check"],
                       "pipelines": {}}}
    # gate enabled → untouched (same object back)
    assert remove_opamp_extension(True)(doc) is doc
    # gate disabled → opamp removed, others kept, original intact
    out = remove_opamp_extension(False)(doc)
    assert out["service"]["extensions"] == ["health_check"]
    assert doc["service"]["extensions"] == [OPAMP_EXTENSION, "health_check"]
    # absent extension → no-op
    doc2 = {"service": {"extensions": ["health_check"]}}
    assert remove_opamp_extension(False)(doc2) is doc2


def test_config_d_layering(tmp_path):
    import yaml

    from splunk_otel_collector_ray.configio import (
        load_config_dir, merge_config_dir)

    d = tmp_path / "config.d"
    (d / "receivers").mkdir(parents=True)
    (d / "processors").mkdir()
    (d / "receivers" / "a_first.yaml").write_text(yaml.safe_dump(
        {"transcripts": {"path": "/tmp/x"}}))
    (d / "receivers" / "b_second.yaml").write_text(yaml.safe_dump(
        {"transcripts": {"path": "/tmp/override"}, "filelog/raw": {
            "path": "/var/log"}}))
    (d / "processors" / "sev.yml").write_text(yaml.safe_dump(
        {"filter/sev": {"min_severity": 9}}))
    (d / "service.yaml").write_text(yaml.safe_dump(
        {"pipelines": {"logs": {"receivers": ["transcripts"],
                                "processors": ["filter/sev"],
                                "exporters": []}}}))

    frag = load_config_dir(str(d))
    # sorted-order merge: b_second overrides a_first per component id
    assert frag["receivers"]["transcripts"] == {"path": "/tmp/override"}
    assert "filelog/raw" in frag["receivers"]
    assert frag["processors"]["filter/sev"] == {"min_severity": 9}
    assert frag["service"]["pipelines"]["logs"]["processors"] == ["filter/sev"]

    base = {"receivers": {"transcripts": {"path": "/tmp/base"},
                          "keepme": {"path": "/k"}},
            "service": {"extensions": ["health_check"]}}
    merged = merge_config_dir(base, str(d))
    assert merged["receivers"]["transcripts"] == {"path": "/tmp/override"}
    assert merged["receivers"]["keepme"] == {"path": "/k"}  # base preserved
    assert merged["service"]["extensions"] == ["health_check"]
    assert "pipelines" in merged["service"]
    # base untouched
    assert base["receivers"]["transcripts"] == {"path": "/tmp/base"}


def test_include_config_source_templates(tmp_path):
    import yaml

    from splunk_otel_collector_ray.configio import interpolate

    tpl = tmp_path / "component_template"
    tpl.write_text("logs_path: {{ .glob_pattern }}\nfmt: {{ .format }}\n")
    plain = tmp_path / "plain"
    plain.write_text("just-text")
    doc = yaml.safe_load(
        "a: ${include:%s?glob_pattern=/var/**/*.log&format=json}\n"
        "b: ${include:%s}\n"
        "c: ${include:%s/missing:-fallback}\n"
        % (tpl, plain, tmp_path))
    cfg = interpolate(doc)
    assert cfg["a"] == "logs_path: /var/**/*.log\nfmt: json"
    assert cfg["b"] == "just-text"
    assert cfg["c"] == "fallback"


def test_run_service_cli_dry_run(tmp_path):
    """The CLI's --dry-run echoes the resolved config (with --set applied)
    WITHOUT starting Ray — pure subprocess, no session conflict."""
    import json
    import subprocess
    import sys

    import yaml

    yml = tmp_path / "svc.yaml"
    yml.write_text(
        "receivers:\n  filelog/t:\n    path: /root/testdata/sf0.001\n"
        "exporters:\n  file/s:\n    path: /tmp/x\n"
        "service:\n  pipelines:\n    agent:\n"
        "      receivers: [filelog/t]\n      processors: [parse]\n"
        "      exporters: [file/s]\n")
    out = subprocess.run(
        [sys.executable, "scripts/run_service.py", "--config", str(yml),
         "--dry-run", "--set", "exporters.file/s.path=/tmp/y"],
        capture_output=True, text=True, check=True, cwd="/root/repo").stdout
    doc = yaml.safe_load(out)
    assert doc["exporters"]["file/s"]["path"] == "/tmp/y"
    assert "agent" in doc["service"]["pipelines"]


def test_interpolation_selector_with_colons(tmp_path):
    """Colon-bearing selectors (URLs, store paths) interpolate instead of
    silently passing through; the FIRST ':-' still starts the default."""
    from splunk_otel_collector_ray.configio import (interpolate,
                                                    register_config_source)

    register_config_source("echo2", lambda sel, env: f"<{sel}>")
    assert interpolate("${echo2:http://host:8080/x}") == "<http://host:8080/x>"
    assert interpolate("${echo2:a:b:c:-dflt}") == "<a:b:c>"
    register_config_source("never", lambda sel, env: None)
    assert interpolate("${never:u:v:-dflt}") == "dflt"


def test_sink_overlapping_source_refused(ray_session, tmp_path):
    """A parquet sink pointed at (or inside) the pipeline's own source is
    refused BEFORE anything is cleared — the lazy read would otherwise
    consume a directory the sink just destroyed."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from splunk_otel_collector_ray.config import run_pipeline

    src = tmp_path / "data"
    src.mkdir()
    pq.write_table(pa.table({"a": [1, 2]}), src / "part-0.parquet")
    for sink in (src, src / "nested"):
        with _pt.raises(ValueError, match="overlaps source"):
            run_pipeline({"source": {"parquet": str(src)},
                          "sink": {"parquet": str(sink)}})
    assert (src / "part-0.parquet").exists()  # nothing was deleted


def test_fan_in_two_producers_merge(ray_session, tmp_path):
    """Two pipelines exporting to ONE file-exporter path fan IN: the
    consumer sees both producers' rows — staged mode must not let the
    second producer's clear delete the first's output, splice mode must
    union rather than clobber, and a consumer whose receiver matches by
    PATH (different component name) still orders after its producers."""
    import textwrap

    from splunk_otel_collector_ray.configio import run_service_from_yaml

    staging = tmp_path / "stage"
    yml = tmp_path / "svc.yaml"
    yml.write_text(textwrap.dedent(f"""
        receivers:
          filelog/a:
            path: /root/testdata/sf0.001
          filelog/b:
            path: /root/testdata/sf0.001
          file/in:
            path: {staging}
        exporters:
          file/stage:
            path: {staging}
        service:
          pipelines:
            consumer:
              receivers: [file/in]
              processors: [route]
            prod_a:
              receivers: [filelog/a]
              processors: [parse, enrich]
              exporters: [file/stage]
            prod_b:
              receivers: [filelog/b]
              processors: [parse, enrich]
              exporters: [file/stage]
    """))
    res = run_service_from_yaml(str(yml))
    assert list(res).index("consumer") == 2   # path-matched deps order it last
    assert res["consumer"] == 20_000          # both producers' rows
    res2 = run_service_from_yaml(str(yml), splice=True)
    assert res2["prod_a"] == res2["prod_b"] == "spliced"
    assert res2["consumer"] == 20_000


def test_splice_applies_consumer_filter_and_columns(ray_session, tmp_path):
    """splice=True must apply the consumer receiver's pushed-down filter
    and column pruning — otherwise spliced and staged runs of the same
    YAML diverge."""
    import textwrap

    from splunk_otel_collector_ray.configio import run_service_from_yaml

    staging = tmp_path / "stage"
    yml = tmp_path / "svc.yaml"
    yml.write_text(textwrap.dedent(f"""
        receivers:
          filelog/in:
            path: /root/testdata/sf0.001
          file/stage:
            path: {staging}
            filter: "severity_number >= 13"
            columns: [conv_id, severity_number]
        exporters:
          file/stage:
            path: {staging}
        service:
          pipelines:
            consumer:
              receivers: [file/stage]
            producer:
              receivers: [filelog/in]
              processors: [parse]
              exporters: [file/stage]
    """))
    staged = run_service_from_yaml(str(yml))
    spliced = run_service_from_yaml(str(yml), splice=True)
    assert staged["consumer"] == spliced["consumer"] > 0
    assert spliced["consumer"] < 10_000  # the filter actually dropped rows


def test_sinkwriter_refuses_null_sink(tmp_path):
    """Rows with a null sink fail LOUDLY instead of silently vanishing
    from both the export and the counts."""
    import pyarrow as pa
    import pytest as _pt

    from splunk_otel_collector_ray.stages.export import SinkWriter

    w = SinkWriter(str(tmp_path))
    batch = pa.table({
        "conv_id": ["c1", "c2"], "turn_idx": [0, 1],
        "sink": pa.array(["s1", None]),
        "severity_text": ["INFO", "WARN"], "tool": ["", ""]})
    with _pt.raises(ValueError, match="null 'sink'"):
        w(batch)
