"""YAML config loading + config-source interpolation (confmap layer).

The reference resolves collector YAML through a provider/configsource chain
before building pipelines: ``${env:VAR}`` values come from the envvar config
source, ``${include:path}`` splices file contents, and the service section
wires named receivers → processors → exporters into pipelines
(citations into /root/reference):

- ConfigSource retrieve-by-selector contract: internal/configsource/source.go:45-81
- env/include providers: internal/configsource/{envvar,include}configsource/
- wiring into the command: cmd/otelcol/main.go:102-116
- collector-style pipeline shape: cmd/otelcol/config/collector/agent_config.yaml:221-264

This module gives the Ray engine that surface: ``load_yaml_pipeline`` reads a
YAML file (either the native spec schema of config.build_pipeline, or a
collector-style document with receivers/processors/exporters + service
section), resolves ``${env:VAR}`` / ``${env:VAR:-default}`` / ``${file:path}``
interpolations recursively, and hands the resolved spec to build_pipeline.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from typing import Any

# Selector is lazy `[^}]+?` (not `[^}:]+`) so colon-bearing selectors —
# URLs, store paths — interpolate instead of silently passing through as
# literal text; the FIRST ':-' still starts the default.
_INTERP_RX = re.compile(r"\$\{(\w+):([^}]+?)(?::-([^}]*))?\}")

# --- pluggable config-source registry (r2 VERDICT item 7) -------------------
# The reference's ConfigSource surface is a factory registry keyed by source
# type with a Retrieve(selector, params) contract (source.go:49-81); besides
# env/include it ships vault/etcd2/zookeeper/splunksecret backends. A
# provider here is ``fn(selector, env) -> str | None``; returning None falls
# back to the interpolation's ':-default' (missing default = error).

ConfigSourceFn = Callable[[str, Any], "str | None"]
_CONFIG_SOURCES: dict[str, ConfigSourceFn] = {}


def register_config_source(name: str, fn: ConfigSourceFn | None = None):
    """Register a named config-source provider (decorator or direct call).
    Custom backends (a vault/zookeeper analogue, an in-memory test source)
    plug in here and become ``${name:selector}`` interpolations."""

    def add(f: ConfigSourceFn) -> ConfigSourceFn:
        _CONFIG_SOURCES[name] = f
        return f

    return add(fn) if fn is not None else add


def unregister_config_source(name: str) -> None:
    _CONFIG_SOURCES.pop(name, None)


@register_config_source("env")
def _env_source(selector: str, env) -> "str | None":
    """envvarconfigsource: process environment lookup."""
    return env.get(selector)


@register_config_source("file")
def _file_source(selector: str, env) -> "str | None":
    """includeconfigsource: splice file contents."""
    if not os.path.exists(selector):
        return None
    with open(selector) as f:
        return f.read().strip()


_TEMPLATE_PARAM_RX = re.compile(r"\{\{\s*\.(\w+)\s*\}\}")


@register_config_source("include")
def _include_source(selector: str, env) -> "str | None":
    """includeconfigsource with template parameters (include
    source.go:44-61; testdata/param_template): the file is a Go
    text/template and ``{{ .param }}`` placeholders substitute from the
    invocation's params. The reference passes params as a YAML map under
    the ``$include:`` key; the interpolation-string analogue here is a
    query suffix — ``${include:path?glob_pattern=/var/**/*.log}``.
    Placeholders with no matching param resolve to '' (text/template's
    missing-key zero value for the default option)."""
    path, _, query = selector.partition("?")
    if not os.path.exists(path):
        return None
    params = dict(p.split("=", 1) for p in query.split("&") if "=" in p)
    with open(path) as f:
        text = f.read().strip()
    return _TEMPLATE_PARAM_RX.sub(
        lambda m: params.get(m.group(1), ""), text)


def make_store_source(backend) -> ConfigSourceFn:
    """Factory for a document-store-backed config source — the offline
    analogue of the vault / zookeeper / etcd2 backends (vault
    source.go:83-118: secret read at a configured path, selector = key
    inside it; zookeeper source.go:48-65: selector = node path).

    ``backend`` is a YAML/JSON file path (re-read per resolve, like the
    pollable upstream sources) or a plain dict; the selector is a
    '.'-separated path into the document. Register under any scheme::

        register_config_source("vault", make_store_source("/run/secret.yaml"))
        # → ${vault:data.token} resolves doc["data"]["token"]
    """

    def provider(selector: str, env) -> "str | None":
        doc = backend
        if isinstance(backend, str):
            if not os.path.exists(backend):
                return None
            import yaml

            with open(backend) as f:
                doc = yaml.safe_load(f)
        node = doc
        for part in selector.split("."):
            if not isinstance(node, dict) or part not in node:
                return None
            node = node[part]
        return None if isinstance(node, (dict, list)) else str(node)

    return provider


def _resolve_str(s: str, env) -> str:
    def repl(m: "re.Match[str]") -> str:
        kind, selector, default = m.groups()
        if kind not in _CONFIG_SOURCES:
            raise KeyError(
                f"unknown config source {kind!r}; registered: "
                f"{sorted(_CONFIG_SOURCES)}")
        v = _CONFIG_SOURCES[kind](selector, env)
        if v is None:
            v = default
        if v is None:
            raise KeyError(
                f"config source {kind}:{selector} resolved nothing and the "
                "interpolation has no ':-default'")
        return v

    return _INTERP_RX.sub(repl, s)


def interpolate(obj: Any, env=None) -> Any:
    """Recursively resolve config-source references in a loaded YAML tree."""
    if env is None:
        env = os.environ
    if isinstance(obj, str):
        return _resolve_str(obj, env)
    if isinstance(obj, dict):
        return {k: interpolate(v, env) for k, v in obj.items()}
    if isinstance(obj, list):
        return [interpolate(v, env) for v in obj]
    return obj


def collector_to_spec(doc: dict) -> dict:
    """Collector-style YAML → native build_pipeline spec.

    A document with a ``service`` section is interpreted the collector way:
    the (single) logs pipeline names its receiver / processors / exporter;
    component configs live under the top-level ``receivers`` / ``processors``
    / ``exporters`` maps; the registry type is the component name up to the
    '/' (factory-key convention, internal/components/components.go:179-364).
    Documents without ``service`` are treated as native specs already.
    """
    if "service" not in doc:
        return doc
    pipelines = doc["service"]["pipelines"]
    if "logs" not in pipelines:
        raise ValueError("collector-style config needs a 'logs' pipeline")
    pipe = pipelines["logs"]

    recv_name = pipe["receivers"][0]
    recv_cfg = (doc.get("receivers") or {}).get(recv_name) or {}
    recv_type = recv_name.split("/")[0]
    if recv_type in ("filelog", "transcripts"):
        source = {"transcripts": recv_cfg["path"]}
        for k in ("include", "exclude"):  # filelog file-glob lists
            if recv_cfg.get(k):
                source[k] = list(recv_cfg[k])
    elif recv_type == "kafka":
        # kafka receiver: topic-dump dir + optional consumer-group offsets
        # state file (the group_id's committed marks)
        source = {"kafka_dump": recv_cfg["path"]}
        if recv_cfg.get("offsets_state"):
            source["committed"] = recv_cfg["offsets_state"]
    elif recv_type == "azureeventhub":
        # event hub receiver: Capture dump dir + optional checkpoint-store
        # state file (per-partition sequence marks)
        source = {"eventhub_capture": recv_cfg["path"]}
        if recv_cfg.get("checkpoint_state"):
            source["checkpoint"] = recv_cfg["checkpoint_state"]
    elif recv_type == "pulsar":
        # pulsar receiver: partition dump dir + optional subscription
        # cursor state dir (hybrid markDelete/individual resume)
        source = {"pulsar_dump": recv_cfg["path"]}
        if recv_cfg.get("cursor_state"):
            source["cursor"] = recv_cfg["cursor_state"]
    elif recv_type == "solace":
        # solace receiver: telemetry queue dump dir + optional settled-
        # message state dir (settlement/redelivery resume)
        source = {"solace_dump": recv_cfg["path"]}
        if recv_cfg.get("settled_state"):
            source["settled"] = recv_cfg["settled_state"]
    elif recv_type in ("k8s_cluster", "k8scluster"):
        # k8s_cluster receiver analogue: object-state snapshot dir →
        # pod/container/deployment/node gauges (components.go:238)
        source = {"k8s_dump": recv_cfg["path"]}
    elif recv_type in ("kubelet_stats", "kubeletstats"):
        # kubelet_stats receiver analogue: /stats/summary capture dir →
        # node/pod/container datapoints (components.go:243)
        source = {"kubelet_dump": recv_cfg["path"]}
    elif recv_type in ("docker_stats", "docker-container-stats"):
        # smartagent docker monitor analogue: stats-API capture dir →
        # the basic datapoint set (conversion.go's always-on metrics)
        source = {"docker_dump": recv_cfg["path"]}
    elif recv_type in ("hostmetrics", "host_metrics"):
        # hostmetrics receiver: /proc snapshot capture dir + the enabled
        # scrapers: map (full_config_linux.yaml:104-120; keys only, like
        # the collector's scrapers: {cpu:, memory:, ...})
        source = {"proc_dump": recv_cfg["path"]}
        if recv_cfg.get("scrapers"):
            source["scrapers"] = sorted(recv_cfg["scrapers"])
    elif recv_type == "splunk_hec":
        source = {"hec_jsonl": recv_cfg["path"]}
    elif recv_type == "otlp":
        source = {"otlp": recv_cfg["path"],
                  "encoding": recv_cfg.get("encoding", "json")}
    else:
        source = {"parquet": recv_cfg["path"],
                  "columns": recv_cfg.get("columns")}
        if recv_cfg.get("filter"):  # predicate pushdown reaches the read
            source["filter"] = recv_cfg["filter"]

    stages = []
    for pname in pipe.get("processors", []):
        cfg = dict((doc.get("processors") or {}).get(pname) or {})
        cfg["type"] = pname.split("/")[0]
        stages.append(cfg)

    spec: dict = {"source": source, "stages": stages}
    exporters = pipe.get("exporters") or []
    if exporters:
        exp_cfg = (doc.get("exporters") or {}).get(exporters[0]) or {}
        if exporters[0].split("/")[0] == "file" and "path" in exp_cfg:
            spec["sink"] = {"parquet": exp_cfg["path"],
                            "partition_cols": exp_cfg.get("partition_cols")}
    return spec


# --- confmap converters (programmatic config rewrites before build) --------
# The reference runs a converter chain over the resolved confmap before the
# service starts (internal/configconverter/, wired cmd/otelcol/main.go:102-110)
# — e.g. overwrite_properties.go:37-41 applies --set key=value dot-paths and
# disable_excessive_internal_metrics.go:81-85 prunes config subtrees.

def overwrite_properties(props: dict[str, Any]):
    """Converter factory: ``{"stages.0.n": 5, "source.transcripts": "/x"}``
    dot-paths overwrite spec values (list indices are numeric segments) —
    the --set flag semantics of overwrite_properties.go:37-41."""

    def convert(spec: dict) -> dict:
        import copy

        spec = copy.deepcopy(spec)
        for path, value in props.items():
            parts = path.split(".")
            node = spec
            for p in parts[:-1]:
                node = node[int(p)] if isinstance(node, list) else \
                    node.setdefault(p, {})
            last = parts[-1]
            if isinstance(node, list):
                node[int(last)] = value
            else:
                node[last] = value
        return spec

    return convert


def remove_stages(stage_type: str):
    """Converter factory: drop every stage of a type (the prune-subtree
    shape of disable_excessive_internal_metrics.go:81-85)."""

    def convert(spec: dict) -> dict:
        spec = dict(spec)
        spec["stages"] = [s for s in spec.get("stages", [])
                          if s.get("type") != stage_type]
        return spec

    return convert


def dry_run(sink: list):
    """Converter factory: the --dry-run echo (configconverter/dry_run.go
    NewDryRun/Convert — accrue the resolved config, run it through the
    chain, emit the effective YAML without starting the service). Appends
    the spec AS SEEN AT ITS POSITION IN THE CHAIN to ``sink`` (deep copy)
    and passes it through unchanged; place it last to capture the fully
    converted spec."""

    def convert(spec: dict) -> dict:
        import copy

        sink.append(copy.deepcopy(spec))
        return spec

    return convert


def dry_run_yaml(path: str, env=None, converters=()) -> str:
    """--dry-run surface: resolve + convert the YAML pipeline and return
    the effective spec as a YAML string WITHOUT building any Dataset
    (dry_run.go Convert's yaml.Marshal + exit)."""
    import yaml

    return yaml.safe_dump(load_yaml_pipeline(path, env, converters),
                          sort_keys=True)


def migrate_telemetry_resource_attributes(doc: dict) -> dict:
    """Document converter (runs on the collector-style document BEFORE
    pipeline extraction, the confmap.Converter position): rewrite legacy
    flat keys under ``service.telemetry.resource`` into the declarative
    ``attributes: [{name, value}, …]`` list form, preserving the known
    v0.30 fields (migrate_telemetry_resource_attributes.go:25-110)."""
    valid = {"attributes", "attributes_list", "detectors", "schema_url"}
    resource = (((doc.get("service") or {}).get("telemetry") or {})
                .get("resource"))
    if not isinstance(resource, dict):
        return doc
    attrs = resource.get("attributes")
    if isinstance(attrs, list):  # already declarative
        return doc
    legacy = [k for k in resource if k not in valid]
    if not legacy:
        return doc
    out = {k: v for k, v in resource.items() if k in valid}
    out["attributes"] = [{"name": k, "value": resource[k]}
                         for k in sorted(legacy)]
    import copy

    doc = copy.deepcopy(doc)
    doc["service"]["telemetry"]["resource"] = out
    return doc


# the three metric_relabel_configs generations shipped by the distribution
# (disable_excessive_internal_metrics.go:40-79); V1/V2 are upgraded in place
_RELABEL_V1 = [{"source_labels": ["__name__"], "regex": ".*grpc_io.*",
                "action": "drop"}]
_RELABEL_V2 = [
    {"source_labels": ["__name__"], "regex": "otelcol_rpc_.*",
     "action": "drop"},
    {"source_labels": ["__name__"], "regex": "otelcol_http_.*",
     "action": "drop"},
    {"source_labels": ["__name__"], "regex": "otelcol_processor_batch_.*",
     "action": "drop"},
]
_RELABEL_CURRENT = [
    {"source_labels": ["__name__"],
     "regex": "promhttp_metric_handler_errors.*", "action": "drop"},
    {"source_labels": ["__name__"], "regex": "otelcol_processor_batch_.*",
     "action": "drop"},
]
_PROM_INTERNAL_RECEIVERS = ("prometheus/internal", "prometheus/agent",
                            "prometheus/k8s_cluster_receiver",
                            "prometheus/collector")


def disable_excessive_internal_metrics(doc: dict) -> dict:
    """Document converter: upgrade the internal-metrics prometheus scrape
    configs' drop lists from the V1/V2 generations to the current one —
    only for ``otel-``-prefixed jobs whose ``metric_relabel_configs``
    exactly equals an old default; anything user-customized is untouched
    (disable_excessive_internal_metrics.go:84-133)."""
    import copy

    receivers = doc.get("receivers")
    if not isinstance(receivers, dict):
        return doc
    doc = copy.deepcopy(doc)
    for rname in _PROM_INTERNAL_RECEIVERS:
        recv = doc.get("receivers", {}).get(rname)
        if not isinstance(recv, dict):
            continue
        scrape = (recv.get("config") or {}).get("scrape_configs")
        if not isinstance(scrape, list):
            continue
        for sc in scrape:
            if not isinstance(sc, dict):
                continue
            job = sc.get("job_name")
            if not isinstance(job, str) or not job.startswith("otel-"):
                continue
            mrcs = sc.get("metric_relabel_configs")
            if mrcs is None:
                continue  # unset stays unset
            if mrcs == _RELABEL_V1 or mrcs == _RELABEL_V2:
                sc["metric_relabel_configs"] = copy.deepcopy(_RELABEL_CURRENT)
    return doc


OPAMP_EXTENSION = "opamp/splunk_o11y"


def remove_opamp_extension(gate_enabled: bool):
    """Document-converter factory: the opamp feature-gate guard — when the
    gate is DISABLED, drop ``opamp/splunk_o11y`` from service.extensions if
    present; when enabled, leave the document alone (opamp.go:39-89)."""
    def convert(doc: dict) -> dict:
        if gate_enabled:
            return doc
        exts = ((doc.get("service") or {}).get("extensions"))
        if not isinstance(exts, list) or OPAMP_EXTENSION not in exts:
            return doc
        import copy

        doc = copy.deepcopy(doc)
        doc["service"]["extensions"] = [
            e for e in exts if e != OPAMP_EXTENSION]
        return doc

    return convert


def service_specs(doc: dict) -> list[tuple[str, dict]]:
    """Collector-style document → ORDERED list of (pipeline name, native
    spec) for a multi-pipeline service.

    The tier-chaining shape of real deployments (agent parse/enrich →
    gateway route/export, agent_config.yaml:221-264 + gateway_config.yaml:
    163-221; two chained collectors in examples/otel-logs-routing/
    otel-collector-config2.yml): a pipeline whose receiver names another
    pipeline's `file` exporter (same component name) consumes that
    pipeline's staged output table — the batch surrogate of the OTLP
    transport. Pipelines are returned in dependency order (producers before
    consumers); independent pipelines keep document order.
    """
    pipelines = doc["service"]["pipelines"]
    # exporter component → staging path (file exporters only)
    exp_paths = {name: cfg.get("path")
                 for name, cfg in (doc.get("exporters") or {}).items()
                 if name.split("/")[0] == "file"}

    # a consumer depends on a producer when its receiver names the
    # producer's exporter COMPONENT, or when its receiver's configured
    # path equals the producer's file-exporter PATH (splice matching is
    # by path, so ordering must be too — a name-only dependency would let
    # a path-matched consumer run before its producer)
    recv_cfgs = doc.get("receivers") or {}

    def _recv_path(recv: str) -> "str | None":
        if recv in exp_paths:
            return exp_paths[recv]
        cfg = recv_cfgs.get(recv)
        return cfg.get("path") if isinstance(cfg, dict) else None

    deps: dict[str, set] = {}
    for pname, pipe in pipelines.items():
        recv = pipe["receivers"][0]
        rpath = _recv_path(recv)
        deps[pname] = {
            other for other, op in pipelines.items() if other != pname
            and (recv in (op.get("exporters") or [])
                 or (rpath is not None and any(
                     exp_paths.get(e) == rpath
                     for e in (op.get("exporters") or []))))
        }

    ordered: list[str] = []
    while len(ordered) < len(pipelines):
        progressed = False
        for pname in pipelines:
            if pname in ordered:
                continue
            if deps[pname] <= set(ordered):
                ordered.append(pname)
                progressed = True
        if not progressed:
            raise ValueError(f"pipeline dependency cycle in {list(pipelines)}")

    out = []
    for pname in ordered:
        pipe = pipelines[pname]
        recv = pipe["receivers"][0]
        sub = {
            "receivers": doc.get("receivers") or {},
            "processors": doc.get("processors") or {},
            "exporters": doc.get("exporters") or {},
            "service": {"pipelines": {"logs": dict(pipe)}},
        }
        if recv in exp_paths and recv not in sub["receivers"]:
            # receiver IS another pipeline's file exporter → read its staging
            if exp_paths[recv] is None:
                raise ValueError(
                    f"file exporter {recv!r} is consumed by pipeline "
                    f"{pname!r} but has no 'path' — the staging transport "
                    "needs one")
            sub["receivers"] = dict(sub["receivers"])
            sub["receivers"][recv] = {"path": exp_paths[recv]}
        out.append((pname, collector_to_spec(sub)))
    return out


def run_service_from_yaml(path: str, env=None, splice: bool = False) -> dict:
    """Execute every pipeline of a collector-style YAML service in
    dependency order (each through config.run_pipeline); returns
    {pipeline name: sink result (row count or output dir)}.

    ``splice=True`` is the TRUE forward-connector transport
    (examples/otel-logs-routing two-collector chain collapsed in-process):
    a producer whose file exporter exists only as transport to another
    pipeline hands its LAZY Dataset straight to the consumer — no staging
    write, no disk round-trip, one fused streaming DAG per chain. The
    producer's entry in the result dict is the string "spliced". Default
    (False) keeps the staged-table shape, the batch surrogate of a real
    two-tier deployment where tiers run on different hosts.
    """
    import yaml

    from .config import build_pipeline, run_pipeline

    with open(path) as f:
        doc = interpolate(yaml.safe_load(f), env)
    spec_list = service_specs(doc)
    results: dict = {}
    if not splice:
        # fan-in: two producers exporting to one path must both land —
        # only the FIRST clears the staging dir, later ones append
        cleared: set[str] = set()
        for pname, spec in spec_list:
            sinkp = (spec.get("sink") or {}).get("parquet")
            results[pname] = run_pipeline(spec,
                                          append=sinkp in cleared)
            if sinkp is not None:
                cleared.add(sinkp)
        return results

    consumer_counts: dict[str, int] = {}
    for _, s in spec_list:
        p = s["source"].get("parquet")
        if p is not None:
            consumer_counts[p] = consumer_counts.get(p, 0) + 1
    staged: dict[str, Any] = {}  # transport path → producer's lazy Dataset
    for pname, spec in spec_list:
        src = spec["source"]
        if src.get("parquet") in staged:
            ds0 = staged[src["parquet"]]
            # the staged-read path applies these AT THE READ; the splice
            # must apply them too or the two modes diverge
            if src.get("columns"):
                ds0 = ds0.select_columns(src["columns"])
            if src.get("filter"):
                from .functions.expr import compile_arrow_filter

                flt = compile_arrow_filter(src["filter"])
                ds0 = ds0.map_batches(lambda t, _f=flt: t.filter(_f),
                                      batch_format="pyarrow")
            spec = dict(spec)
            spec["source"] = {"dataset": ds0}
        sink = spec.get("sink") or {}
        if sink.get("parquet") in consumer_counts:
            ds = build_pipeline(
                {k: v for k, v in spec.items() if k != "sink"})
            key = sink["parquet"]
            if key in staged:  # fan-in: merge producers, don't clobber
                ds = staged[key].union(ds)
            if consumer_counts[key] > 1:
                # >1 consumer would re-execute the producer's whole lazy
                # DAG per consumer — pin the blocks once instead
                ds = ds.materialize()
            staged[key] = ds
            results[pname] = "spliced"
        else:
            results[pname] = run_pipeline(spec)
    return results


def load_yaml_pipeline(path: str, env=None, converters=(),
                       doc_converters=()) -> dict:
    """YAML file → resolved native pipeline spec: interpolations applied,
    DOCUMENT converters run on the collector-style confmap (the
    configconverter position, e.g. migrate_telemetry_resource_attributes),
    the document converted to a native spec, then the SPEC converter chain
    run in order (main.go:102-110 wiring)."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    doc = interpolate(doc, env)
    for conv in doc_converters:
        doc = conv(doc)
    spec = collector_to_spec(doc)
    for conv in converters:
        spec = conv(spec)
    return spec


def build_pipeline_from_yaml(path: str, env=None, converters=()):
    """YAML file → lazy Dataset via config.build_pipeline."""
    from .config import build_pipeline

    return build_pipeline(load_yaml_pipeline(path, env, converters))


# --- config.d directory layering (discovery confmapprovider) ----------------

_CONFIG_D_SECTIONS = ("receivers", "processors", "exporters", "extensions")


def load_config_dir(path: str) -> dict:
    """Read a ``config.d`` layering directory into a collector-style document
    fragment (internal/confmapprovider/discovery/config.go:36-63): component
    fragments live under ``config.d/{receivers,processors,exporters,
    extensions}/*.y(a)ml`` (each file a mapping of component id → config),
    and a root ``service.yaml`` merges into the service section. Files are
    visited in sorted order; later entries override earlier ones per key."""
    import glob
    import os

    import yaml

    doc: dict = {}
    for section in _CONFIG_D_SECTIONS:
        merged: dict = {}
        # ONE sorted order across both extensions (basename-lexicographic),
        # matching the reference's single sorted directory walk — sorting
        # the .yml and .yaml globs separately would let a lexically-earlier
        # .yaml override a later .yml.
        frags = sorted(
            glob.glob(os.path.join(path, section, "*.yml"))
            + glob.glob(os.path.join(path, section, "*.yaml")))
        for f in frags:
            frag = yaml.safe_load(open(f)) or {}
            if not isinstance(frag, dict):
                raise ValueError(f"config.d fragment {f} must be a mapping")
            merged.update(frag)
        if merged:
            doc[section] = merged
    for name in ("service.yaml", "service.yml"):
        f = os.path.join(path, name)
        if os.path.exists(f):
            doc["service"] = yaml.safe_load(open(f)) or {}
            break
    return doc


def merge_config_dir(doc: dict, config_dir: str) -> dict:
    """Layer a config.d directory over a base collector document: per-section
    per-component-id merge, config.d entries winning (the --configd overlay
    position, internal/settings/settings.go:265-267)."""
    import copy

    overlay = load_config_dir(config_dir)
    out = copy.deepcopy(doc)
    for section in _CONFIG_D_SECTIONS:
        if section in overlay:
            base = dict(out.get(section) or {})
            base.update(overlay[section])
            out[section] = base
    if "service" in overlay:
        svc = dict(out.get("service") or {})
        for k, v in overlay["service"].items():
            svc[k] = v
        out["service"] = svc
    return out
