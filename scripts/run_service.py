"""`otelcol --config` analogue: run a collector-style YAML service on Ray.

    python scripts/run_service.py --config service.yaml \
        [--set processors.batch.timeout=5s ...] [--splice] [--dry-run] \
        [--num-cpus N]

Mirrors the reference binary's flag surface (cmd/otelcol/main.go): --config
resolves through the config-source providers (${env:}/${file:}/${include:}),
--set runs the overwrite_properties converter (dot-path upsert), --dry-run
echoes the RESOLVED effective config and exits without executing
(internal/configconverter/dry_run.go), and --splice collapses
transport-only exporter hops into one fused streaming DAG.

Owns its Ray session (library code never calls ray.init — CLAUDE.md rule).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="service YAML path")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="dot-path property overwrite (repeatable)")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the resolved effective config and exit")
    ap.add_argument("--splice", action="store_true",
                    help="fuse transport-only exporter hops in-process")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from splunk_otel_collector_ray import configio

    props = {}
    for kv in getattr(args, "set"):
        k, _, v = kv.partition("=")
        if not _ :
            ap.error(f"--set expects key=value, got {kv!r}")
        props[k] = v
    converters = [configio.overwrite_properties(props)] if props else []

    if args.dry_run:
        # generic dry-run: resolve providers, apply converters, echo the
        # effective document (dry_run.go Convert's yaml.Marshal + exit) —
        # works for multi-pipeline services, unlike the single-pipeline
        # configio.dry_run_yaml helper
        import yaml

        doc = configio.interpolate(yaml.safe_load(open(args.config)), None)
        for conv in converters:
            doc = conv(doc)
        print(yaml.safe_dump(doc, sort_keys=False).rstrip())
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        if converters:
            import tempfile

            import yaml

            doc = configio.interpolate(
                yaml.safe_load(open(args.config)), None)
            for conv in converters:
                doc = conv(doc)
            with tempfile.NamedTemporaryFile(
                    "w", suffix=".yaml", delete=False) as f:
                yaml.safe_dump(doc, f)
                path = f.name
        else:
            path = args.config
        results = configio.run_service_from_yaml(path, splice=args.splice)
        print(json.dumps({k: (v if isinstance(v, (int, str)) else str(v))
                          for k, v in results.items()}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
