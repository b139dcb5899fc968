"""Summarize the lineage manifests of a resumable run — the self-telemetry
roll-up (receiver obsreport / batch-processor counters analogue, SURVEY §2.7).

Usage: python scripts/lineage_report.py <out_dir>
Prints one JSON object: partitions, total rows, per-sink and per-severity
totals, and any partitions missing a manifest (incomplete).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splunk_otel_collector_ray.state import manifest as mf  # noqa: E402


def report(out_dir: str) -> dict:
    parts = sorted(d for d in os.listdir(out_dir)
                   if d.startswith("part=") and
                   os.path.isdir(os.path.join(out_dir, d)))
    sinks: dict[str, int] = {}
    sevs: dict[str, int] = {}
    rows = 0
    complete, incomplete = [], []
    for d in parts:
        m = mf.read_manifest(os.path.join(out_dir, d))
        if not m:
            incomplete.append(d)
            continue
        complete.append(d)
        rows += m.get("rows", 0)
        for k, v in m.get("sink_counts", {}).items():
            sinks[k] = sinks.get(k, 0) + v
        for k, v in m.get("severity_counts", {}).items():
            sevs[k] = sevs.get(k, 0) + v
    return {
        "out_dir": out_dir,
        "partitions_complete": len(complete),
        "partitions_incomplete": incomplete,
        "rows": rows,
        "sink_counts": dict(sorted(sinks.items())),
        "severity_counts": dict(sorted(sevs.items())),
    }


if __name__ == "__main__":
    print(json.dumps(report(sys.argv[1]), indent=1))
