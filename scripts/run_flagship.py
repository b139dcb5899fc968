"""Job entrypoint for the flagship pipeline — the `ray job submit` target.

On a real cluster:
    ray job submit --working-dir . -- python scripts/run_flagship.py \
        --sf-dir /data/transcripts --out /data/out --resumable

In this sandbox Ray runs in local mode (no dashboard/job server), so the
script starts its own local session; submitted as a job it would skip
ray.init because RAY_ADDRESS is provided by the job runtime.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="testdata scale dir or a dir of part-*.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resumable", action="store_true",
                    help="per-partition manifests + skip completed")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from splunk_otel_collector_ray.pipelines.logs import (
        run_flagship,
        run_resumable,
    )

    if args.resumable:
        out = run_resumable(args.sf_dir, args.out)
        summary = {"skipped": out["skipped"],
                   "processed": {k: v["rows"] for k, v in out["processed"].items()},
                   "out_dir": out["out_dir"]}
    else:
        summary = run_flagship(args.sf_dir, args.out)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
