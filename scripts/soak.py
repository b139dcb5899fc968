"""Large-scale soak: flagship pipeline at big corpus sizes with memory
evidence (r4 VERDICT item 6 protocol, extended r5).

Runs the full flagship (parse→enrich→route→per-sink export→aggregate) at
one or more scale names, best-of-N each, in ONE Ray session (worker pool
and page cache warm after the first pass), and reports per scale:

  - wall seconds (best-of) + turns/s
  - raylet object-store spill/restore line counts from the session logs
    (the "would this hold on a real cluster" signal — zero spill means the
    streaming executor never exceeded the store at this data:memory ratio)
  - peak object-store usage as reported by ray._private.internal_api

Usage: python scripts/soak.py [sf6.4 sf12.8 ...]   (default: sf6.4 sf12.8)
Corpora are generated on first use under /tmp/graft_fixtures (sf12.8 is
128M turns, ~14 GB on disk — generation is single-process numpy and takes
minutes; the soak itself is the timed part).

Record the JSON line in SCALE.md.
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def spill_lines() -> int:
    """Count spill/restore events in the CURRENT ray session's logs."""
    n = 0
    for f in glob.glob("/tmp/ray/session_latest/logs/raylet.out"):
        with open(f, errors="replace") as fh:
            for line in fh:
                if "Spilled" in line or "Restored" in line:
                    n += 1
    return n


def main() -> None:
    scales = sys.argv[1:] or ["sf6.4", "sf12.8"]
    repeat = int(os.environ.get("GRAFT_SOAK_REPEAT", "2"))

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from splunk_otel_collector_ray import corpus
    from splunk_otel_collector_ray.pipelines.logs import run_flagship

    # generate all corpora first so generation never lands inside a timed
    # window, then warm the page cache for each
    for sf in scales:
        t0 = time.time()
        path = corpus.ensure_transcripts(sf)
        print(f"# corpus {sf}: {path} ready in {time.time() - t0:.1f}s",
              file=sys.stderr)
        for f in sorted(os.listdir(path)):
            with open(os.path.join(path, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass

    # warm worker pool (imports) with an untimed tiny run
    shutil.rmtree("/tmp/soak_warm", ignore_errors=True)
    run_flagship("/root/testdata/sf0.001", "/tmp/soak_warm")

    results = {}
    for sf in scales:
        n_turns = corpus.n_turns_for(sf)
        best, counts = float("inf"), None
        spill_before = spill_lines()  # per-scale DELTA, not session total
        for rep in range(repeat):
            out = f"/tmp/soak_out_{sf}"
            shutil.rmtree(out, ignore_errors=True)
            os.sync()
            stats_path = f"/tmp/soak_stats_{sf}.txt"
            os.environ["GRAFT_FLAGSHIP_STATS"] = stats_path + f".r{rep}"
            t0 = time.time()
            r = run_flagship(sf, out)
            wall = time.time() - t0
            if wall < best:  # archive the stats of the BEST (reported) run
                best = wall
                os.replace(stats_path + f".r{rep}", stats_path)
            counts = r["sink_counts"]
            assert r["rows"] == n_turns, (r["rows"], n_turns)
            shutil.rmtree(out, ignore_errors=True)
            if os.path.exists(stats_path + f".r{rep}"):  # non-best repeat
                os.remove(stats_path + f".r{rep}")
        results[sf] = {
            "turns": n_turns,
            "wall_sec": round(best, 2),
            "turns_per_sec": round(n_turns / best, 1),
            "spill_log_lines": spill_lines() - spill_before,
            "stats_file": f"/tmp/soak_stats_{sf}.txt",
            "sink_counts": counts,
        }
        print(f"# {sf}: {best:.2f}s  {n_turns / best / 1e6:.3f}M turns/s  "
              f"spill_lines={results[sf]['spill_log_lines']}", file=sys.stderr)

    # memory evidence: configured store size + the raylet's own usage lines
    # (grpc isn't installed in this container, so internal_api.memory_summary
    # is unavailable; the raylet debug dump carries the same numbers)
    store_bytes = int(ray.cluster_resources().get("object_store_memory", 0))
    usage = []
    for f in glob.glob("/tmp/ray/session_latest/logs/debug_state.txt"):
        with open(f, errors="replace") as fh:
            usage = [ln.strip() for ln in fh
                     if "Plasma memory usage" in ln or "num bytes" in ln][:4]
    print(json.dumps({"metric": "flagship soak", "unit": "sec",
                      "num_cpus": int(ray.cluster_resources()["CPU"]),
                      "object_store_gb": round(store_bytes / 2**30, 1),
                      "scales": results, "store_usage": usage}))
    ray.shutdown()


if __name__ == "__main__":
    main()
