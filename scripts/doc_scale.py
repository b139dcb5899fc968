"""Scale check for the document-stream training-data ops.

Synthesizes a deterministic large documents table under /tmp (vocab word
soup + planted duplicate spans, seeded numpy — same shape as
/root/testdata documents, ~200× sf0.1 by default), then times
`substring_dedup` and `dsir_vocab`+`dsir_weights` end-to-end at 32 CPUs
and reports wall seconds, rows, and raylet spill-line counts.

Usage: python scripts/doc_scale.py [n_docs]     (default 1_000_000)
Record the JSON line in SCALE.md.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# 10k-word vocabulary: random 5-grams then almost never repeat by chance
# (a 30-word soup makes ~20% of windows birthday-collide, which times the
# string-confirm pass against duplication density no real corpus has);
# the planted spans carry the duplicate signal instead
VOCAB = [f"w{i}" for i in range(10_000)]


def spill_lines() -> int:
    n = 0
    for f in glob.glob("/tmp/ray/session_latest/logs/raylet.out"):
        with open(f, errors="replace") as fh:
            for line in fh:
                if "Spilled" in line or "Restored" in line:
                    n += 1
    return n


def ensure_corpus(n_docs: int) -> str:
    """Deterministic word-soup documents with ~1% planted duplicate
    5-token spans (the substring-dedup exercise target), written as
    partitioned parquet so the read parallelizes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"/tmp/graft_doc_scale/docs_{n_docs}"
    n_parts = (n_docs + 100_000 - 1) // 100_000
    # a killed generation must not be reused as a smaller corpus under
    # the full n_docs label — require the exact part count, and build
    # into a temp dir renamed atomically at the end
    if len(glob.glob(os.path.join(out, "*.parquet"))) == n_parts:
        return out
    import shutil

    tmp = out + ".tmp"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    rng = np.random.default_rng(42)
    chunk = 100_000
    span = "alpha beta gamma delta epsilon"  # planted duplicated span
    vocab = np.array(VOCAB, dtype=object)
    for part, lo in enumerate(range(0, n_docs, chunk)):
        n = min(chunk, n_docs - lo)
        lens = rng.integers(60, 180, n)
        total = int(lens.sum())
        toks = vocab[rng.integers(0, len(vocab), total)]
        off = np.cumsum(lens) - lens
        texts = [" ".join(toks[o:o + l]) for o, l in zip(off, lens)]
        dup = rng.random(n) < 0.01
        for i in np.flatnonzero(dup):
            texts[i] = texts[i] + " " + span
        langs = np.where(rng.random(n) < 0.8, "en", "de")
        t = pa.table({
            "doc_id": pa.array(np.arange(lo, lo + n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.astype(object), type=pa.string()),
        })
        pq.write_table(t, os.path.join(tmp, f"part-{part:04d}.parquet"))
    os.rename(tmp, out)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from splunk_otel_collector_ray.stages.dedup import substring_dedup
    from splunk_otel_collector_ray.stages.text_analysis import (
        dsir_vocab, dsir_weights)

    path = ensure_corpus(n_docs)
    ds = ray.data.read_parquet(path)
    # warm the worker pool + page cache (untimed)
    ds.count()

    t0 = time.monotonic()
    sub_rows = substring_dedup(ds, k=5).count()
    t_sub = time.monotonic() - t0

    t0 = time.monotonic()
    vocab = dsir_vocab(ds, target_lang="en")
    dsir_rows = dsir_weights(ds, vocab).count()
    t_dsir = time.monotonic() - t0

    from splunk_otel_collector_ray.stages.sample import temperature_sample

    t0 = time.monotonic()
    flat_rows = substring_dedup(
        temperature_sample(ds, source_col="lang"), k=5).count()
    t_cur = time.monotonic() - t0

    print(json.dumps({
        "metric": "doc-op scale check", "n_docs": n_docs,
        "substring_dedup_sec": round(t_sub, 2), "substring_rows": sub_rows,
        "dsir_sec": round(t_dsir, 2), "dsir_rows": dsir_rows,
        "curation_sec": round(t_cur, 2), "curation_rows": flat_rows,
        "vocab_size": len(vocab), "spill_lines": spill_lines(),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32"))}))
    ray.shutdown()


if __name__ == "__main__":
    main()
