"""Explicit partitioning & skew strategy — the 100 TB design knobs.

North-rule requirements made concrete:

- ONE partitioning key reused across stages: ``conv_id`` (numeric-suffix hash
  bucket). Recombine, span durations, sessionization and ordered export all
  co-locate on it (`hash(conv) % B` buckets — the loadbalancing exporter's
  consistent-hash routing key analogue, components.go:306).
- Pre-aggregation everywhere: every grouped aggregate in
  ``pipelines/aggregate`` emits per-batch partials, so a hot key contributes
  at most one row per batch to the shuffle — count-like aggregates are
  skew-immune by construction.
- For grouped ops that need the ROWS co-located (stitching, per-group
  pandas), hot keys are detected in a cheap first pass (two-pass plan,
  SURVEY.md §7.5) and split into salted sub-groups when the operation
  tolerates it; order-dependent stitches keep a conversation whole —
  the bucket size bound is then `max conv length`, which the corpus keeps
  ≪ block size.

This module provides the reusable pieces: hot-key detection (tiny partial
counts), salted bucket assignment, and a bounded-bucket assertion helper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def key_counts(ds: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    """Per-key row counts via per-batch partials (shuffles ≤ one row per key
    per batch — skew-safe)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "n"])

    return ds.map_batches(partial, batch_format="pyarrow").groupby(key).aggregate(
        Sum("n", alias_name="n"))


def detect_hot_keys(ds: "ray.data.Dataset", key: str,
                    threshold_rows: int) -> set:
    """Keys owning more than ``threshold_rows`` rows (driver-side small set —
    by definition there can be at most total_rows/threshold of them)."""
    pdf = key_counts(ds, key).to_pandas()
    return set(pdf.loc[pdf["n"] > threshold_rows, key])


def salted_bucket(keys: np.ndarray, sub_id: np.ndarray, hot: set,
                  num_buckets: int, salt: int = 8) -> np.ndarray:
    """Bucket assignment: ``hash(key) % B`` normally; hot keys spread over
    ``salt`` sub-buckets by ``sub_id`` (e.g. turn_idx // chunk) — use ONLY
    for operations whose per-group logic is mergeable across sub-groups."""
    # uint64 + int64 silently promotes to float64 in numpy — keep int64
    h = (pd.util.hash_array(np.asarray(keys, dtype=object)) % (1 << 62)
         ).astype(np.int64)
    bucket = h % num_buckets
    if hot:
        is_hot = np.fromiter((k in hot for k in keys), dtype=bool,
                             count=len(keys))
        sub = np.asarray(sub_id, dtype=np.int64)[is_hot] % salt
        bucket[is_hot] = (h[is_hot] + sub) % num_buckets
    return bucket.astype(np.int32)
