"""Sampling processors — probabilistic (hash-based) and tail (group decision).

Reference semantics:
- `probabilistic_sampler` — hash-based record sampling at a percentage
  (/root/reference/internal/components/components.go:330). We make it fully
  deterministic (a Knuth multiplicative hash of the record key) so reruns and
  the DuckDB oracle agree — same spirit as the collector hashing trace ids.
- `tail_sampling` — buffer a whole trace, then a policy decides keep/drop
  (components.go:335). Transcript analogue: the unit is a CONVERSATION; policy
  "keep the conversation if any turn matches" = a grouped decision.

Scale note: tail sampling is the one sampler that needs a shuffle (group by
conv_id). The grouped decision is a per-group boolean, so we pre-reduce inside
map_batches (per-batch per-conv any-match partials) and shuffle only the tiny
(conv_id, flag) pairs, then broadcast the kept-set back as a filter —
a semi-join via broadcast, not a full-row shuffle (ray_guide: semi/anti join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

KNUTH = 2654435761


def sample_mask(conv_seq: np.ndarray, turn_idx: np.ndarray, pct: int) -> np.ndarray:
    """Deterministic keep-mask: (conv*KNUTH + turn*97) % 100 < pct."""
    h = (conv_seq * KNUTH + turn_idx.astype(np.int64) * 97) % 100
    return h < pct


def probabilistic_sample(ds: "ray.data.Dataset", pct: int) -> "ray.data.Dataset":
    """Keep ~pct% of records, deterministically, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pandas().str.slice(5).astype(np.int64).to_numpy()
        turn = batch["turn_idx"].to_pandas().to_numpy()
        return batch.filter(pa.array(sample_mask(conv, turn, pct)))

    return ds.map_batches(fn, batch_format="pyarrow")


def tail_sample_conversations(
    ds: "ray.data.Dataset", flag_fn, key: str = "conv_id"
) -> "ray.data.Dataset":
    """Keep every turn of conversations where ``flag_fn(batch) -> bool mask``
    matches at least one turn. Two passes over the (lazy) dataset:

    1. per-batch partial: distinct keys with a match (tiny) → driver set
    2. broadcast the kept-key set; filter with an isin mask (no row shuffle)
    """

    def partial(batch: pa.Table) -> pa.Table:
        m = np.asarray(flag_fn(batch))
        keys = pd.unique(batch[key].to_pandas()[m])
        return pa.table({key: pa.array(keys, type=pa.string())})

    kept = set(
        ds.map_batches(partial, batch_format="pyarrow")
        .unique(key)  # dedup partials; result is small (one row per kept conv)
    )
    kept_ref = ray.put(kept)

    class Filter:
        def __init__(self) -> None:
            self.kept = ray.get(kept_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = batch[key].to_pandas().isin(self.kept).to_numpy()
            return batch.filter(pa.array(mask))

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 8))
