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

from dataclasses import dataclass

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


def stratified_sample(
    ds: "ray.data.Dataset", keys: list[str], k: int, id_col: str,
) -> "ray.data.Dataset":
    """Deterministic per-stratum k-sample: the k rows with the smallest
    ``hash(id)`` per group — the reservoir-sample analogue a training-data
    pipeline needs, rerun-stable and oracle-checkable. Per-batch partial
    top-k (grouped_topk) keeps the shuffle at ≤ k rows per group per batch.
    """
    from ..pipelines.aggregate import grouped_topk

    def add_h(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pandas().to_numpy().astype(np.int64)
        h = (ids * KNUTH) % (1 << 31)
        return t.append_column("_h", pa.array(h))

    out = grouped_topk(
        ds.select_columns([*keys, id_col]).map_batches(
            add_h, batch_format="pyarrow"),
        keys, k, by=["_h", id_col], ascending=[True, True])
    return out.drop_columns(["_h"])


@dataclass
class StringAttributePolicy:
    """Sample if any turn's ``column`` is in ``values`` (string_attribute)."""

    column: str
    values: tuple

    def flag(self, df: pd.DataFrame) -> pd.Series:
        return df[self.column].isin(self.values)


@dataclass
class NumericAttributePolicy:
    """Sample if any turn's ``column`` is within [min, max]
    (numeric_attribute)."""

    column: str
    min_value: float
    max_value: float

    def flag(self, df: pd.DataFrame) -> pd.Series:
        return df[self.column].astype("float64").between(
            self.min_value, self.max_value)


@dataclass
class LatencyPolicy:
    """Sample if the conversation spans ≥ threshold_s seconds (latency
    policy; trace duration analogue). Needs per-conv (min ts, max ts) —
    mergeable partials, no row shuffle."""

    threshold_s: float
    ts_col: str = "observed_ts"


@dataclass
class ProbabilisticPolicy:
    """Sample ``pct`` % of conversations by deterministic id hash."""

    pct: int


class AlwaysPolicy:
    """Unconditional sample (always_sample)."""


def tail_sample_policies(
    ds: "ray.data.Dataset", policies: list, key: str = "conv_id"
) -> "ray.data.Dataset":
    """tail_sampling with a composable POLICY TABLE (components.go:335; the
    upstream processor's policy set) — decision = OR across policies, the
    unit is the whole conversation (trace analogue).

    Scale shape: every scanning policy reduces to mergeable per-conv
    partials inside map_batches (any-match flags, min/max ts), so only one
    tiny row per conversation per batch shuffles; the final keep-set is
    broadcast back as a semi-join filter. (At extreme key cardinality swap
    the broadcast for a keyed semi-join — same partial table.)
    """
    from ray.data.aggregate import Max, Min

    flag_pols = [p for p in policies if hasattr(p, "flag")]
    lat_pols = [p for p in policies if isinstance(p, LatencyPolicy)]
    prob_pols = [p for p in policies if isinstance(p, ProbabilisticPolicy)]
    always = any(isinstance(p, AlwaysPolicy) for p in policies)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        gk = df[key]
        out = pd.DataFrame({key: pd.unique(gk)}).set_index(key)
        for i, p in enumerate(flag_pols):
            out[f"_f{i}"] = p.flag(df).groupby(gk, sort=False).max().astype(
                np.int8)
        for j, p in enumerate(lat_pols):
            out[f"_lmin{j}"] = df[p.ts_col].groupby(gk, sort=False).min()
            out[f"_lmax{j}"] = df[p.ts_col].groupby(gk, sort=False).max()
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    aggs = [Max(f"_f{i}", alias_name=f"_f{i}")
            for i in range(len(flag_pols))]
    for j in range(len(lat_pols)):
        aggs += [Min(f"_lmin{j}", alias_name=f"_lmin{j}"),
                 Max(f"_lmax{j}", alias_name=f"_lmax{j}")]
    reduced = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(key).aggregate(*aggs).to_pandas())

    decision = np.zeros(len(reduced), dtype=bool)
    if always:
        decision |= True
    for i in range(len(flag_pols)):
        decision |= reduced[f"_f{i}"].to_numpy() > 0
    for j, p in enumerate(lat_pols):
        span = (reduced[f"_lmax{j}"] - reduced[f"_lmin{j}"]).dt.total_seconds()
        decision |= span.to_numpy() >= p.threshold_s
    for p in prob_pols:
        seq = reduced[key].str.slice(5).astype(np.int64).to_numpy()
        decision |= (seq * KNUTH) % 100 < p.pct
    kept = set(reduced.loc[decision, key])
    kept_ref = ray.put(kept)

    class Filter:
        def __init__(self) -> None:
            self.kept = ray.get(kept_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = batch[key].to_pandas().isin(self.kept).to_numpy()
            return batch.filter(pa.array(mask))

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 8))


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
