"""Metric-path operators: prometheus text parse, histogram re-bucketing,
cumulative→delta, metric-rename chains, dimension upserts.

Reference semantics (citations into /root/reference):
- `lightprometheus` scraper parses expfmt text into Gauge/Sum/Histogram/
  Summary with label→attribute mapping and converts CUMULATIVE bucket counts
  to per-bucket counts by adjacent difference
  (internal/receiver/lightprometheusreceiver/scraper.go:77-282; the bucket
  re-bucketing loop :218-235).
- `cumulativetodelta` processor: per-series last-value state → deltas
  (internal/components/components.go:322).
- smartagent `metricNameTransformations`: ordered regex→replacement rename
  chain with backrefs (internal/signalfx-agent/pkg/core/config/monitor.go:103-116);
  `dimensionTransformations`: static dim rename, "" deletes
  (monitor.go:117-122).
- signalfx exporter dimension-update side channel: property upserts keyed on
  dimension, LAST write wins (pkg/receiver/smartagentreceiver/output.go:303-315).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_PROM_LINE = re.compile(
    r"^(?P<name>[a-zA-Z_:][a-zA-Z0-9_:]*)"
    r"(?:\{(?P<labels>[^}]*)\})?\s+(?P<value>[^\s]+)(?:\s+(?P<ts>\d+))?$")
_PROM_LABEL = re.compile(r'(\w+)="([^"]*)"')


def parse_prometheus_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """expfmt text blobs → one row per sample (name, labels json, value).

    TYPE/HELP comments classify the metric (gauge/counter/histogram/summary);
    `_bucket`/`_sum`/`_count` suffixes keep their roles via the name. Metric
    type is carried per sample (scraper.go:181-277 partitions by type).
    """
    texts = batch[text_col].to_pandas()
    names, labels, values, types, rows_src = [], [], [], [], []
    for i, blob in enumerate(texts):
        mtype = {}
        cur_types = {}
        for line in (blob or "").splitlines():
            line = line.strip()
            if not line:
                continue
            if line.startswith("# TYPE "):
                _, _, rest = line.partition("# TYPE ")
                mname, _, t = rest.partition(" ")
                cur_types[mname] = t.strip()
                continue
            if line.startswith("#"):
                continue
            m = _PROM_LINE.match(line)
            if not m:
                continue
            name = m.group("name")
            base = re.sub(r"_(bucket|sum|count)$", "", name)
            names.append(name)
            labels.append(m.group("labels") or "")
            try:
                values.append(float(m.group("value")))
            except ValueError:
                values.append(float("nan"))
            types.append(cur_types.get(base, cur_types.get(name, "untyped")))
            rows_src.append(i)
    return pa.table({
        "src_row": pa.array(np.asarray(rows_src, dtype=np.int64)),
        "name": pa.array(names, type=pa.string()),
        "labels": pa.array(labels, type=pa.string()),
        "value": pa.array(np.asarray(values, dtype=np.float64)),
        "type": pa.array(types, type=pa.string()),
    })


def prometheus_error_counters(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Bad-sample running totals — the PRW receiver's error side-counters
    (signalfxgatewayprometheusremotewrite prometheus_to_otel.go:129-166:
    invalid-request / NaN / missing-name cumulative sums).

    Per-batch partial counters → one grouped sum; returns a single row
    (total_samples, malformed_lines, nan_samples).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        total = malformed = nans = 0
        for blob in batch[text_col].to_pandas():
            for line in (blob or "").splitlines():
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                m = _PROM_LINE.match(line)
                if not m:
                    malformed += 1
                    continue
                total += 1
                try:
                    v = float(m.group("value"))
                    if v != v:  # NaN sample
                        nans += 1
                except ValueError:
                    nans += 1
        return pa.table({
            "k": ["all"],
            "total_samples": pa.array([total], type=pa.int64()),
            "malformed_lines": pa.array([malformed], type=pa.int64()),
            "nan_samples": pa.array([nans], type=pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("total_samples", alias_name="total_samples"),
                   Sum("malformed_lines", alias_name="malformed_lines"),
                   Sum("nan_samples", alias_name="nan_samples"))
    )


def histogram_bucket_deltas(cum_counts: np.ndarray) -> np.ndarray:
    """Cumulative `le` bucket counts → per-bucket counts (scraper.go:218-235):
    bucket[i] = cum[i] - cum[i-1], bucket[0] = cum[0]."""
    out = np.asarray(cum_counts, dtype=np.float64).copy()
    out[1:] -= out[:-1]
    return out


@dataclass
class MetricRenameChain:
    """Ordered regex→replacement renames with backrefs (monitor.go:103-116)."""

    rules: list[tuple[str, str]]

    def __call__(self, batch: pa.Table, col: str = "name") -> pa.Table:
        s = batch[col].to_pandas()
        for pat, repl in self.rules:
            s = s.str.replace(pat, repl, regex=True)
        return batch.set_column(
            batch.column_names.index(col), col, pa.array(s, type=pa.string()))


def rename_dimensions(batch: pa.Table, mapping: dict[str, str]) -> pa.Table:
    """dimensionTransformations: rename columns; map-to-"" deletes
    (monitor.go:117-122)."""
    for old, new in mapping.items():
        if old not in batch.column_names:
            continue
        col = batch[old]
        batch = batch.drop_columns([old])
        if new:
            batch = batch.append_column(new, col)
    return batch


def span_durations(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Tool-call span durations — the spanmetrics connector's input
    (components.go:347): duration of a tool turn = gap to the next turn in
    the same conversation (0 for a conversation's last turn).

    Scale shape: conversations are bucketed (hash % 64) and each bucket's
    lead/shift runs as ONE vectorized pandas pass — same pattern as
    recombine; a conversation never spans buckets.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t["conv_id"].to_pandas().to_numpy(dtype=object)) % 64
        return t.append_column("_bucket", pa.array(h.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        nxt = g.groupby("conv_id", sort=False)["ts"].shift(-1)
        dur = (nxt - g["ts"]).dt.total_seconds().fillna(0.0)
        out = g.assign(duration_s=dur)
        out = out[(out["role"] == "tool") & (out["tool"] != "")]
        return out[["conv_id", "turn_idx", "tool", "duration_s"]]

    return (
        ds.select_columns(["conv_id", "turn_idx", "role", "tool", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def dimension_upsert(
    ds: "ray.data.Dataset", key: str, order: str, values: list[str]
) -> "ray.data.Dataset":
    """Last-write-wins property upsert per dimension key (output.go:303-315):
    keep each key's row with the greatest ``order`` value.

    Scale shape: per-batch partial last-row (vectorized idxmax) shrinks each
    block to ≤ one row per key before the keyed shuffle.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key, order, *values]).to_pandas()
        keep = df.loc[df.groupby(key, sort=False)[order].idxmax()]
        return pa.Table.from_pandas(keep, preserve_index=False)

    def add_bucket(t: pa.Table) -> pa.Table:
        kv = t[key].to_pandas().to_numpy()
        h = (pd.util.hash_array(kv.astype(object))
             if kv.dtype == object else kv.astype(np.int64) % (1 << 62))
        return t.append_column("_bucket",
                               pa.array((h % 64).astype(np.int32)))

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[g.groupby(key, sort=False)[order].idxmax()]
        return keep.drop(columns=["_bucket"])

    # per-batch partials shrink to ≤1 row/key/batch; the final reduce runs
    # per hash bucket (64 vectorized pandas passes, not one task per key)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(final_bucket, batch_format="pandas")
    )
