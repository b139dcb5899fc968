"""Count/sum-connector analogues with scale-aware two-phase aggregation.

Reference semantics: the `count` and `sum` connectors turn matching records
into per-group metrics (internal/components/components.go:344,348); the batch
processor's roll-ups and receiver obsreport counts are per-stage counters
(SURVEY.md §2.7).

Scale design: a bare ``groupby(keys).aggregate(...)`` shuffles EVERY row.
Group cardinality here (sink × severity × tool, event_type, …) is tiny, so we
pre-aggregate inside ``map_batches`` (one row per key per batch — the
"combiner") and shuffle only the partials. At 100 TB this turns an all-to-all
exchange of the full corpus into a shuffle of ~(#blocks × #groups) rows.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from ..partitioning import pd_table, small_fold


def _sum_fold(keys: list[str], sums: list[str], sort: bool = False):
    """Vectorized grouped-sum pass usable as both the combiner level
    (``sort=False`` — a combiner's order is discarded downstream) and the
    :func:`small_fold` final (``sort=True``, sorted by keys like Ray's
    Aggregate output)."""

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, "sum") for c in sums])
        g = g.rename_columns([*keys, *sums])
        return g.sort_by([(k, "ascending") for k in keys]) if sort else g

    return combine


def _sum_combine(partials: "ray.data.Dataset", keys: list[str],
                 sums: list[str], batch_size: int = 1 << 16,
                 ) -> "ray.data.Dataset":
    """Second combiner level: coalesce many tiny partial blocks into few.

    A distributed final reduce pays a fixed per-input-block cost that
    dominates when the input is thousands of tiny partial blocks —
    measured ~80 ms/block on 65-row partials under the Aggregate operator,
    i.e. tens of CPU seconds for <1 MB of data at sf1.6. One coalescing
    map_batches with a large batch_size folds ~1000 partial blocks into
    one, so the final fold sees O(#groups) rows per coalesced block.

    ``num_cpus=0`` BREAKS FUSION with the upstream partial/parse chain
    (r4): fused, this stage's large batch_size dictates the whole chain's
    input bundling and collapses it to ~#rows/batch_size tasks (measured
    14 tasks instead of 110 at sf0.1 — half the cluster idle).
    """
    return partials.map_batches(_sum_fold(keys, sums),
                                batch_format="pyarrow",
                                batch_size=batch_size, num_cpus=0)


def grouped_count(
    ds: "ray.data.Dataset", keys: list[str], alias: str = "n"
) -> "ray.data.Dataset":
    """groupby(keys).count() with per-batch partial aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns([*keys, alias])

    partials = _sum_combine(
        ds.map_batches(partial, batch_format="pyarrow"), keys, [alias])
    return small_fold(partials, _sum_fold(keys, [alias], sort=True))


def grouped_sum(
    ds: "ray.data.Dataset", keys: list[str], value: str, alias: str | None = None
) -> "ray.data.Dataset":
    """groupby(keys).sum(value) with per-batch partial aggregation."""
    alias = alias or f"sum_{value}"

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([*keys, value]).group_by(keys).aggregate([(value, "sum")])
        return g.rename_columns([*keys, alias])

    partials = _sum_combine(
        ds.map_batches(partial, batch_format="pyarrow"), keys, [alias])
    return small_fold(partials, _sum_fold(keys, [alias], sort=True))


def grouped_stats(
    ds: "ray.data.Dataset", keys: list[str], value: str,
) -> "ray.data.Dataset":
    """count/mean/min/max per group via mergeable partials (n, sum, min, max).

    The partial tuple is the canonical mergeable-statistic pattern (sketches
    merge the same way): each batch contributes one row per key; the final
    combine is a tiny grouped reduction + a vectorized mean division.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([*keys, value]).group_by(keys).aggregate(
            [([], "count_all"), (value, "sum"), (value, "min"), (value, "max")])
        return g.rename_columns([*keys, "n", "_sum", "_min", "_max"])

    def coalesce(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(
            [("n", "sum"), ("_sum", "sum"), ("_min", "min"), ("_max", "max")])
        return g.rename_columns([*keys, "n", "_sum", "_min", "_max"])

    def final(t: pa.Table) -> pa.Table:
        return coalesce(t).sort_by([(k, "ascending") for k in keys])

    partials = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        coalesce, batch_format="pyarrow", batch_size=1 << 16,
        num_cpus=0)  # break fusion — see _sum_combine
    combined = small_fold(partials, final)

    def finalize(t: pa.Table) -> pa.Table:
        mean = pc.divide(pc.cast(t["_sum"], pa.float64()),
                         pc.cast(t["n"], pa.float64()))
        out = t.drop_columns(["_sum"]).append_column("mean", mean)
        return out.rename_columns(
            [c if c not in ("_min", "_max") else c[1:]
             for c in out.column_names])

    return combined.map_batches(finalize, batch_format="pyarrow")


def grouped_topk(
    ds: "ray.data.Dataset", keys: list[str], k: int,
    by: list[str], ascending: list[bool],
) -> "ray.data.Dataset":
    """Per-group top-k (processlist top-N analogue, SURVEY §2.8) with
    per-batch partial pruning: each batch keeps only its local top-k per
    group, so the final per-group reduce sees ≤ k·#batches rows instead of
    the full stream — a full-stream ``groupby(keys).map_groups`` would pull
    ~1/#groups of the corpus into a single task per group.

    ``by``/``ascending`` must be a TOTAL order (include a unique tiebreak)
    so partial pruning is exact.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.sort_values(by, ascending=ascending,
                             kind="mergesort").groupby(keys, sort=False).head(k)
        return pd_table(out)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(by, ascending=ascending, kind="mergesort")
                .groupby(keys, sort=False).head(k))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return small_fold(partials, final, batch_format="pandas")


def grouped_count_sum(
    ds: "ray.data.Dataset", keys: list[str], value: str,
    count_alias: str = "n", sum_alias: str | None = None,
) -> "ray.data.Dataset":
    """count + sum in one partial pass (spanmetrics-style multi-aggregate)."""
    sum_alias = sum_alias or f"sum_{value}"

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([*keys, value]).group_by(keys).aggregate(
            [([], "count_all"), (value, "sum")])
        return g.rename_columns([*keys, count_alias, sum_alias])

    partials = _sum_combine(
        ds.map_batches(partial, batch_format="pyarrow"), keys,
        [count_alias, sum_alias])
    return small_fold(partials,
                      _sum_fold(keys, [count_alias, sum_alias],
                                sort=True))


def grid_quantiles(ds: "ray.data.Dataset", group_col: str, value_col: str,
                   qs: "tuple[float, ...]" = (0.5, 0.95, 0.99),
                   grid: int = 100) -> pd.DataFrame:
    """Distributed per-group quantiles on a fixed value grid — the p50/p95/
    p99 latency roll-up every telemetry pipeline ends in.

    Exact quantiles need a per-group sort (all-to-all at 100 TB); instead
    values are bucketed to a deterministic grid (``floor(v·grid)``) and
    the stream reduces batch-locally to (group, bucket) counts — the same
    partial-shrink shape as the count/sum connectors, so only tiny
    histograms move. The q-quantile is the smallest bucket whose
    cumulative count reaches ``ceil(q·n)`` (1-based rank), reported as
    the bucket lower edge ``bucket / grid`` — deterministic, replayed
    exactly by the SQL twin (identical int division both sides). Grid
    resolution bounds the error to 1/grid, independent of data size.
    """
    import math

    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        g = t[group_col].to_pandas()
        bk = np.floor(v * grid).astype(np.int64)
        out = pd.DataFrame({group_col: g, "bk": bk}) \
            .groupby([group_col, "bk"], as_index=False).size()
        return pd_table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    hist = parts.groupby([group_col, "bk"], as_index=False)["size"].sum()
    rows = []
    for grp, h in hist.groupby(group_col):
        h = h.sort_values("bk")
        cum = h["size"].cumsum().to_numpy()
        n = int(cum[-1])
        bks = h["bk"].to_numpy()
        for q in qs:
            rank = math.ceil(q * n)
            rows.append((grp, q, bks[int(np.searchsorted(cum, rank))] / grid))
    return pd.DataFrame(rows, columns=[group_col, "q", "quantile"])
