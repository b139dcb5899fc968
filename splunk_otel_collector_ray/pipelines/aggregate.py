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
from ray.data.aggregate import Sum


def grouped_count(
    ds: "ray.data.Dataset", keys: list[str], alias: str = "n"
) -> "ray.data.Dataset":
    """groupby(keys).count() with per-batch partial aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns([*keys, alias])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(Sum(alias, alias_name=alias))


def grouped_sum(
    ds: "ray.data.Dataset", keys: list[str], value: str, alias: str | None = None
) -> "ray.data.Dataset":
    """groupby(keys).sum(value) with per-batch partial aggregation."""
    alias = alias or f"sum_{value}"

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([*keys, value]).group_by(keys).aggregate([(value, "sum")])
        return g.rename_columns([*keys, alias])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(Sum(alias, alias_name=alias))


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

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(
        Sum(count_alias, alias_name=count_alias), Sum(sum_alias, alias_name=sum_alias)
    )
