"""Distributed per-group statistics operators.

The reference has no anomaly scoring, but per-group deviation flags are the
standard telemetry QA step downstream of the collector (and a training-data
quality gate: drop documents whose length is an outlier for their source).

Determinism discipline: the group moments are EXACT int64 sums (n, Σx, Σx²),
so the z-score is one float expression over exact integers — the DuckDB twin
computes the identical expression from its own exact HUGEINT sums and the
doubles hash-compare bit-for-bit (CLAUDE.md raw-IEEE rule: never two
independently rounded float paths).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def zscore_flags(
    ds: "ray.data.Dataset", value_col: str, group_col: str,
    threshold: float = 3.0, z_out: str = "z", flag_out: str = "is_outlier",
) -> "ray.data.Dataset":
    """Per-group z-score + |z| > threshold flag over an INTEGER column.

    Two streaming passes: (1) per-batch (n, Σx, Σx²) partials shrink each
    batch to ≤ #groups rows before a tiny groupby; (2) the #groups×3 moment
    table broadcasts in the closure and every batch computes
    ``z = (n·x − Σx) / sqrt(n·Σx² − Σx²)`` (the population-σ z-score
    rescaled through exact integers) vectorized. Nothing but the
    moment rows ever leaves a worker, so the shape holds at 100 TB as long
    as the group cardinality is bounded (it is: sources/services).

    Integer-overflow budget: all subexpressions stay inside int64 for
    n ≤ 2^31 and |x| ≤ 2^15 (n·Σx² ≤ 2^61); callers with larger domains
    should pre-scale.
    """

    def partial(t: pa.Table) -> pa.Table:
        x = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({group_col: t[group_col].to_pandas(),
                           "_n": np.ones(len(x), dtype=np.int64),
                           "_s": x, "_q": x * x})
        g = df.groupby(group_col, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    moments = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(group_col)
               .aggregate(Sum("_n", alias_name="_n"),
                          Sum("_s", alias_name="_s"),
                          Sum("_q", alias_name="_q"))).to_pandas()
    n = dict(zip(moments[group_col], moments["_n"].astype(np.int64)))
    s = dict(zip(moments[group_col], moments["_s"].astype(np.int64)))
    q = dict(zip(moments[group_col], moments["_q"].astype(np.int64)))

    def score(t: pa.Table) -> pa.Table:
        grp = t[group_col].to_pandas()
        x = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        gn = grp.map(n).to_numpy(dtype=np.int64)
        gs = grp.map(s).to_numpy(dtype=np.int64)
        gq = grp.map(q).to_numpy(dtype=np.int64)
        num = (gn * x - gs).astype(np.float64)
        den = np.sqrt((gn * gq - gs * gs).astype(np.float64))
        z = np.divide(num, den, out=np.zeros_like(num), where=den > 0)
        t = t.append_column(z_out, pa.array(z, type=pa.float64()))
        return t.append_column(
            flag_out, pa.array(np.abs(z) > threshold, type=pa.bool_()))

    return ds.map_batches(score, batch_format="pyarrow")
