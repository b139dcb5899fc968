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

from ..partitioning import pd_table
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
        return pd_table(g)

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


def grouped_quantile_select(
    ds: "ray.data.Dataset", group_col: str, value_col: str, id_col: str,
    qs: "tuple[float, ...]" = (0.5, 0.95, 0.99), ncells: int = 4096,
) -> "pd.DataFrame":
    """EXACT per-group quantiles without a global sort — the precise
    counterpart of aggregate.grid_quantiles (spanmetrics-style p50/p95/p99
    where the exact element matters, e.g. SLO attribution).

    Selection semantics are pinned to integer arithmetic so a SQL twin can
    replay them: for group size n, quantile q picks the element at 1-based
    rank ``floor((n-1)*q) + 1`` under (value, id) order. Shape (all
    passes bounded; rows never sort globally):

    1. one pass: per-batch (group, cell, cnt) histogram partials over a
       global [min, max] grid → tiny driver combine;
    2. the target rank of every (group, q) lands in one cell with a known
       in-cell offset; ONE filtered pass pulls only the needed (group,
       cell) members (~n_g/ncells rows each) — equal values share a cell,
       so the in-cell (value, id) sort makes selection exact;
    3. driver picks each element. Pathological single-value cells stay
       bounded by the same argument as sample.quantile_buckets (which has
       the refinement loop for the extreme case).

    Returns a pandas DataFrame (group, p<q>…) — a tiny result by
    construction (one row per group).
    """
    import pyarrow.compute as pc

    # exact integer rank math at ppm granularity: floor((n-1)*q) computed as
    # (n-1)*round(q·10^6)//10^6, so q=0.999 or 0.125 select the RIGHT rank
    # (the old int(round(q*100))//100 silently turned 0.999 into p100/max)
    # and each q gets a distinct column name (p99.9, p12.5).
    qi = {}
    for q in qs:
        scaled = int(round(q * 1_000_000))
        if not (0 <= scaled <= 1_000_000) or abs(q * 1_000_000 - scaled) > 1e-3:
            raise ValueError(f"quantile {q} not representable at 1e-6 "
                             "granularity (must be in [0, 1])")
        qi[q] = scaled
    qname = {q: ("p%g" % (s / 10_000)) for q, s in qi.items()}
    if len(set(qname.values())) != len(qs):
        raise ValueError(f"duplicate quantiles in {qs}")

    proj = ds.select_columns([group_col, value_col, id_col]).materialize()

    def mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        v = t[value_col]
        return pa.table({"lo": [float(pc.min(v).as_py())],
                         "hi": [float(pc.max(v).as_py())]})

    st = proj.map_batches(mm, batch_format="pyarrow").to_pandas()
    if not len(st):
        return pd.DataFrame({group_col: []})
    lo, hi = float(st["lo"].min()), float(st["hi"].max())

    def cell_of(x: np.ndarray) -> np.ndarray:
        if hi <= lo:
            return np.zeros(len(x), np.int64)
        c = np.floor((x - lo) * (ncells / (hi - lo))).astype(np.int64)
        return np.clip(c, 0, ncells - 1)

    def histo(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "cell": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "g": t[group_col].to_pandas(),
            "cell": cell_of(t[value_col].to_numpy(zero_copy_only=False)
                            .astype(np.float64)),
        })
        out = df.groupby(["g", "cell"], as_index=False).size()
        return pa.table({group_col: pa.array(out["g"]),
                         "cell": pa.array(out["cell"], pa.int64()),
                         "cnt": pa.array(out["size"], pa.int64())})

    hdf = (proj.map_batches(histo, batch_format="pyarrow").to_pandas()
           .groupby([group_col, "cell"], as_index=False)["cnt"].sum())

    needed: dict = {}  # (group, cell) -> list of (q, offset_in_cell)
    for g, sub in hdf.groupby(group_col):
        sub = sub.sort_values("cell")
        cells = sub["cell"].to_numpy()
        cnts = sub["cnt"].to_numpy()
        cum = np.concatenate([[0], np.cumsum(cnts)])
        n = int(cum[-1])
        for q in qs:
            rank = (n - 1) * qi[q] // 1_000_000  # 0-based, exact int math
            j = int(np.searchsorted(cum, rank, side="right") - 1)
            needed.setdefault((g, int(cells[j])), []).append(
                (q, rank - int(cum[j])))

    keys = set(needed)

    def pull(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        g = t[group_col].to_pandas().to_numpy(dtype=object)
        c = cell_of(t[value_col].to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        m = np.zeros(len(g), bool)
        for gg, cc in keys:  # |keys| = #groups × #qs — a handful
            m |= (g == gg) & (c == cc)
        return t.filter(pa.array(m))

    pulled = proj.map_batches(pull, batch_format="pyarrow").to_pandas()
    pulled["_cell"] = cell_of(pulled[value_col].to_numpy(dtype=np.float64))

    rows = {}
    for (g, cell), targets in needed.items():
        sub = (pulled[(pulled[group_col] == g) & (pulled["_cell"] == cell)]
               .sort_values([value_col, id_col], kind="mergesort"))
        for q, off in targets:
            rows.setdefault(g, {})[qname[q]] = \
                float(sub.iloc[off][value_col])
    out = pd.DataFrame(
        [{group_col: g, **vals} for g, vals in sorted(rows.items())])
    return out.reset_index(drop=True)
