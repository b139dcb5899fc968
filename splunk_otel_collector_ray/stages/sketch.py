"""Mergeable-sketch operators (beyond-reference training-data ops).

The reference collector has no sketches (SURVEY §2.7: "Distinct/sketches:
none"), but a 100 TB data-pipeline needs cardinality estimates that do NOT
shuffle the stream. HyperLogLog (Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog:
the analysis of a near-optimal cardinality estimation algorithm", AofA 2007)
is the canonical mergeable sketch: per-batch register partials merge with
``max`` — the same partial-shrink shape as the count/sum connectors, so the
exchange moves O(groups × m) register rows, never the values.

Everything here is DETERMINISTIC (mix64 value hash, fixed register count),
so the DuckDB oracle twin replays the identical registers with HUGEINT
mod-2^64 arithmetic and the approximation itself is value-compared — not
just bounds-tested.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..partitioning import pd_table

# SQL-replayable 64-bit mix: two rounds of 32-bit-limb multiply-accumulate
# (mod 2^64) + xorshift. Multipliers are < 2^61 so the oracle twin's HUGEINT
# products (2^32 limb × 2^61 constant = 2^93) stay far inside int128 — the
# same wraparound-replay discipline as the MinHash twin. Constants are
# arbitrary odd 61-bit values (golden-ratio-flavored, no special source).
MIX_P = (0x1B87359353C9A6D1, 0x0D1B54A32D192ED3,
         0x165667B19E3779F9, 0x1FC64E6B349B91A7)
MIX_K = 0x27220A95FE7C3D4F
_M64 = 1 << 64


def mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hash over int64/uint64 values (wraps mod 2^64);
    replayed bit-exactly by :func:`mix64_sql`."""
    h = x.astype(np.uint64)
    for p, q in (MIX_P[:2], MIX_P[2:]):
        lo = h & np.uint64(0xFFFFFFFF)
        hi = h >> np.uint64(32)
        h = lo * np.uint64(p) + hi * np.uint64(q) + np.uint64(MIX_K)
        h ^= h >> np.uint64(31)
    return h


def mix64_sql_ctes(carry: str, value_expr: str, source: str,
                   prefix: str = "mx") -> tuple[str, str]:
    """DuckDB CTE chain computing mix64(value_expr) with HUGEINT mod-2^64
    arithmetic (value_expr must be non-negative integer). Returns
    ``(cte_sql, final_name)``; the final CTE has columns ``(carry…, h)``.
    Linear chain — each stage referenced once, so DuckDB never re-executes
    the mix (the MATERIALIZED-CTE discipline is unnecessary here)."""
    ctes = [f"{prefix}_in AS (SELECT {carry}, "
            f"CAST({value_expr} AS HUGEINT) AS h FROM {source})"]
    src = f"{prefix}_in"
    for i, (p, q) in enumerate((MIX_P[:2], MIX_P[2:])):
        ctes.append(f"{prefix}_m{i} AS (SELECT {carry}, "
                    f"(h % 4294967296 * {p}::HUGEINT + "
                    f"h // 4294967296 * {q}::HUGEINT + {MIX_K}::HUGEINT) "
                    f"% {_M64}::HUGEINT AS t FROM {src})")
        src = f"{prefix}_h{i}"
        ctes.append(f"{src} AS (SELECT {carry}, "
                    f"xor(t, t // 2147483648) AS h FROM {prefix}_m{i})")
    return ", ".join(ctes), src


def string_fold64_sql(col: str) -> str:
    """DuckDB expression replaying :func:`sample.string_fold64` for ASCII
    ids: the last 8 bytes of ``col`` (null→'') read big-endian with right
    NUL padding, xor'd with the byte length. Fixed 8-term fold — pure
    integer ops, vectorizes fine. Feed the result into
    :func:`mix64_sql_ctes` as the value_expr."""
    c = f"COALESCE({col}, '')"
    t = f"substr({c}, greatest(length({c}) - 7, 1))"
    terms = " + ".join(
        f"(CASE WHEN length({t}) >= {i} THEN ord(substr({t}, {i}, 1)) "
        f"ELSE 0 END) * {256 ** (8 - i)}::HUGEINT"
        for i in range(1, 9))
    return f"xor({terms}, strlen({c})::HUGEINT)"


def _rho(w: np.ndarray, width: int) -> np.ndarray:
    """1 + leading-zero count of ``w`` within ``width`` bits (w < 2^width,
    width ≤ 52 so the float64 log2 path is exact): rho = width - floor(log2 w)
    for w > 0, else width + 1."""
    out = np.full(len(w), width + 1, dtype=np.int64)
    nz = w > 0
    # w < 2^52 ≤ 2^53 → exactly representable; frexp exponent-1 == floor(log2)
    _, exp = np.frexp(w[nz].astype(np.float64))
    out[nz] = width - (exp - 1)
    return out


def hll_estimate(rhos: np.ndarray, m: int) -> float:
    """HLL estimate from the present registers (absent buckets count rho=0,
    i.e. contribute 2^0 = 1 to the denominator) with the standard
    small-range linear-counting correction."""
    present = len(rhos)
    s = float(m - present) + float(
        np.sum(np.power(2.0, -rhos.astype(np.float64))))
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / s
    v = m - present
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def hll_distinct(
    ds: "ray.data.Dataset", value_col: str, group_col: str, p: int = 12,
    out: str = "approx_distinct",
) -> "ray.data.Dataset":
    """Approximate COUNT(DISTINCT value) per group via per-batch HLL
    register partials.

    Scale shape: each batch shrinks to ≤ groups × 2^p (bucket, rho) rows
    before the exchange; the final merge is a grouped ``max`` over register
    ids, and the estimate runs per group over ≤ 2^p tiny rows. The stream's
    values never shuffle. Standard error ≈ 1.04/sqrt(2^p) (~1.6% at p=12).
    """
    if not 12 <= p <= 18:
        # _rho's exact float64 log path needs width = 64-p ≤ 52 (w must be
        # exactly representable in a double); p < 12 silently risks an
        # off-by-one exponent from frexp of the rounded value, and the SQL
        # twin hardcodes p=12 constants anyway.
        raise ValueError(f"hll_distinct requires 12 <= p <= 18, got {p}")
    m = 1 << p
    width = 64 - p

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # keep the partial schema stable on empty blocks
            return pa.table({group_col: pa.array([], t[group_col].type),
                             "bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        vals = t[value_col].to_numpy(zero_copy_only=False)
        h = mix64(vals)
        bucket = (h >> np.uint64(width)).astype(np.int64)
        w = h & np.uint64((1 << width) - 1)
        df = pd.DataFrame({group_col: t[group_col].to_pandas(),
                           "bucket": bucket, "rho": _rho(w, width)})
        out_df = df.groupby([group_col, "bucket"], as_index=False)["rho"].max()
        return pd_table(out_df)

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col, "bucket"]).aggregate([("rho", "max")])
        return g.rename_columns([group_col, "bucket", "rho"])

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        merged = df.groupby([group_col, "bucket"], as_index=False)["rho"].max()
        rows = [(grp, hll_estimate(sub["rho"].to_numpy(), m))
                for grp, sub in merged.groupby(group_col, sort=True)]
        return pd.DataFrame(rows, columns=[group_col, out])

    from ..partitioning import small_fold

    # combiner level folds many ≤ groups×2^p partial blocks into few; the
    # final merge+estimate is ONE task over ≤ groups×2^p tiny rows (group
    # cardinality is small by contract here — it's a per-severity/sink
    # distinct estimate, not a per-key one)
    registers = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        combine, batch_format="pyarrow", batch_size=1 << 16,
        num_cpus=0)  # break fusion — a fused 65k batch_size collapses the
    #                upstream chain's task parallelism (see _sum_combine)
    return small_fold(registers, estimate, batch_format="pandas")


# count-min row seeds: row 0 is plain mix64; rows 1-3 xor an odd 61-bit
# constant into the value first (SQL twin xors the same HUGEINT constant)
CM_SEEDS = (0, 0x0B4C1D2E3F405162, 0x13579BDF02468ACE, 0x1D0CB0A090807061)

# bloom hash seeds (k=3 independent positions per value, same xor-then-mix
# construction as the count-min rows so the SQL twin replays them)
BLOOM_SEEDS = (0, 0x0E9F1D8C7B6A5943, 0x1A2B3C4D5E6F7081)


def bloom_positions(vals: np.ndarray, m: int, seeds=BLOOM_SEEDS
                    ) -> np.ndarray:
    """(len(vals), k) bit positions: mix64(value xor seed_i) % m."""
    u = vals.astype(np.uint64)
    return np.stack(
        [(mix64(u ^ np.uint64(s)) % np.uint64(m)).astype(np.int64)
         for s in seeds], axis=1)


def bloom_build(ds: "ray.data.Dataset", value_col: str, m: int = 1 << 16,
                seeds=BLOOM_SEEDS) -> np.ndarray:
    """Build a Bloom-filter bitmap (Bloom, CACM 1970) over a key column,
    distributed: each batch shrinks to its ≤ m DISTINCT bit positions
    before the exchange, the exchange is a `unique` over ≤ m ints, and only
    the m-bit bitmap (8 KB at m=2^16) reaches the driver — the keys
    themselves never move. Deterministic (mix64), so the DuckDB twin
    replays the exact positions and the membership test is value-compared.
    """

    def partial(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False)
        pos = np.unique(bloom_positions(vals, m, seeds))
        return pa.table({"pos": pa.array(pos, type=pa.int64())})

    pos = (ds.map_batches(partial, batch_format="pyarrow")
           .unique("pos"))
    bits = np.zeros(m, dtype=bool)
    bits[np.asarray(pos, dtype=np.int64)] = True
    return bits


def bloom_flag(ds: "ray.data.Dataset", value_col: str, bits: np.ndarray,
               out: str = "bloom_hit", seeds=BLOOM_SEEDS) -> "ray.data.Dataset":
    """Stamp each row with Bloom membership of ``value_col``. The bitmap is
    tiny (m bits) and rides in the task closure; at cluster scale pass a
    ``ray.put`` handle instead if m grows past a few MB. One-sided error:
    a False is definitely absent; a True may be a false positive."""
    m = len(bits)

    def fn(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False)
        pos = bloom_positions(vals, m, seeds)
        hit = bits[pos].all(axis=1)
        return t.append_column(out, pa.array(hit, type=pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


def cm_partial_counts(vals: np.ndarray, depth: int, width: int
                      ) -> pd.DataFrame:
    """Batch-local count-min partial: (d, bucket, n) rows, one bincount per
    sketch row — the whole batch shrinks to ≤ depth × width rows."""
    frames = []
    u = vals.astype(np.uint64)
    for d in range(depth):
        b = (mix64(u ^ np.uint64(CM_SEEDS[d])) % np.uint64(width)).astype(
            np.int64)
        cnt = np.bincount(b, minlength=width)
        nz = np.flatnonzero(cnt)
        frames.append(pd.DataFrame(
            {"d": np.full(len(nz), d, dtype=np.int64), "bucket": nz,
             "n": cnt[nz]}))
    return pd.concat(frames, ignore_index=True)


def cm_heavy_hitters(
    ds: "ray.data.Dataset", value_col: str, k: int = 10, depth: int = 4,
    width: int = 1024,
) -> pd.DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan, "An improved
    data stream summary: the count-min sketch and its applications",
    J. Algorithms 2005): estimate the counts of the exact top-k values from
    a fixed depth×width counter grid.

    Unlike SpaceSaving, count-min is ORDER-INDEPENDENT (counters add
    commutatively), so the distributed estimate is deterministic and the
    SQL twin replays it exactly. Scale shape: each batch shrinks to
    ≤ depth × width partial counter rows before the exchange; the merged
    sketch is sketch-sized (depth × width), so collecting it to the driver
    is O(1) in the data. Candidates come from the exact grouped count
    (top-k by count desc, value asc — a total order). est ≥ exact always
    (one-sided count-min error).
    """
    from ray.data.aggregate import Sum

    from ..pipelines.aggregate import grouped_count

    def partial(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False)
        return pd_table(cm_partial_counts(vals, depth, width))

    cm = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["d", "bucket"])
          .aggregate(Sum("n", alias_name="n"))).to_pandas()
    grid = np.zeros((depth, width), dtype=np.int64)
    grid[cm["d"].to_numpy(), cm["bucket"].to_numpy()] = cm["n"].to_numpy()

    top = (grouped_count(ds, [value_col], alias="n_exact")
           .sort([ "n_exact", value_col], descending=[True, False])
           .limit(k).to_pandas())
    cand = top[value_col].to_numpy().astype(np.uint64)
    est = np.full(len(cand), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        b = (mix64(cand ^ np.uint64(CM_SEEDS[d]))
             % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, grid[d, b])
    top["n_est"] = est
    return top
