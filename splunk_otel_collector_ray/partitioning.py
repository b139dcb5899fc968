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


def default_num_buckets(min_buckets: int = 64) -> int:
    """Cluster-derived bucket count for hash-bucketed grouped ops (r2
    VERDICT item 9): 2 grouped tasks per CPU in the cluster, floored at 64
    — at 32 single-node CPUs this keeps the proven 64-bucket shape
    (measured: 128 buckets cost 5-10% in tiny-group overhead at sf0.1),
    while a 256-node/8k-CPU cluster gets 16k buckets automatically instead
    of the single-node constant."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:  # no session yet (pure planning context)
        cpus = 16
    return max(min_buckets, 2 * cpus)


def spread_num_buckets(min_buckets: int = 64) -> int:
    """Bucket DOMAIN for :func:`bucket_fold` — 64× the task-level bucket
    count. The fold runs one vectorized pass per output BLOCK (not per
    bucket), so a wide domain costs nothing, and it keeps the bucket value
    count far above the sort partition count (= upstream block count):
    Ray's sort emits every surplus partition as a schemaless EMPTY block
    that bypasses downstream UDFs (ray plan_udf_map_op.py TODO(hchen)) and
    trips schema-divergence warnings. With values ≫ partitions every
    partition is populated and the executor sees one stable schema."""
    return 64 * default_num_buckets(min_buckets)


def pd_table(df: pd.DataFrame) -> pa.Table:
    """``pa.Table.from_pandas`` WITHOUT the ``b'pandas'`` schema metadata.

    The metadata dict makes the Arrow schema unhashable, which knocks Ray's
    per-reduce-task schema deduplication (``transform_pyarrow.unify_schemas``
    early-exit) onto its slow full-unify path and logs
    ``Failed to hash the schemas`` per task — measurable overhead in every
    shuffle whose map side built tables from pandas."""
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def read_parquet_clean(path: str, **kw) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` with the file's ``b'pandas'`` schema
    metadata stripped at the source (same rationale as :func:`pd_table` —
    pandas-written parquet carries a metadata dict that makes every
    downstream shuffle/join schema unhashable). Passing the stripped
    schema through ``read_parquet(schema=...)`` keeps projection pushdown
    intact, unlike a post-read map_batches."""
    import glob
    import os

    import pyarrow.parquet as pq

    if "schema" not in kw:
        p = path if os.path.isfile(path) else sorted(
            glob.glob(os.path.join(path, "*.parquet")))[0]
        schema = pq.read_schema(p).remove_metadata()
        if kw.get("columns"):
            # read_parquet requires schema ⊆ columns when both are given
            schema = pa.schema([schema.field(c) for c in kw["columns"]])
        kw["schema"] = schema
    return ray.data.read_parquet(path, **kw)


def bucket_fold(ds: "ray.data.Dataset", bucket_col: str, fold,
                batch_format: str = "pandas",
                coalesce: int | None = None) -> "ray.data.Dataset":
    """ONE bucketed exchange + ONE vectorized ``fold`` pass per output block.

    ``sort(bucket) + map_batches(fold, batch_size=None)`` instead of
    ``groupby(bucket).map_groups(fold)``: the sort already guarantees a
    bucket value never splits across output blocks (verified empirically —
    Ray's range partitioner sends boundary-equal rows to one side), so the
    fold sees unions of COMPLETE buckets and must be bucket-agnostic
    (vectorized over its inner semantic keys — every fold in this repo
    already is). Wins over map_groups: no per-group Python splitting loop
    (one pandas pass per block, ~20-40%% faster measured at 1M rows), and
    with the :func:`spread_num_buckets` domain there are no empty sort
    partitions, hence none of Ray's schemaless empty blocks.

    ``coalesce``: for TINY-ROW exchanges (hash/pair/partial shrink streams
    — fixed-width columns, no text payload), fold many small input blocks
    into few before the sort: the Sort op pays per-block fixed costs that
    dominate when the stream is thousands of ~250 KB blocks (measured:
    exact_dedup 1.65 s → 0.94 s at 1M rows with ``coalesce=1<<17``).
    Leave None when blocks carry text/binary payloads — there the copy
    costs more than the per-block overhead saved (measured on recombine).
    """
    # strip BEFORE the coalesce: _strip_md carries no resource override so
    # it fuses into the producer task and the b'pandas' metadata dies
    # there; coalesce breaks fusion (num_cpus=0), so the old
    # coalesce-then-strip order shipped metadata-carrying bundles across
    # two operator boundaries — each logging "Failed to hash the schemas"
    # once bundles go multi-block (sf0.1+)
    ds = _strip_md(ds)
    if coalesce:
        ds = coalesce_blocks(ds, coalesce)
    return ds.sort(bucket_col).map_batches(
        fold, batch_size=None, batch_format=batch_format)


def small_fold(partials: "ray.data.Dataset", fold,
               batch_format: str = "pyarrow") -> "ray.data.Dataset":
    """Final reduce for SMALL partials (≤ ~10⁷ rows after the combiner
    level): ``repartition(1)`` + ONE vectorized ``fold`` pass.

    Replaces ``groupby(keys).aggregate(...)`` where key cardinality is far
    below the cluster's block count — there Ray's sort-based Aggregate
    creates one reduce partition per input block, emits every surplus
    partition as a schemaless EMPTY block (schema-divergence warnings,
    fragile downstream unions) and pays its ~80 ms fixed cost per input
    block. The combiner level above has already shrunk the stream to
    O(#blocks × #groups) tiny rows, so one task folding them all is both
    cheaper and schema-stable. NOT for high-cardinality finals — those use
    :func:`bucket_fold`."""
    return _strip_md(partials).repartition(1).map_batches(
        fold, batch_format=batch_format, batch_size=None)


def _strip_md(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Fused zero-copy metadata strip ahead of an all-to-all: pandas
    blocks upstream convert to Arrow WITH the ``b'pandas'`` schema
    metadata, which makes every shuffle schema unhashable (the pd_table
    rationale, applied at the exchange boundary for all folds at once)."""
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow", batch_size=None)


def coalesce_blocks(ds: "ray.data.Dataset",
                    batch_size: int = 1 << 16) -> "ray.data.Dataset":
    """Fold many tiny blocks into few before an all-to-all. ``num_cpus=0``
    BREAKS operator fusion — fused, a coalescing map inherits the upstream
    task structure and its batch_size never crosses task boundaries, so
    the downstream Aggregate still pays its ~80 ms/block fixed cost per
    tiny partial block (and its sort emits empty partitions past the key
    cardinality)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow",
                          batch_size=batch_size, num_cpus=0)


def key_counts(ds: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    """Per-key row counts via per-batch partials (shuffles ≤ one row per key
    per batch — skew-safe). The partials coalesce before the Aggregate
    (CLAUDE.md rule: its ~80 ms/input-block fixed cost dominates on
    thousands of tiny partial blocks)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return coalesce_blocks(partials).groupby(key).aggregate(
        Sum("n", alias_name="n"))


def detect_hot_keys(ds: "ray.data.Dataset", key: str,
                    threshold_rows: int) -> set:
    """Keys owning more than ``threshold_rows`` rows. The threshold filter
    runs DISTRIBUTED, so only the hot set itself reaches the driver — by
    pigeonhole at most total_rows/threshold keys, never the full
    O(#distinct keys) count table."""
    import pyarrow.compute as pc

    hot = key_counts(ds, key).map_batches(
        lambda t: t.filter(pc.greater(t["n"], threshold_rows)),
        batch_format="pyarrow").to_pandas()
    return set(hot[key])


def salted_span_durations(
    ds: "ray.data.Dataset",
    hot_threshold: int = 10_000,
    num_buckets: int | None = None,
    chunk: int = 8192,
    salt: int = 8,
) -> "ray.data.Dataset":
    """span_durations with the two-pass salted plan WIRED (SURVEY §7.5):
    conversations longer than ``hot_threshold`` turns are split into
    turn-range chunks spread over ``salt`` buckets, so no single grouped task
    ever holds a whole hot conversation.

    The lead (next-turn ts) is order-dependent, so chunking needs a boundary
    fix: each hot chunk's LAST turn takes its `next ts` from the FIRST turn
    of the conversation's next non-empty chunk. That boundary table is built
    with per-batch partials (≤ one row per hot chunk per batch — tiny),
    reduced on the driver, and broadcast via ``ray.put``. Pass 1 =
    detect_hot_keys (partial counts); pass 2 = salted bucketed compute.
    Output is row-identical to stages.metrics.span_durations.
    """
    import ray

    from .stages.metrics import span_durations

    if num_buckets is None:
        num_buckets = spread_num_buckets()
    # Three executions of the PRUNED 5-column projection (counts,
    # boundary, compute) — the hot set gates the boundary build and the
    # broadcast boundary table gates the compute, so each pass depends on
    # the previous one's driver-side result. All three re-read only the
    # projected columns; callers passing an expensive derived chain
    # should materialize the projection first.
    cols = ds.select_columns(["conv_id", "turn_idx", "role", "tool", "ts"])
    hot = detect_hot_keys(cols, "conv_id", hot_threshold)
    if not hot:
        return span_durations(ds)

    # boundary table: first (min-turn) ts of every (hot conv, chunk)
    def boundary_partial(t: pa.Table) -> pa.Table:
        df = t.select(["conv_id", "turn_idx", "ts"]).to_pandas()
        df = df[df["conv_id"].isin(hot)]
        if not len(df):
            return pa.table({"conv_id": pa.array([], type=pa.string()),
                             "chunk_id": pa.array([], type=pa.int64()),
                             "turn_idx": pa.array([], type=pa.int32()),
                             "ts": pa.array([], type=pa.timestamp("us"))})
        df["chunk_id"] = (df["turn_idx"] // chunk).astype(np.int64)
        keep = df.loc[df.groupby(["conv_id", "chunk_id"])["turn_idx"].idxmin()]
        return pd_table(keep)

    bdf = cols.map_batches(boundary_partial, batch_format="pyarrow").to_pandas()
    bdf = bdf.loc[bdf.groupby(["conv_id", "chunk_id"])["turn_idx"].idxmin()]
    bdf = bdf.sort_values(["conv_id", "chunk_id"])
    # next non-empty chunk's first ts, per conv
    nxt_first = bdf.groupby("conv_id")["ts"].shift(-1)
    boundary = {(c, k): v for c, k, v in zip(
        bdf["conv_id"], bdf["chunk_id"], nxt_first) if not pd.isna(v)}
    boundary_ref = ray.put((hot, boundary))

    def tag(t: pa.Table) -> pa.Table:
        keys = t["conv_id"].to_pandas().to_numpy(dtype=object)
        sub = t["turn_idx"].to_pandas().to_numpy() // chunk
        b = salted_bucket(keys, sub, hot, num_buckets, salt)
        return t.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        hot_set, bnd = ray.get(boundary_ref)
        is_hot = g["conv_id"].isin(hot_set).to_numpy()
        chunk_id = np.where(is_hot, g["turn_idx"].to_numpy() // chunk, -1)
        g = g.assign(_chunk=chunk_id)
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        nxt = g.groupby(["conv_id", "_chunk"], sort=False)["ts"].shift(-1)
        # boundary fix: last row of each hot chunk takes the next chunk's
        # first ts (None at the true end of the conversation)
        last = nxt.isna().to_numpy() & (g["_chunk"].to_numpy() >= 0)
        if last.any():
            fix = [bnd.get((c, k)) for c, k in zip(
                g.loc[last, "conv_id"], g.loc[last, "_chunk"])]
            nxt = nxt.copy()
            nxt[last] = pd.Series(fix, index=nxt.index[last],
                                  dtype="datetime64[us]")
        dur = (nxt - g["ts"]).dt.total_seconds().fillna(0.0)
        out = g.assign(duration_s=dur)
        out = out[(out["role"] == "tool") & (out["tool"] != "")]
        return out[["conv_id", "turn_idx", "tool", "duration_s"]]

    return bucket_fold(cols.map_batches(tag, batch_format="pyarrow"),
                       "_bucket", per_bucket)


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
        # C-level membership — a per-row Python set lookup here runs on
        # every row of the stream (the repo's hot-path rule)
        is_hot = pd.Series(keys).isin(hot).to_numpy()
        sub = np.asarray(sub_id, dtype=np.int64)[is_hot] % salt
        bucket[is_hot] = (h[is_hot] + sub) % num_buckets
    return bucket.astype(np.int32)
