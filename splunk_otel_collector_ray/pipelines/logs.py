"""The flagship logs pipeline: read → parse → enrich → route → export/aggregate.

This is the Ray-Data expression of the reference's canonical logs service
(/root/reference/cmd/otelcol/config/collector/logs_config_linux.yaml:723-755:
``filelog* → [memory_limiter, batch] → splunk_hec``, plus the routing-connector
gateway wiring gateway_config.yaml:163-221):

    read_parquet(transcripts, columns pruned)          # filelog / otlp receive
      → map_batches(ParseStage,  pyarrow, actor pool)  # stanza operator chain
      → map_batches(EnrichStage, pyarrow, actor pool)  # resourcedetection/k8s
      → map_batches(RouteStage,  pyarrow)              # routing connector
      → write_parquet(out, partition_cols=["sink"])    # per-sink HEC exporters
      + grouped_count(sink[, severity, tool])          # count-connector/batch

Collector concerns we get from Ray Data for free (SURVEY.md §4): streaming
backpressure (memory_limiter), re-batching (batch processor), retries, and
per-stage parallelism. What stays explicit: per-partition manifests
(file_storage checkpoint analogue — state.manifest), stable
(conv_id, turn_idx) ordering at export, and partitioning/skew strategy.
"""

from __future__ import annotations

import os
import time
from typing import Any

import ray
import ray.data

from ..corpus import ensure_transcripts
from ..stages.enrich import EnrichStage, build_dim_table, make_enrich_fn
from ..stages.parse import ParseStage
from ..stages.route import RouteStage
from ..state import manifest as mf
from .aggregate import grouped_count

INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
PARSE_BATCH = 32_768


def read_transcripts(sf_dir: str, parallelism: int | None = None,
                     include: "list[str] | None" = None,
                     exclude: "list[str] | None" = None,
                     ) -> "ray.data.Dataset":
    """Read the transcript corpus for a testdata dir (generating if absent).

    ``include`` / ``exclude`` are filelog-style file glob lists
    (fnmatch on the basename; the receiver's include/exclude config,
    /root/reference/cmd/otelcol/config/collector/logs_config_linux.yaml:
    filelog `include:` arrays + `exclude:`): only matching part files are
    read — file pruning happens BEFORE the read, so excluded bytes never
    leave storage.
    """
    import fnmatch
    import os

    path = ensure_transcripts(sf_dir)
    if include or exclude:
        names = sorted(os.listdir(path))
        keep = []
        for n in names:
            if not n.endswith(".parquet"):
                continue
            if include and not any(fnmatch.fnmatch(n, g) for g in include):
                continue
            if exclude and any(fnmatch.fnmatch(n, g) for g in exclude):
                continue
            keep.append(os.path.join(path, n))
        if not keep:
            raise ValueError(
                f"include/exclude selected no files under {path!r}")
        return ray.data.read_parquet(
            keep, columns=INPUT_COLUMNS,
            override_num_blocks=parallelism)
    return ray.data.read_parquet(path, columns=INPUT_COLUMNS,
                                 override_num_blocks=parallelism)


def flagship_num_blocks(sf_dir: str, rows_per_task: int = 1 << 16) -> int:
    """Scale-adaptive input block count for the fused flagship chain:
    ~``rows_per_task`` rows per task, floored at 2 tasks per CPU.

    The fused read→parse→route→write chain inherits its task granularity
    from the read blocks, and both failure modes are real (r4 measured):
    per-row-group blocks at small scale → fewer tasks than CPUs when a
    downstream batch_size re-bundles (14 tasks on 32 cpus, half the
    cluster idle), and naive per-block tasks at large scale → thousands of
    tiny tasks each paying scheduler + per-sink-file overhead. Row counts
    come from parquet FOOTERS (no data read)."""
    n_rows = corpus_row_count(sf_dir)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2 * ncpu, n_rows // rows_per_task)


def corpus_row_count(sf_dir: str) -> int:
    """Total transcript rows for a scale dir, from parquet FOOTERS only."""
    import glob as _glob

    import pyarrow.parquet as pq

    path = ensure_transcripts(sf_dir)
    return sum(pq.read_metadata(f).num_rows
               for f in _glob.glob(os.path.join(path, "*.parquet")))


def build_logs_dataset(
    src: "str | ray.data.Dataset",
    routes: RouteStage | None = None,
    use_actors: bool = False,
    concurrency: tuple[int, int] | int | None = None,
) -> "ray.data.Dataset":
    """Compose parse → enrich → route over a transcript source (lazy).

    Default path: FUNCTION stages with per-process state caches — Ray fuses
    Read→parse→enrich→route into one task chain (zero intermediate
    materialization, no actor-pool ramp-up), which benchmarks ~2× faster at
    this state size. ``use_actors=True`` switches to the actor-pool form —
    the right shape when per-worker init is genuinely expensive (models,
    large dim caches; SURVEY.md §7.3).
    """
    # A string source gets the flagship's scale-adaptive read-block count:
    # the fused read→parse→enrich→route chain inherits task granularity
    # from the read blocks, and default per-row-group blocks underfill the
    # cluster at sf0.1 (measured 2.4 s vs 1.0 s for route_aggregate at 32
    # cpus) and swarm it at sf1.6+ — same rationale as run_flagship.
    ds = (read_transcripts(src, parallelism=flagship_num_blocks(src))
          if isinstance(src, str) else src)
    dims_ref = ray.put(build_dim_table())  # broadcast ONCE, read per worker
    if use_actors:
        if concurrency is None:
            # two pools must leave CPUs for read/route/write tasks, or the
            # pipeline deadlocks on small sessions (each pool reserves its
            # min actors up front)
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            per_pool = max(1, (ncpu - 2) // 2)
            concurrency = (1, per_pool)
        ds = ds.map_batches(
            ParseStage, batch_format="pyarrow", batch_size=PARSE_BATCH,
            concurrency=concurrency,
        )
        ds = ds.map_batches(
            EnrichStage, fn_constructor_kwargs={"dims": dims_ref},
            batch_format="pyarrow", batch_size=PARSE_BATCH,
            concurrency=concurrency,
        )
    else:
        ds = ds.map_batches(ParseStage.as_fn(), batch_format="pyarrow")
        ds = ds.map_batches(make_enrich_fn(dims_ref), batch_format="pyarrow")
    ds = ds.map_batches(routes or RouteStage(), batch_format="pyarrow")
    return ds


def sink_counts(ds: "ray.data.Dataset") -> dict[str, int]:
    """Per-sink routed-row counts (HEC LogRecordCount assertion analogue,
    /root/reference/tests/testutils/hec_receiver_sink.go:120-127)."""
    pdf = grouped_count(ds, ["sink"]).to_pandas()
    return dict(zip(pdf["sink"], pdf["n"].astype(int)))


def run_flagship(sf_dir: str, out_dir: str) -> dict[str, Any]:
    """End-to-end run: export per-sink Parquet + per-sink aggregates.

    ONE streaming pass: the write-through SinkWriter stage exports each
    batch's per-sink parquet and emits partial (sink, severity, tool) counts;
    the only shuffled rows are those partials (collector exporter+obsreport
    coupling, see stages/export.py). Aggregates land next to the sink dirs.
    """
    from ray.data import DataContext

    from ..stages.export import SinkWriter
    from .aggregate import _sum_combine

    keys = ["sink", "severity_text", "tool"]

    t0 = time.time()
    ctx = DataContext.get_current()
    prev_reserve = ctx.op_resource_reservation_enabled
    # map-only chain (read → fused map → combine): per-operator resource
    # reservation idles ~45% of CPUs here (measured 15.5 s vs 13.3 s at
    # sf1.6/32) and exists to protect all-to-all ops this pipeline doesn't
    # have — disable for the run, restore after. BUT reservation is also
    # what bounds the read op's buffering: with it off and a stream
    # LARGER than the object store, the read runs ahead of the fused map,
    # fills the store, and spills the overflow to disk (measured at
    # sf51.2: 56 GB stream vs 37.6 GB store → ~40 GB spill → OutOfDisk).
    # Scope it off only when the footer-estimated decoded stream
    # (~115 B/turn measured across soaks) fits in the store with headroom
    # — i.e. even a fully-run-ahead read cannot overflow it (sf25.6's
    # 29 GB stream ran spill-free in 37.6 GB under exactly that regime).
    est_stream = corpus_row_count(sf_dir) * 115
    store = int(ray.cluster_resources().get("object_store_memory", 0))
    if est_stream < 0.8 * (store or float("inf")):
        ctx.op_resource_reservation_enabled = False
    try:
        ds = build_logs_dataset(
            read_transcripts(sf_dir,
                             parallelism=flagship_num_blocks(sf_dir)))
        routed_dir = os.path.join(out_dir, "by_sink")
        os.makedirs(routed_dir, exist_ok=True)
        partials = ds.map_batches(SinkWriter(routed_dir),
                                  batch_format="pyarrow")
        # partial counts are bounded by #blocks × #groups; the shared
        # coalescing combine level (aggregate._sum_combine — carries the
        # num_cpus=0 fusion break and the 65k batch_size rationale) folds
        # ~2000 blocks into one, so the driver-side final sum sees
        # O(#groups) rows
        pre = _sum_combine(partials, keys, ["n"])
        agg_pdf = pre.to_pandas()
        agg_pdf = agg_pdf.groupby(keys, as_index=False)["n"].sum()
        stats_path = os.environ.get("GRAFT_FLAGSHIP_STATS")
        if stats_path:  # archive the executed chain's ds.stats() (soak
            with open(stats_path, "w") as f:  # evidence, SCALE.md audits)
                f.write(pre.stats())
    finally:
        ctx.op_resource_reservation_enabled = prev_reserve
    t_route = time.time() - t0

    agg_dir = os.path.join(out_dir, "aggregates")
    os.makedirs(agg_dir, exist_ok=True)
    import pyarrow.parquet as pq

    from ..partitioning import pd_table

    pq.write_table(pd_table(agg_pdf),
                   os.path.join(agg_dir, "sink_severity_tool.parquet"))
    counts = agg_pdf.groupby("sink")["n"].sum().astype(int).to_dict()
    return {
        "rows": int(agg_pdf["n"].sum()),
        "sink_counts": counts,
        "routed_dir": routed_dir,
        "aggregate_dir": agg_dir,
        "sec_route": round(t_route, 3),
        "sec_total": round(time.time() - t0, 3),
    }


def run_resumable(sf_dir: str, out_dir: str) -> dict[str, Any]:
    """Flagship run with per-partition manifests and exactly-once resume.

    Partition = one input part file (a conversation never spans part files).
    Completed partitions (valid manifest, matching fingerprint) are skipped;
    incomplete ones have their output reset and are reprocessed in ONE Ray
    Dataset job (so the streaming executor still pipelines across partitions).

    ``sf_dir`` may be a testdata scale dir (corpus generated on demand) or a
    directory that already contains ``*.parquet`` part files.
    """
    # A directory is a ready corpus when its parquet files carry the
    # transcript schema — name-based detection ("part-" prefix) silently
    # rerouted validly-named user part files to fixture generation.
    def _is_corpus_dir(d: str) -> bool:
        if not os.path.isdir(d):
            return False
        import pyarrow.parquet as pq
        return any(
            set(INPUT_COLUMNS) <=
            set(pq.read_schema(os.path.join(d, f)).names)
            for f in sorted(os.listdir(d)) if f.endswith(".parquet"))

    src = sf_dir if _is_corpus_dir(sf_dir) else ensure_transcripts(sf_dir)
    parts = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    todo: list[tuple[str, str, str]] = []  # (part_id, input_path, fingerprint)
    skipped = []
    for p in parts:
        part_id = os.path.splitext(os.path.basename(p))[0]
        fp = mf.input_fingerprint(p)
        pdir = os.path.join(out_dir, f"part={part_id}")  # hive layout dir
        if mf.is_complete(pdir, fp):
            skipped.append(part_id)
        else:
            mf.reset_partition(pdir)
            todo.append((part_id, p, fp))

    processed: dict[str, dict] = {}
    if todo:
        from ..stages.export import SinkWriter

        ds = ray.data.read_parquet(
            [p for _, p, _ in todo], columns=INPUT_COLUMNS, include_paths=True
        )
        import pyarrow as pa
        import pyarrow.compute as pc

        def tag_part(t: "pa.Table") -> "pa.Table":
            base = pc.replace_substring_regex(t["path"], r"^.*/|\.parquet$", "")
            return t.drop_columns(["path"]).append_column("part", base)

        ds = ds.map_batches(tag_part, batch_format="pyarrow")
        ds = build_logs_dataset(ds)
        # single pass: per-partition per-sink export + lineage partials
        # (manifest counts come from the SAME pass, no output re-read)
        partials = ds.map_batches(
            SinkWriter(out_dir, partition_col="part"), batch_format="pyarrow")
        pkeys = ["part", "sink", "severity_text", "tool"]

        from .aggregate import _sum_combine

        # _sum_combine's num_cpus=0 keeps the combine a SEPARATE zero-cost
        # operator: fused, its batch_size would re-batch SinkWriter's input
        # across file boundaries, breaking the batch-per-partition
        # invariant asserted in export.py
        cpdf = (
            _sum_combine(partials, pkeys, ["n"])
            .to_pandas()
            .groupby(pkeys, as_index=False)["n"].sum()
        )
        # one pass over the combined frame, not one full scan per part
        by_part = dict(tuple(cpdf.groupby("part")))
        empty = cpdf.iloc[0:0]
        for part_id, p, fp in todo:
            sub = by_part.get(part_id, empty)
            sinks = sub.groupby("sink")["n"].sum().astype(int)
            payload = {
                "partition": part_id,
                "input": p,
                "fingerprint": fp,
                "rows": int(sub["n"].sum()),
                "sink_counts": sinks.to_dict(),
                # batch-processor roll-up analogue: per-severity counters
                "severity_counts": sub.groupby("severity_text")["n"].sum()
                .astype(int).to_dict(),
            }
            mf.write_manifest(os.path.join(out_dir, f"part={part_id}"), payload)
            processed[part_id] = payload
    return {"skipped": skipped, "processed": processed, "out_dir": out_dir}
