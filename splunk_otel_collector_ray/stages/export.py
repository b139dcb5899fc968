"""Write-through per-sink exporter — export + aggregate in ONE streaming pass.

The collector's exporter path couples the send with its observability
counters: splunk_hec serializes a batch to per-index HEC events while
obsreport counts accepted records (SURVEY.md §2.7;
/root/reference/pkg/receiver/smartagentreceiver/output.go:219,243-245). The
Ray-Data expression: a `map_batches` stage that

  1. splits its batch by the routing `sink` column,
  2. writes each split to ``out_dir/sink=<sink>/part-<fp>.parquet``, where
     ``<fp>`` is a DETERMINISTIC fingerprint of the batch content (first
     conv_id/turn_idx + row count) — a retried task overwrites the same file,
     so task retries stay exactly-once,
  3. emits only the tiny per-(sink, severity, tool) partial counts as its
     output batch — the downstream groupby aggregates partials, not rows.

Compared with write_parquet + re-read, this halves the passes over the full
stream: the export IS the aggregate's input. At 100 TB the re-read pass is a
second full scan; here the shuffle moves only #batches × #groups rows.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


class SinkWriter:
    """map_batches stage: side-effect parquet export, partial-count output.

    With ``partition_col`` set (e.g. a lineage ``part`` id tagged from the
    input file), each batch's rows land under
    ``out_dir/<partition_col>=<v>/sink=<s>/`` and the partial counts carry the
    partition id — one streaming pass yields resumable per-partition output
    AND its lineage metrics (see pipelines/logs.run_resumable)."""

    def __init__(self, out_dir: str, agg_keys: tuple[str, ...] = (
            "sink", "severity_text", "tool"),
            partition_col: str | None = None) -> None:
        self.out_dir = out_dir
        self.agg_keys = list(agg_keys)
        self.partition_col = partition_col

    def _fingerprint(self, batch: pa.Table) -> str:
        # first row + last row + count: disjoint ordered batches can't collide
        # (same endpoints + same count ⇒ same block under a fixed input order)
        n = batch.num_rows
        key = "|".join([
            str(batch["conv_id"][0]), str(batch["turn_idx"][0]),
            str(batch["conv_id"][n - 1]), str(batch["turn_idx"][n - 1]),
            str(n),
        ])
        return hashlib.md5(key.encode()).hexdigest()[:16]

    def __call__(self, batch: pa.Table) -> pa.Table:
        group_keys = list(self.agg_keys)
        if self.partition_col is not None:
            group_keys = [self.partition_col, *group_keys]
        if batch.num_rows == 0:  # filtered-empty upstream: no files, no counts
            counts = batch.group_by(group_keys).aggregate([("sink", "count")])
            return counts.rename_columns([*group_keys, "n"])
        if batch["sink"].null_count:
            # a null sink would silently vanish: pc.equal(col, null) masks
            # to no rows, so the export would drop the rows while creating
            # a phantom sink=None dir — fail loudly instead (the routing
            # stage always assigns a sink; null means an upstream bug)
            raise ValueError(
                f"{batch['sink'].null_count} rows with a null 'sink' "
                "reached SinkWriter — the routing stage must assign every "
                "row a sink (use an explicit default route)")
        fp = self._fingerprint(batch)
        subdirs = [""]
        if self.partition_col is not None:
            parts = pc.unique(batch[self.partition_col])
            if len(parts) != 1:  # not assert: must hold under python -O —
                # a silent miss would file rows under the wrong partition
                # while the counts stay keyed correctly, breaking resume
                raise RuntimeError(
                    "a batch must not span input partitions (blocks never "
                    f"span files): saw {parts}")
            subdirs = [f"{self.partition_col}={parts[0]}"]
        for sink in pc.unique(batch["sink"]):
            part = batch.filter(pc.equal(batch["sink"], sink))
            d = os.path.join(self.out_dir, subdirs[0], f"sink={sink}")
            os.makedirs(d, exist_ok=True)
            # deterministic name → idempotent under Ray task retries
            pq.write_table(part, os.path.join(d, f"part-{fp}.parquet"))
        counts = batch.group_by(group_keys).aggregate([("sink", "count")])
        return counts.rename_columns([*group_keys, "n"])
