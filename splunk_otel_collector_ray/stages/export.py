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
    """map_batches stage: side-effect parquet export, partial-count output."""

    def __init__(self, out_dir: str, agg_keys: tuple[str, ...] = (
            "sink", "severity_text", "tool")) -> None:
        self.out_dir = out_dir
        self.agg_keys = list(agg_keys)

    def _fingerprint(self, batch: pa.Table) -> str:
        key = "|".join([
            str(batch["conv_id"][0]), str(batch["turn_idx"][0]),
            str(batch.num_rows),
        ])
        return hashlib.md5(key.encode()).hexdigest()[:16]

    def __call__(self, batch: pa.Table) -> pa.Table:
        fp = self._fingerprint(batch)
        for sink in pc.unique(batch["sink"]):
            part = batch.filter(pc.equal(batch["sink"], sink))
            d = os.path.join(self.out_dir, f"sink={sink}")
            os.makedirs(d, exist_ok=True)
            # deterministic name → idempotent under Ray task retries
            pq.write_table(part, os.path.join(d, f"part-{fp}.parquet"))
        counts = batch.group_by(self.agg_keys).aggregate([("sink", "count")])
        return counts.rename_columns([*self.agg_keys, "n"])
