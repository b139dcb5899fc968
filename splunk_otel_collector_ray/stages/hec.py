"""HEC event-envelope projection — the splunk_hec exporter's row format.

Reference semantics: the splunk_hec exporter serializes each log record into
the HEC event envelope ``(time, host, source, sourcetype, index, event,
fields)``, with source/sourcetype/index driven by the well-known
``com.splunk.*`` resource attributes and per-exporter overrides
(/root/reference/examples/otel-logs-with-sourcetypes-splunk/otel-collector-config.yml:5-10,
examples/otel-logs-processor-splunk/otel-collector-config.yml:35-37,
cmd/otelcol/config/collector/logs_config_linux.yaml:672-692; SURVEY.md §1.2).

Ray mapping: a final vectorized projection `map_batches` before the per-sink
write — epoch-seconds `time`, envelope columns from the enrichment/resource
columns, `event` = body, `index` from the routing sink (the index-routing
example maps attribute values to indexes exactly this way).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

# sink → Splunk index (examples/otel-logs-routing/otel-collector-config.yml:
# one exporter per index; our sinks play the exporter role)
DEFAULT_INDEX_MAP = {
    "sink_tools": "tools",
    "sink_errors": "errors",
    "sink_assistant": "assistant",
    "sink_default": "main",
}


@dataclass
class HecProjection:
    """map_batches stage: routed+enriched records → HEC envelope columns.

    Gating flags (cmd/otelcol/config/collector/agent_config.yaml:175-186,
    logs_config_linux.yaml:682-692): ``profiling_data_enabled: false``
    drops profiling records, ``log_data_enabled: false`` drops everything
    else — the paired-exporter pattern where splunk_hec carries logs and
    splunk_hec/profiling carries only profiling data. A record is
    profiling data when its ``com.splunk.sourcetype`` equals
    ``profiling_sourcetype`` (the upstream otel.profiling scope constant).
    """

    index_map: dict[str, str] = field(default_factory=lambda: dict(DEFAULT_INDEX_MAP))
    default_index: str = "main"
    log_data_enabled: bool = True
    profiling_data_enabled: bool = True
    profiling_sourcetype: str = "otel.profiling"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not (self.log_data_enabled and self.profiling_data_enabled):
            # null sourcetype = log data, not profiling — coalesce so the
            # record can't vanish from BOTH paired exporters
            is_prof = pc.fill_null(
                pc.equal(batch["com.splunk.sourcetype"],
                         self.profiling_sourcetype), False)
            if not self.profiling_data_enabled:
                keep = pc.invert(is_prof)
            else:
                keep = is_prof
            if not self.log_data_enabled and not self.profiling_data_enabled:
                keep = pa.array([False] * batch.num_rows)
            batch = batch.filter(keep)
        # epoch seconds with fractional part (HEC `time` field semantics)
        t_us = pc.cast(batch["ts"], pa.int64())
        time_s = pc.divide(pc.cast(t_us, pa.float64()), 1_000_000.0)
        idx = batch["sink"]
        index = idx
        for sink, ix in self.index_map.items():
            index = pc.if_else(pc.equal(idx, sink), pa.scalar(ix), index)
        index = pc.if_else(
            pc.is_in(index, value_set=pa.array(list(self.index_map.values()))),
            index, pa.scalar(self.default_index))
        return pa.table({
            "time": time_s,
            "host": batch["host.name"],
            "source": batch["com.splunk.source"],
            "sourcetype": batch["com.splunk.sourcetype"],
            "index": index,
            "event": batch["body"],
            # passthrough identity for equality checks downstream
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
        })
