"""splunk_otel_collector_ray — a Ray-Data-native log/telemetry engine.

A from-scratch reimplementation of the query & data-processing capabilities of
signalfx/splunk-otel-collector's receive→process→export **logs** path,
expressed as idiomatic `ray.data.Dataset` pipelines over Arrow batches:

- `corpus`     — deterministic synthetic transcript table (FIXTURES.md §1/§3)
- `sources`    — Parquet readers with column pruning (filelog/otlp analogues)
- `stages`     — map_batches stages: parse (stanza operator chain), attributes,
                 enrich (resourcedetection/k8sattributes), route (routing
                 connector), transform (OTTL), filters (smartagent dpfilters),
                 sample, recombine, dedup, text analysis, similarity search
- `pipelines`  — composed DAGs (flagship logs pipeline, aggregates)
- `state`      — per-partition lineage manifests for resumable export

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
