"""Stateful enrichment — resourcedetection / k8sattributes / resource analogues.

Reference semantics (citations into /root/reference):
- `resourcedetection`: probe detectors once, then stamp the same resource
  attributes on every record; `override: true`
  (cmd/otelcol/config/collector/agent_config.yaml:130-137;
  tests/general/splunk_platform_logs_test.go:104-107).
- `k8sattributes`: enrich each record with pod/namespace/node metadata from a
  watched state cache, associated by record identity
  (internal/components/components.go:325; docs/components.md).
- `resource` processor: stamp `com.splunk.source` / `com.splunk.sourcetype`
  (examples/otel-logs-with-sourcetypes-splunk/otel-collector-config.yml:3-21;
  splunk_logs_config_linux.yaml:56-61).
- extraDimensions override-merge: enrichment dims WIN over record attrs
  (pkg/receiver/smartagentreceiver/output.go:256-259).

Ray-Data-first mapping: the dimension state is a SMALL table → broadcast once
with `ray.put` and look it up inside an actor-pool `map_batches` stage
(`__init__` resolves the ObjectRef once per actor — the k8s watch cache
analogue; `__call__` is a vectorized take per batch). No shuffle join.

The fixture dimension table (FIXTURES.md §5) is keyed on a conv bucket. The
bucket function must be computable by the DuckDB oracle too, so it is the
numeric conv_id suffix mod 64 (a stand-in for hash(conv_id) % 64 — at real
scale swap in a proper hash; the engine only needs *some* deterministic
record→dim association, exactly like pod-IP association in k8sattributes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_BUCKETS = 64
NAMESPACES = ["ns-app", "ns-infra", "ns-batch", "ns-web"]
PROVIDERS = ["aws", "gcp", "azure"]

# resource-processor constants (resourcedetection/system + resource stamping)
SOURCE = "transcripts"


def build_dim_table() -> pd.DataFrame:
    """Deterministic 64-row dimension table (FIXTURES.md §5)."""
    b = np.arange(N_BUCKETS)
    return pd.DataFrame(
        {
            "dim_key": b,
            "k8s.pod.name": [f"pod-{i:02d}" for i in b],
            "k8s.namespace.name": [NAMESPACES[i % 4] for i in b],
            "cloud.provider": [PROVIDERS[i % 3] for i in b],
            "host.name": [f"host-{i % 8}" for i in b],
        }
    )


def conv_bucket(conv_id_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """conv-00000123 -> 123 % 64 (SQL: CAST(conv_id[6:] AS INT) % 64).

    Arrow-native: slice+cast are C kernels; no per-row Python strings."""
    import pyarrow.compute as pc

    seq = pc.cast(pc.utf8_slice_codeunits(conv_id_col, 5, 32), pa.int64())
    arr = seq.to_numpy(zero_copy_only=False) if isinstance(
        seq, (pa.Array, pa.ChunkedArray)) else np.asarray(seq)
    return arr % N_BUCKETS


class EnrichStage:
    """Actor-pool `map_batches` stage: broadcast-dim lookup + resource stamp.

    ``dims`` may be a pandas DataFrame or a ``ray.ObjectRef`` to one (use
    ``ray.put(build_dim_table())`` on the driver — shipped once per actor,
    not per batch).
    """

    DIM_COLS = ["k8s.pod.name", "k8s.namespace.name", "cloud.provider", "host.name"]

    def __init__(self, dims=None) -> None:
        import ray

        if dims is None:
            dims = build_dim_table()
        if isinstance(dims, ray.ObjectRef):
            dims = ray.get(dims)
        dims = dims.sort_values("dim_key").reset_index(drop=True)
        # dense bucket index -> small Arrow value arrays; per batch the join
        # is one C-level take (no Python string objects)
        self.lookup = {
            c: pa.array(dims[c].tolist(), type=pa.string())
            for c in self.DIM_COLS
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = pa.array(conv_bucket(batch.column("conv_id")), type=pa.int32())
        cols = dict(zip(batch.column_names, batch.columns))
        # enrichment dims OVERRIDE existing record columns of the same name
        # (extraDimensions merge semantics, output.go:256-259)
        for c in self.DIM_COLS:
            cols[c] = pc.take(self.lookup[c], b)
        cols["com.splunk.source"] = pa.nulls(
            batch.num_rows, pa.string()).fill_null(SOURCE)
        # sourcetype := detected format family (the per-source sourcetype
        # stamping of otel-logs-with-sourcetypes-splunk)
        cols["com.splunk.sourcetype"] = batch.column("log_format")
        return pa.table(cols)


def enrich_via_join(ds, dims: pd.DataFrame | None = None,
                    num_partitions: int | None = None):
    """Shuffle hash-join variant of the enrichment — the path for a
    dimension side too large to broadcast (contrast EnrichStage's broadcast
    lookup; ray_guide "both sides large"). Uses ``Dataset.join`` hash-
    partitioned on the association key; every record row moves once, so use
    ONLY when the dim table genuinely can't ride `ray.put`.
    """
    import ray
    import ray.data

    if num_partitions is None:
        # join spawns one aggregator actor per partition; cap below the CPU
        # count or the pool deadlocks on small sessions
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, ncpu // 2))

    dims_ds = ray.data.from_pandas(dims if dims is not None else build_dim_table())

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "dim_key", pa.array(conv_bucket(t.column("conv_id")),
                                type=pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    # aggregators at num_cpus=0: they buffer/finalize; whole-CPU requests
    # can starve the concurrently running map tasks on small clusters
    return keyed.join(dims_ds, join_type="inner",
                      num_partitions=num_partitions, on=("dim_key",),
                      aggregator_ray_remote_args={"num_cpus": 0})


def make_enrich_fn(dims_ref):
    """Function-stage variant: per-process cached EnrichStage over a broadcast
    dims ObjectRef — fuses with adjacent task stages (no actor-pool ramp-up).
    Use the class form for heavyweight dimension state (real k8s caches)."""
    cache: dict[str, EnrichStage] = {}

    def enrich_batch(batch: pa.Table) -> pa.Table:
        if "e" not in cache:
            cache["e"] = EnrichStage(dims_ref)
        return cache["e"](batch)

    return enrich_batch
