"""Schema-drift-tolerant multi-source reads.

At 100 TB a corpus is written by many pipeline versions: shards miss
columns that were added later, carry columns that were dropped, or hold
narrower integer types. The collector's wire formats tolerate this by
design (OTLP fields are additive); the batch-engine equivalent is aligning
every source's blocks to one target schema at the READ so every downstream
stage sees a stable shape.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def align_to_schema(schema: pa.Schema):
    """Batch fn: project to ``schema`` — missing columns become typed
    nulls, extra columns drop, mismatched types cast (safe=False so
    int32→int64 and similar widenings pass). Zero-copy for already-aligned
    columns; null columns are O(1) per batch."""

    def fn(t: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in t.column_names:
                c = t[f.name]
                cols.append(c if c.type == f.type
                            else c.cast(f.type, safe=False))
            else:
                cols.append(pa.nulls(t.num_rows, type=f.type))
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols], schema=schema)

    return fn


def read_parquet_evolved(paths: list[str], schema: pa.Schema,
                         **read_kwargs) -> "ray.data.Dataset":
    """Read several parquet sources whose schemas drifted apart and union
    them under one target schema. Each source streams independently
    (per-source column pruning still applies); alignment is a stateless
    map_batches, so the union is a zero-barrier concatenation of block
    streams."""
    parts = []
    for p in paths:
        cols = [f.name for f in schema]
        ds = ray.data.read_parquet(p, **read_kwargs)
        present = [c for c in cols if c in ds.schema().names]
        if present:
            ds = ds.select_columns(present)
        parts.append(ds.map_batches(align_to_schema(schema),
                                    batch_format="pyarrow"))
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out
