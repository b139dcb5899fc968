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
    nulls, extra columns drop, mismatched types cast SAFELY (widenings
    like int32→int64 are already safe casts; a safe narrowing cast checks
    the actual values, so a wide shard whose values fit still aligns, and
    one whose values overflow raises instead of silently wrapping —
    drift tolerance must never corrupt keys). Zero-copy for
    already-aligned columns; null columns are O(1) per batch."""

    def fn(t: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in t.column_names:
                c = t[f.name]
                cols.append(c if c.type == f.type else c.cast(f.type))
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
    if not paths:
        raise ValueError("read_parquet_evolved needs at least one source")
    parts = []
    for p in paths:
        cols = [f.name for f in schema]
        ds = ray.data.read_parquet(p, **read_kwargs)
        names = ds.schema().names
        present = [c for c in cols if c in names]
        if present:
            ds = ds.select_columns(present)
        else:
            # fully-drifted shard: keep ONE column as the row carrier
            # (preferring a fixed-width one) instead of reading every
            # possibly-wide column only to null it all out
            sch = ds.schema().base_schema
            narrow = [f.name for f in sch
                      if not (pa.types.is_string(f.type)
                              or pa.types.is_large_string(f.type)
                              or pa.types.is_binary(f.type)
                              or pa.types.is_large_binary(f.type))]
            ds = ds.select_columns([narrow[0] if narrow else names[0]])
        parts.append(ds.map_batches(align_to_schema(schema),
                                    batch_format="pyarrow"))
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out
