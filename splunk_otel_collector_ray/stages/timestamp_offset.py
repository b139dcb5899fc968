"""In-tree `timestamp` processor — shift every timestamp by a fixed offset.

Reference: /root/reference/pkg/processor/timestampprocessor/factory.go:108-117
and log_processor.go:26-41 — adds a signed duration offset to Timestamp and
ObservedTimestamp of every record, passing zero (unset) timestamps through
unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class TimestampOffset:
    """map_batches stage: ts += offset_seconds (zero/null passthrough)."""

    offset_seconds: int = 3600
    columns: tuple[str, ...] = ("ts",)

    def __call__(self, batch: pa.Table) -> pa.Table:
        delta = pa.scalar(self.offset_seconds * 1_000_000, type=pa.duration("us"))
        for c in self.columns:
            if c not in batch.column_names:
                continue
            col = batch[c]
            shifted = pc.add(col, delta)  # nulls propagate (zero-ts passthrough)
            batch = batch.set_column(batch.column_names.index(c), c, shifted)
        return batch
