"""filelog receiver analogue: raw text log files → line records.

The reference's primary log receiver tails text files discovered by
include/exclude globs and emits one record per line with
``log.file.name`` / ``log.file.path`` attributes
(cmd/otelcol/config/collector/logs_config_linux.yaml filelog section:
`include:` glob arrays, `exclude:`, resource file attributes). This
module is the batch-engine equivalent: glob discovery with pruning
BEFORE the read (excluded bytes never leave storage), a streaming
``ray.data.read_text`` over the matched files (per-file blocks, so a
256-node cluster fans the tail out naturally), and a vectorized stamp
pass adding the file attributes plus the observed-timestamp fallback
the downstream ParseStage expects.
"""

from __future__ import annotations

import fnmatch
import glob as globmod
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .wire import combined


def discover_files(include: list[str],
                   exclude: list[str] | None = None) -> list[str]:
    """filelog include/exclude file discovery: glob-expand the include
    patterns, then drop any file whose basename OR full path matches an
    exclude pattern — the receiver's pruning order."""
    files = sorted({f for g in include for f in globmod.glob(g)
                    if os.path.isfile(f)})
    if exclude:
        files = [f for f in files
                 if not any(fnmatch.fnmatch(os.path.basename(f), e)
                            or fnmatch.fnmatch(f, e) for e in exclude)]
    return files


def read_log_lines(include: list[str],
                   exclude: list[str] | None = None,
                   observed_ts: "np.datetime64 | str" = "1970-01-01T00:00:00",
                   parallelism: int = -1) -> "ray.data.Dataset":
    """Read raw log files as a line-record Dataset: columns ``text`` (the
    line), ``log.file.name`` / ``log.file.path``, and ``ts`` (the constant
    observed-time fallback, deterministic analogue of the receiver's
    read-time stamp — ParseStage overwrites it wherever the line itself
    carries a timestamp)."""
    import ray.data

    files = discover_files(include, exclude)
    if not files:
        raise ValueError(f"include/exclude selected no files: {include!r}")
    ts = np.datetime64(observed_ts, "us")

    def stamp(batch: pa.Table) -> pa.Table:
        # the path column is constant per file block — basename the few
        # DICTIONARY values in Python, never the full line stream (a
        # pandas str.rpartition here ran a per-row object loop)
        enc = pc.dictionary_encode(combined(batch["path"]))
        names = pa.array([os.path.basename(p)
                          for p in enc.dictionary.to_pylist()],
                         type=pa.string())
        return pa.table({
            "text": batch["text"],
            "log.file.name": pc.take(names, enc.indices),
            "log.file.path": batch["path"],
            "ts": pa.array(np.full(batch.num_rows, ts),
                           type=pa.timestamp("us")),
        })

    ds = ray.data.read_text(files, include_paths=True,
                            override_num_blocks=parallelism
                            if parallelism > 0 else None)
    return ds.map_batches(stamp, batch_format="pyarrow")
