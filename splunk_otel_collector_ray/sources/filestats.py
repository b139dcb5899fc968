"""filestats receiver analogue — stat-listing captures → file metrics.

The reference registers the contrib ``filestatsreceiver``
(/root/reference/internal/components/components.go:226), which globs a
path pattern and emits per-file gauges from ``stat()``: ``file.size``
(bytes), ``file.mtime`` / ``file.atime`` (epoch seconds), with
``file.name`` / ``file.path`` attributes.  The filesystem poll is out
of scope for a batch engine; the capture is one stat-listing JSONL dump
(one object per matched file with the stat fields), and this module is
the conversion to the receiver's metric columns.

Scale shape: the listing is one row per matched file — snapshot-bounded
like the procfs/docker captures, independent of the log volume behind
the files.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa

FILESTATS_SHARDS = 4

_OUT_SCHEMA = pa.schema([
    ("file_name", pa.string()),
    ("file_path", pa.string()),
    ("size_bytes", pa.int64()),     # file.size gauge
    ("mtime_s", pa.int64()),        # file.mtime gauge (epoch seconds)
    ("atime_s", pa.int64()),        # file.atime gauge (epoch seconds)
])


def encode_stat_line(path: str, size: int, mtime_s: int,
                     atime_s: int) -> str:
    return json.dumps({"path": path, "size": int(size),
                       "mtime": int(mtime_s), "atime": int(atime_s)})


def read_filestats_dump(staging_dir: str) -> "ray.data.Dataset":
    """Stat-listing dump → one row per file with the receiver's gauge
    columns; ``file.name`` is the basename of the captured path (the
    receiver's attribute split)."""
    import ray.data

    files = sorted(glob.glob(os.path.join(staging_dir, "stat-*.jsonl")))
    if not files:
        raise FileNotFoundError(
            f"no stat-*.jsonl files under {staging_dir!r} — empty or "
            "mistyped staging dir")

    def decode(batch: dict) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in _OUT_SCHEMA}
        for line in batch["text"]:
            st = json.loads(line)
            cols["file_name"].append(os.path.basename(st["path"]))
            cols["file_path"].append(st["path"])
            cols["size_bytes"].append(st["size"])
            cols["mtime_s"].append(st["mtime"])
            cols["atime_s"].append(st["atime"])
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in _OUT_SCHEMA],
            schema=_OUT_SCHEMA)

    return ray.data.read_text(files).map_batches(
        decode, batch_format="numpy")
