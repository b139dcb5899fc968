"""Per-partition lineage manifests — the engine's checkpoint/resume state.

Reference analogue: the collector's `file_storage` checkpoint extension
persists per-file read offsets with fsync+compaction so a restarted collector
resumes tailing exactly once
(/root/reference/cmd/otelcol/config/collector/splunk_logs_config_linux.yaml:21-27,50;
logs_config_linux.yaml:699-709). For a batch engine the equivalent unit of
progress is an input PARTITION (one corpus part file): a manifest records the
partition id, an input fingerprint (path/size/mtime), row counts and per-sink
routed counts, committed ATOMICALLY (tmp + rename) only after the partition's
output is fully written.

Resume protocol (exactly-once export under retries/restarts):
  1. a partition with a manifest whose fingerprint matches its input is
     COMPLETE → skipped entirely on rerun;
  2. a partition without a valid manifest may have partial output → its output
     subtree is DELETED, then reprocessed (output writes are idempotent per
     partition, so Ray-level task retries inside the run are also safe);
  3. manifests double as the lineage/metrics record (receiver-obsreport
     analogue: accepted row counts per stage, SURVEY.md §2.7).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from typing import Any


def input_fingerprint(path: str) -> str:
    """Cheap content fingerprint of one input file (path, size, mtime_ns)."""
    st = os.stat(path)
    key = f"{os.path.abspath(path)}|{st.st_size}|{st.st_mtime_ns}"
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def manifest_path(part_out_dir: str) -> str:
    return os.path.join(part_out_dir, "_MANIFEST.json")


def write_manifest(part_out_dir: str, payload: dict[str, Any]) -> None:
    """Atomic commit: the manifest's existence == the partition is complete."""
    os.makedirs(part_out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=part_out_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path(part_out_dir))


def read_manifest(part_out_dir: str) -> dict[str, Any] | None:
    p = manifest_path(part_out_dir)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def is_complete(part_out_dir: str, fingerprint: str) -> bool:
    m = read_manifest(part_out_dir)
    return bool(m) and m.get("fingerprint") == fingerprint


def reset_partition(part_out_dir: str) -> None:
    """Drop partial output of an incomplete partition before reprocessing."""
    if os.path.isdir(part_out_dir):
        shutil.rmtree(part_out_dir)
