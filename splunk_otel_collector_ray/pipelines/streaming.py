"""Incremental micro-batch execution — continuous-collector semantics in
batch form.

Reference analogue: a running collector consumes an unbounded stream and its
aggregate connectors (count/sum — internal/receiver, SURVEY §2.7/§2.12) keep
state across arrivals. The batch equivalent is a micro-batch fold: process
each newly-arrived input shard once, merge its PARTIAL aggregate into a small
durable state table, and commit atomically so a restarted run resumes exactly
once — the same checkpoint discipline as `state/manifest` (file_storage
analogue), applied to aggregate state instead of export output.

Commit protocol (single-rename atomicity): each processed shard writes a new
`state-v{N}.parquet`, THEN flips `CURRENT.json` (tmp + rename) recording the
version and the full processed-shard list. A crash between the two leaves the
old pointer — the half-written state file is ignored and the shard replays.

Scale shape: only per-shard PARTIAL aggregates (bounded by group cardinality)
leave the cluster; the stream itself is processed by the normal distributed
pipeline per shard. For aggregate cardinalities too large for the driver,
swap the pandas fold for a Dataset union + groupby over the state parquet —
the commit protocol is unchanged.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable
from typing import Any

import pandas as pd

import ray.data


def _read_pointer(out_dir: str) -> dict[str, Any]:
    try:
        with open(os.path.join(out_dir, "CURRENT.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"version": 0, "shards": []}


def _fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _flip_pointer(out_dir: str, payload: dict[str, Any]) -> None:
    """Durable atomic pointer flip (the manifest.write_manifest idiom):
    fsync the payload BEFORE the rename — a pointer that survives a crash
    must never name a state file whose bytes didn't."""
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(out_dir, "CURRENT.json"))


def run_incremental(
    shards: "list[tuple[str, Callable[[], ray.data.Dataset]]]",
    out_dir: str, keys: list[str], alias: str = "n",
) -> pd.DataFrame:
    """Fold micro-batch shards into a durable grouped-count state table.

    ``shards`` is an ordered list of (shard_id, dataset_factory); shards
    already recorded in the committed pointer are skipped (exactly-once
    under rerun/restart). Returns the current state sorted by ``keys``.
    """
    from .aggregate import grouped_count

    os.makedirs(out_dir, exist_ok=True)
    cur = _read_pointer(out_dir)
    done = set(cur["shards"])
    state = (pd.read_parquet(
        os.path.join(out_dir, f"state-v{cur['version']}.parquet"))
        if cur["version"] else
        pd.DataFrame({**{k: pd.Series(dtype=object) for k in keys},
                      alias: pd.Series(dtype="int64")}))
    for shard_id, factory in shards:
        if shard_id in done:
            continue
        part = grouped_count(factory(), keys, alias=alias).to_pandas()
        state = (pd.concat([state, part], ignore_index=True)
                 .groupby(keys, as_index=False)[alias].sum())
        version = cur["version"] + 1
        state_path = os.path.join(out_dir, f"state-v{version}.parquet")
        state.to_parquet(state_path, index=False)
        # the state bytes must be durable BEFORE the pointer names them —
        # otherwise a crash after the (durable) pointer rename leaves a
        # committed version whose parquet is truncated, with the shard
        # marked done (silent loss + permanent read failure on restart)
        _fsync_file(state_path)
        cur = {"version": version, "shards": sorted(done | {shard_id})}
        _flip_pointer(out_dir, cur)
        done.add(shard_id)
    return (state.sort_values(keys, kind="mergesort")
            .reset_index(drop=True).astype({alias: "int64"}))
