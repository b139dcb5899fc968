"""Keyed correlation store with TTL reaping — the discovery receiver's
endpoint-correlation state, as a Ray actor.

Reference semantics: the discovery receiver tracks endpoint → receiver/
observer correlations in a keyed map and reaps stale entries on an interval
(/root/reference/internal/receiver/discoveryreceiver/correlation.go,
endpoint_tracker.go:114-130 emit loop, :165-215 updates), and its evaluators
dedup emitted statuses via an `alreadyLogged` LoadOrStore set
(evaluator.go:110-113).

This is the one genuinely *shared mutable index* in the reference — the
documented case where the Dataset API can't express the semantics and a raw
Ray actor is the right tool (build brief: "drop to raw Ray actors only where
the Dataset API genuinely can't express the semantics").
"""

from __future__ import annotations

import ray


@ray.remote
class CorrelationStore:
    """Shared keyed store: last-write-wins upsert + TTL reap + emit-once."""

    def __init__(self) -> None:
        self._items: dict[str, tuple[float, object]] = {}  # key -> (ts, value)
        self._emitted: dict[str, float] = {}  # key -> emit ts

    def upsert(self, key: str, value, ts: float) -> None:
        cur = self._items.get(key)
        if cur is None or ts >= cur[0]:
            self._items[key] = (ts, value)

    def get(self, key: str):
        cur = self._items.get(key)
        return None if cur is None else cur[1]

    def reap(self, ttl_seconds: float, now: float) -> int:
        """Drop entries older than ttl; returns number of reaped
        endpoints (endpoint_tracker's interval loop). Emit-once keys that
        were never upserted as endpoints age out by their own emit time —
        otherwise a long-running stream of one-shot status keys grows the
        dedup set without bound."""
        stale = [k for k, (ts, _) in self._items.items()
                 if now - ts > ttl_seconds]
        for k in stale:
            self._items.pop(k, None)
            self._emitted.pop(k, None)
        for k in [k for k, ts in self._emitted.items()
                  if k not in self._items and now - ts > ttl_seconds]:
            self._emitted.pop(k, None)
        return len(stale)

    def emit_once(self, key: str, now: float = 0.0) -> bool:
        """LoadOrStore dedup (evaluator.go:110-113): True only the first
        time a key is seen. ``now`` stamps the entry for TTL reaping."""
        if key in self._emitted:
            return False
        self._emitted[key] = now
        return True

    def size(self) -> int:
        return len(self._items)
