"""smartagent datapoint-filter semantics — the precedence-sensitive drop rules.

Ports the *semantics* (not the code) of the reference's filter stack
(citations into /root/reference):

- string filter: a list of items, each a static string, a ``/regex/`` (slash
  delimited), or a glob; ``!`` prefix negates an item; the filter matches if
  any positive item matches OR a negated item's pattern does NOT match...
  precisely: per-item match results are OR'd, with negated items contributing
  "does not match item" (internal/signalfx-agent/pkg/utils/filter/filter.go:29-103).
- overridable filter: metric-name filter AND dimension filters must all match
  for a drop (dpfilters/overridable.go:47-61); dimensions: every listed key
  must match (value may itself be a string-filter list).
- FilterSet: OR of exclude filters — a record is dropped if ANY exclude
  matches (dpfilters/set.go:18-36).
- include-override: items re-included by an include filter escape exclusion
  (pkg/receiver/smartagentreceiver/filtering.go:100-135,234-259 — default
  metrics → extraMetrics re-include → excludes; exclusion wins only if not
  re-included).

Everything here is driver-side rule *compilation*; evaluation is vectorized
pandas/numpy applied inside map_batches.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd


@dataclass
class _Item:
    negated: bool
    kind: str  # "static" | "regex" | "glob"
    pattern: str
    rx: re.Pattern | None = None


def _compile_item(raw: str) -> _Item:
    negated = raw.startswith("!")
    if negated:
        raw = raw[1:]
    if len(raw) > 1 and raw.startswith("/") and raw.endswith("/"):
        return _Item(negated, "regex", raw[1:-1], re.compile(raw[1:-1]))
    if any(ch in raw for ch in "*?[]"):
        rx = re.compile(fnmatch.translate(raw))
        return _Item(negated, "glob", raw, rx)
    return _Item(negated, "static", raw)


@dataclass
class StringFilter:
    """filter.go:29-103 — any-match over items, with per-item negation."""

    items: list[str]
    compiled: list[_Item] = field(init=False)

    def __post_init__(self) -> None:
        self.compiled = [_compile_item(i) for i in self.items]

    def matches(self, values: pd.Series) -> np.ndarray:
        out = np.zeros(len(values), dtype=bool)
        for it in self.compiled:
            if it.kind == "static":
                m = (values == it.pattern).to_numpy()
            else:
                m = values.str.fullmatch(it.rx.pattern).fillna(False).to_numpy()
            out |= (~m) if it.negated else m
        return out


@dataclass
class OverridableFilter:
    """overridable.go:47-61 — name filter AND all dimension filters match."""

    metric_names: list[str] | None = None
    dimensions: dict[str, list[str]] | None = None

    def __post_init__(self) -> None:
        self.name_f = StringFilter(self.metric_names) if self.metric_names else None
        self.dim_f = {
            k: StringFilter(v if isinstance(v, list) else [v])
            for k, v in (self.dimensions or {}).items()
        }

    def matches(self, df: pd.DataFrame, name_col: str = "name") -> np.ndarray:
        m = np.ones(len(df), dtype=bool)
        if self.name_f is not None:
            m &= self.name_f.matches(df[name_col])
        for k, f in self.dim_f.items():
            if k in df.columns:
                m &= f.matches(df[k].fillna(""))
            else:
                m[:] = False
        return m


@dataclass
class FilterSet:
    """set.go:18-36 — drop a record if ANY exclude matches and no include
    re-includes it (filtering.go:234-259 precedence)."""

    excludes: list[OverridableFilter]
    includes: list[OverridableFilter] = field(default_factory=list)

    def keep_mask(self, df: pd.DataFrame, name_col: str = "name") -> np.ndarray:
        excluded = np.zeros(len(df), dtype=bool)
        for f in self.excludes:
            excluded |= f.matches(df, name_col)
        for f in self.includes:  # re-include wins over exclusion
            excluded &= ~f.matches(df, name_col)
        return ~excluded
