"""`attributes` / `resource` processor — action lists over record fields.

Reference semantics (/root/reference/cmd/otelcol/config/collector/
full_config_linux.yaml:397-470): an ordered list of actions applied per
record: ``insert`` (only if absent), ``update`` (only if present), ``upsert``,
``delete``, ``extract`` (regex with named capture groups → new attributes),
``hash`` (value → sha1 digest per the upstream attributesprocessor), plus the
smartagent ``extraDimensions`` override-merge
(pkg/receiver/smartagentreceiver/output.go:256-259).

Columnar mapping: this engine promotes attributes to real Arrow columns
(SURVEY.md §1.3), so the open-map actions become column ops — absent key ==
null cell (or missing column). All vectorized; `extract` is one
str.extract per action; `hash` is a vectorized sha over the UTF-8 bytes.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa


@dataclass
class Action:
    action: str                 # insert|update|upsert|delete|extract|hash
    key: str
    value: str | None = None    # for insert/update/upsert
    pattern: str | None = None  # for extract
    algo: str = "sha1"          # for hash (any hashlib algorithm name)


@dataclass
class AttributesStage:
    """Ordered action list as one vectorized map_batches stage.

    ``include`` is the processor-level match guard (strict/regexp include of
    full_config_linux.yaml:438-443 / the attribute-gated routing of
    examples/otel-logs-processor-splunk): a dict of column → string-filter
    items (see stages/filters.StringFilter); when set, actions apply ONLY to
    matching rows and the rest pass through untouched.
    """

    actions: list[Action] = field(default_factory=list)
    include: dict[str, list[str]] | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.include:
            import numpy as np

            from .filters import StringFilter

            full = batch.to_pandas()
            m = np.ones(len(full), dtype=bool)
            for col, items in self.include.items():
                if col in full.columns:
                    m &= StringFilter(items).matches(full[col].fillna(""))
                else:
                    m[:] = False
            changed = self._apply(full[m])
            # untouched rows keep their values; new columns become null there
            out = full.copy()
            for c in changed.columns:
                if c not in out.columns:
                    out[c] = None
            out.loc[m, list(changed.columns)] = changed.to_numpy()
            dropped = [c for c in out.columns if c not in changed.columns]
            # a delete action only drops the column where the guard matched;
            # with a guard present the column survives (nulls where deleted)
            for c in dropped:
                out.loc[m, c] = None
            return pa.Table.from_pandas(out, preserve_index=False)
        return pa.Table.from_pandas(self._apply(batch.to_pandas()),
                                    preserve_index=False)

    def _apply(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for a in self.actions:
            if a.action == "insert":
                if a.key not in df.columns:
                    df[a.key] = a.value
                else:
                    df[a.key] = df[a.key].where(df[a.key].notna(), a.value)
            elif a.action == "update":
                if a.key in df.columns:
                    df.loc[df[a.key].notna(), a.key] = a.value
            elif a.action == "upsert":
                df[a.key] = a.value
            elif a.action == "delete":
                df.drop(columns=[a.key], errors="ignore", inplace=True)
            elif a.action == "extract":
                rx = re.compile(a.pattern)
                g = df[a.key].str.extract(rx)
                for col in g.columns:
                    df[col] = g[col]
            elif a.action == "hash":
                if a.key in df.columns:
                    h = getattr(hashlib, a.algo)
                    df[a.key] = [
                        h(v.encode()).hexdigest() if isinstance(v, str) else v
                        for v in df[a.key]
                    ]
            else:
                raise ValueError(f"unknown action {a.action!r}")
        return df


def group_by_attrs(ds, keys: list[str], map_col: str = "attributes"):
    """`groupbyattrs` processor with real record-regrouping semantics
    (/root/reference/internal/components/components.go:324): the listed
    RECORD attributes move to RESOURCE scope and records sharing the new
    resource identity compact under it.

    Columnar expression: each key is promoted from the attributes map to a
    real column (Arrow map_lookup, "" when absent) and deleted from the
    record-scope map (flat-array rebuild, functions/ottl.py); the promoted
    columns ARE the resource identity — any downstream groupby / partition /
    write on them is the ResourceLogs compaction, with no row shuffle here.
    """
    import pyarrow.compute as _pc

    from ..functions.expr import map_get
    from ..functions.ottl import map_delete_key

    def fn(batch: pa.Table) -> pa.Table:
        for k in keys:
            vals = map_get(batch, map_col, k).fillna("")
            batch = batch.append_column(k, pa.array(vals, type=pa.string()))
            arr = batch[map_col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            batch = batch.set_column(
                batch.column_names.index(map_col), map_col,
                map_delete_key(arr, k))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def extra_dimensions_merge(batch: pa.Table, extra: dict[str, str]) -> pa.Table:
    """extraDimensions merge: static dims OVERRIDE the record's own values
    (output.go:256-259) — i.e. upsert of constant columns."""
    n = batch.num_rows
    cols = dict(zip(batch.column_names, batch.columns))
    for k, v in extra.items():
        cols[k] = pa.array(np.full(n, v, dtype=object), type=pa.string())
    return pa.table(cols)
