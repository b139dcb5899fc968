"""`recombine` operator — stitch split records (multiline/docker-partial).

Reference semantics (/root/reference/examples/recombine/otel-collector-config.yml:15-20):
    combine_field: attributes.log, combine_with: "",
    is_last_entry: attributes.log endsWith "\\n",
    source_identifier: attributes["log.file.path"]

i.e. consecutive entries from one source are concatenated until an entry whose
`log` ends with a newline closes the record; incomplete trailing records flush
at EOF. Our source identifier is the conversation: fragments only ever combine
within one `conv_id`, in `turn_idx` order (SURVEY.md §7.4 — the one truly
stateful cross-row parse, confined to per-conv groups).

Scale: requires a shuffle keyed on conv_id. The corpus writer guarantees a
conversation never spans input files, so at scale this can run per-file with
no shuffle; the generic path below uses groupby(conv_id).map_groups.

Record identity (shared with the DuckDB oracle): within a conv's fragment
stream ordered by turn_idx, ``record_id = count of PRIOR last-entries`` —
an exclusive prefix sum of the is_last flag.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def recombine_fragments(
    ds: "ray.data.Dataset",
    body_col: str = "body",
    key: str = "conv_id",
    order: str = "turn_idx",
) -> "ray.data.Dataset":
    """Stitch fragment rows into records: one output row per record with
    columns (conv_id, record_id, body, n_fragments, is_complete)."""

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        is_last = g[body_col].str.endswith("\n").fillna(False).to_numpy()
        rid = np.concatenate([[0], np.cumsum(is_last)[:-1]])
        out = (
            g.assign(record_id=rid)
            .groupby("record_id", sort=True)
            .agg(
                conv_id=(key, "first"),
                body=(body_col, "".join),
                n_fragments=(body_col, "size"),
                is_complete=(body_col, lambda s: bool(s.iloc[-1].endswith("\n"))),
            )
            .reset_index()
        )
        return out[["conv_id", "record_id", "body", "n_fragments", "is_complete"]]

    return ds.groupby(key).map_groups(stitch, batch_format="pandas")
