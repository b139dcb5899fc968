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

Scale shape: the stitch needs all fragments of a conversation co-located, but
NOT one task per conversation. We bucket conversations (hash(conv) % B) and
run ONE vectorized pandas stitch per bucket — B grouped tasks instead of
millions, with everything inside the task done by groupby.cumsum /
groupby.agg (no per-conv Python). Hot-key safety: a single conversation can't
exceed a bucket, and B scales with the cluster. The corpus writer also keeps
conversations within one input file, so a per-file variant needs no shuffle
at all.

Record identity (shared with the DuckDB oracle): within a conv's fragment
stream ordered by turn_idx, ``record_id = count of PRIOR last-entries`` —
an exclusive prefix sum of the is_last flag.

Also here: the `multiline` framing config of filelog
(logs_config_linux.yaml:95-97,312-315) — splitting a text blob into records
at line_start_pattern boundaries — as a vectorized kernel.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

def _stitch_buckets() -> int:
    from ..partitioning import spread_num_buckets

    return spread_num_buckets()


def _stitch_frame(g: pd.DataFrame, body_col: str, key: str, order: str
                  ) -> pd.DataFrame:
    """Vectorized stitch of MANY conversations at once (one bucket)."""
    g = g.sort_values([key, order], kind="mergesort")
    is_last = g[body_col].str.endswith("\n").fillna(False)
    # exclusive per-conv prefix sum of is_last == record id
    rid = is_last.groupby(g[key], sort=False).cumsum() - is_last.astype(int)
    g = g.assign(record_id=rid.astype(np.int64), _last=is_last)
    out = (
        g.groupby([key, "record_id"], sort=True)
        .agg(body=(body_col, "".join), n_fragments=(body_col, "size"),
             is_complete=("_last", "last"))
        .reset_index()
        .rename(columns={key: "conv_id"})
    )
    return out[["conv_id", "record_id", "body", "n_fragments", "is_complete"]]


def recombine_fragments(
    ds: "ray.data.Dataset",
    body_col: str = "body",
    key: str = "conv_id",
    order: str = "turn_idx",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Stitch fragment rows into records: one output row per record with
    columns (conv_id, record_id, body, n_fragments, is_complete)."""
    if num_buckets is None:
        num_buckets = _stitch_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t[key].to_pandas().to_numpy(dtype=object)) % num_buckets
        return t.append_column("_bucket", pa.array(h.astype(np.int32)))

    def stitch_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _stitch_frame(g, body_col, key, order)

    from ..partitioning import bucket_fold

    return bucket_fold(
        ds.select_columns([key, order, body_col])
        .map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", stitch_bucket)


def multiline_frame(
    ds: "ray.data.Dataset",
    line_start_pattern: str | None = None,
    text_col: str = "body",
    key: str = "conv_id",
    order: str = "turn_idx",
    num_buckets: int | None = None,
    line_end_pattern: str | None = None,
) -> "ray.data.Dataset":
    """filelog `multiline` framing as a DATASET operator
    (logs_config_linux.yaml:95-97 cassandra, :368-369 mysql-slow; the
    stanza split config takes exactly one of line_start_pattern /
    line_end_pattern):

    - ``line_start_pattern``: a record STARTS at each match; lines before
      the first match form a leading record (record_id 0). record_id =
      INCLUSIVE prefix sum of is_start.
    - ``line_end_pattern``: a record ENDS at (and includes) each match;
      trailing lines after the last match form an open final record.
      record_id = EXCLUSIVE prefix sum of is_end (count of PRIOR ends) —
      the same construction recombine uses for is_last_entry.
    - the never-match idiom (`^THIS_PATTERN_WILL_NEVER_MATCH_ANYTHING$`,
      splunk_logs_config_linux.yaml:89-90): with either parameter, zero
      matches collapse each source to ONE record — the whole-blob framing
      the reference configures that way.

    Same scale shape as recombine: the flag is ONE vectorized RE2 pass in
    map_batches; conversations are hash-bucketed and each bucket is framed
    in one pandas groupby pass (shared with the DuckDB oracle's
    window-function construction).
    Output: (conv_id, record_id, body = lines joined with newline, n_lines).
    """
    if (line_start_pattern is None) == (line_end_pattern is None):
        raise ValueError("exactly one of line_start_pattern / "
                         "line_end_pattern must be given")
    if num_buckets is None:
        num_buckets = _stitch_buckets()
    pattern = line_start_pattern or line_end_pattern
    exclusive = line_end_pattern is not None

    def tag(t: pa.Table) -> pa.Table:
        flag = pa.compute.match_substring_regex(t[text_col], pattern)
        h = pd.util.hash_array(
            t[key].to_pandas().to_numpy(dtype=object)) % num_buckets
        return (t.select([key, order, text_col])
                .append_column("_flag", flag)
                .append_column("_bucket", pa.array(h.astype(np.int32))))

    def frame_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _frame_lines(g, text_col, key, order, exclusive)

    from ..partitioning import bucket_fold

    return bucket_fold(ds.map_batches(tag, batch_format="pyarrow"),
                       "_bucket", frame_bucket)


def _frame_lines(g: pd.DataFrame, text_col: str, key: str, order: str,
                 exclusive: bool = False) -> pd.DataFrame:
    """Vectorized framing of MANY conversations at once (one bucket);
    ``_flag`` is the precomputed line_start/line_end match. record_id is
    the inclusive (start-anchored) or exclusive (end-anchored) per-source
    prefix sum of the flag."""
    g = g.sort_values([key, order], kind="mergesort")
    f = g["_flag"].astype(np.int64)
    rid = f.groupby(g[key], sort=False).cumsum()
    if exclusive:
        rid = rid - f
    g = g.assign(record_id=rid.astype(np.int64))
    out = (
        g.groupby([key, "record_id"], sort=True)
        .agg(body=(text_col, "\n".join), n_lines=(text_col, "size"))
        .reset_index()
        .rename(columns={key: "conv_id"})
    )
    return out[["conv_id", "record_id", "body", "n_lines"]]


def split_multiline(text: str, line_start_pattern: str | None = None,
                    line_end_pattern: str | None = None) -> list[str]:
    """filelog `multiline` framing over one blob: split into records
    beginning at each line_start match (lines before the first match form a
    leading record), or ending AFTER each line_end match's line. Exactly one
    pattern; zero matches (the never-match idiom) keep the blob whole."""
    if (line_start_pattern is None) == (line_end_pattern is None):
        raise ValueError("exactly one of line_start_pattern / "
                         "line_end_pattern must be given")
    if line_start_pattern is not None:
        rx = re.compile(line_start_pattern, re.MULTILINE)
        starts = [m.start() for m in rx.finditer(text)]
        if not starts:
            return [text] if text else []
        bounds = ([0] if starts[0] != 0 else []) + starts + [len(text)]
        return [text[a:b] for a, b in zip(bounds[:-1], bounds[1:])
                if text[a:b]]
    rx = re.compile(line_end_pattern, re.MULTILINE)
    cuts = []
    for m in rx.finditer(text):
        nl = text.find("\n", m.end())
        cuts.append(len(text) if nl < 0 else nl + 1)
    bounds = [0] + sorted(set(cuts)) + [len(text)]
    return [text[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if text[a:b]]
