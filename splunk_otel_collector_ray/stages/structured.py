"""Structured-text stanza parsers: csv_parser / key_value_parser / uri_parser.

The reference's filelog stack embeds the upstream stanza operator library,
whose parser set goes beyond the regex/json operators its shipped configs
use: `csv_parser`, `key_value_parser`, and `uri_parser` are user-configurable
operators of the same chain (reference CHANGELOG.md:3589-3591 lists all
three in the stanza batching table; pkg/stanza upstream). A user porting a
filelog config with any of them needs these semantics.

Engine discipline: ONE anchored RE2 pattern per operator evaluated with
`pyarrow.compute.extract_regex` (zero-copy, no Python row loop); the DuckDB
oracle evaluates the IDENTICAL pattern with `regexp_extract` /
`regexp_extract_all` — both engines are RE2 with leftmost-first alternation,
so even quoting corner cases cannot diverge. Nulls coalesce to '' on both
sides (CLAUDE.md string-semantics rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# one CSV field: a double-quoted run (inner quotes doubled, RFC 4180) or a
# bare run without delimiter; captured WITH quotes, unquoted in a second
# vectorized step so the SQL twin can replay both steps verbatim
CSV_FIELD_RX = '("(?:[^"]|"")*"|[^,]*)'

URI_RX = (r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/:?#]*)"
          r"(?::(?P<port>[0-9]+))?(?P<path>/[^?#]*)?"
          r"(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$")

KV_PAIR_RX = r"([0-9A-Za-z_.]+)=([^ ]*)"


def csv_rx(n_fields: int) -> str:
    """Anchored whole-line pattern for exactly ``n_fields`` CSV fields."""
    return "^" + ",".join([CSV_FIELD_RX] * n_fields) + "$"


UNQUOTE_RX = '^"((?:[^"]|"")*)"$'


def _unquote(col: "pa.ChunkedArray") -> "pa.ChunkedArray":
    """Strip RFC-4180 quoting: outer quotes off (whole-field match only),
    doubled quotes collapsed. The SQL twin runs the IDENTICAL
    ``replace(regexp_replace(f, UNQUOTE_RX, '\\1'), '\"\"', '\"')`` chain."""
    inner = pc.replace_substring_regex(col, UNQUOTE_RX, r"\1")
    return pc.replace_substring(inner, '""', '"')


def csv_parse(batch: pa.Table, col: str, header: list[str],
              keep: list[str] | None = None) -> pa.Table:
    """stanza csv_parser: one line → one attribute per ``header`` name.

    Rows that don't match the n-field shape parse to null fields (stanza
    sends parse errors to the error output); nulls are coalesced to ''.
    """
    # pyarrow extract_regex requires NAMED groups: same pattern as csv_rx
    # with each field group aliased f0..fn-1 (the SQL twin uses csv_rx with
    # positional group indexes — identical RE2 automaton either way)
    parts = csv_rx(len(header)).split(CSV_FIELD_RX)
    named = parts[0]
    for i, tail in enumerate(parts[1:]):
        named += f'(?P<f{i}>"(?:[^"]|"")*"|[^,]*)' + tail
    st = pc.extract_regex(batch[col], named)
    out = batch.select([c for c in (keep or []) if c in batch.column_names])
    for i, name in enumerate(header):
        f = pc.struct_field(st, f"f{i}") if st.type.num_fields else \
            pa.nulls(batch.num_rows, pa.string())
        out = out.append_column(name, pc.coalesce(_unquote(f), ""))
    return out


def uri_parse(batch: pa.Table, col: str,
              keep: list[str] | None = None) -> pa.Table:
    """stanza uri_parser: scheme/host/port/path/query/fragment attributes."""
    st = pc.extract_regex(batch[col], URI_RX)
    out = batch.select([c for c in (keep or []) if c in batch.column_names])
    for name in ("scheme", "host", "port", "path", "query", "fragment"):
        f = pc.struct_field(st, name) if st.type.num_fields else \
            pa.nulls(batch.num_rows, pa.string())
        out = out.append_column(name, pc.coalesce(f, ""))
    return out


def kv_explode(batch: pa.Table, col: str, id_cols: list[str],
               pair_rx: str = KV_PAIR_RX) -> pa.Table:
    """stanza key_value_parser, relational shape: every ``key=value`` pair in
    the line becomes one output row carrying the ``id_cols``. (The stanza
    operator emits a map; the exploded form is the columnar equivalent and
    what the DuckDB twin can align positionally with two unnests.)"""
    s = batch[col].to_pandas().fillna("")
    s.index = pd.RangeIndex(len(s))
    # vectorized; one row per pair match (pandas records an EMPTY group
    # match as NaN — restore it to '' so `c=` keeps its empty value)
    ext = s.str.extractall(pair_rx).fillna("")
    idx = ext.index.get_level_values(0).to_numpy()
    out = batch.select(id_cols).take(pa.array(idx, pa.int64()))
    keys = pa.array(ext[0].to_numpy(dtype=object), pa.string())
    vals = pa.array(ext[1].to_numpy(dtype=object), pa.string())
    return out.append_column("key", keys).append_column("value", vals)


TRACE_ID_RX = "^[0-9a-fA-F]{32}$"
SPAN_ID_RX = "^[0-9a-fA-F]{16}$"
FLAGS_RX = "^[0-9a-fA-F]{1,2}$"


def trace_parse(batch: pa.Table, trace_col: str, span_col: str | None = None,
                flags_col: str | None = None,
                keep: list[str] | None = None) -> pa.Table:
    """stanza trace_parser (CHANGELOG.md:3590; pkg/stanza upstream): lift
    trace context fields onto the record, VALIDATING the W3C hex shapes —
    a 32-hex trace_id, 16-hex span_id, 1-2-hex flags. Invalid values parse
    to '' (stanza drops them from the trace context), and the surviving ids
    are canonicalized to lowercase like the collector's pdata ids.

    One anchored RE2 match + utf8_lower per field — no row loop."""
    out = batch.select([c for c in (keep or []) if c in batch.column_names])

    def lift(col: str | None, rx: str, name: str) -> None:
        nonlocal out
        if col is None:
            return
        v = pc.coalesce(batch[col], "")
        ok = pc.match_substring_regex(v, rx)
        out = out.append_column(
            name, pc.if_else(ok, pc.utf8_lower(v), ""))

    lift(trace_col, TRACE_ID_RX, "trace_id")
    lift(span_col, SPAN_ID_RX, "span_id")
    lift(flags_col, FLAGS_RX, "trace_flags")
    return out


# one flat JSON array element: a double-quoted JSON string (backslash
# escapes) or a bare scalar run (number / true / false / null)
JSON_ELEM_RX = r'("(?:[^"\\]|\\.)*"|[^,\]]*)'


def json_array_rx(n: int) -> str:
    """Anchored pattern for a flat ``[e1, e2, …]`` array of exactly n
    elements (the stanza json_array_parser's fixed-arity use: positional
    fields from a known line shape). Separator is ', ' — the canonical
    json.dumps/DuckDB to_json spacing."""
    return r"^\[" + ", ".join([JSON_ELEM_RX] * n) + r"\]$"


def json_array_parse(batch: pa.Table, col: str, header: list[str],
                     keep: list[str] | None = None) -> pa.Table:
    """stanza json_array_parser (CHANGELOG.md:3589), flat-scalar subset: one
    anchored RE2 pass lifts each positional element into a string attribute;
    quoted elements are unquoted (JSON string escapes beyond \\" are left
    verbatim — documented subset, like json_int_field). Non-matching rows
    parse to ''."""
    parts = json_array_rx(len(header)).split(JSON_ELEM_RX)
    named = parts[0]
    for i, tail in enumerate(parts[1:]):
        named += JSON_ELEM_RX.replace("(", f"(?P<f{i}>", 1) + tail
    st = pc.extract_regex(batch[col], named)
    out = batch.select([c for c in (keep or []) if c in batch.column_names])
    for i, name in enumerate(header):
        f = pc.struct_field(st, f"f{i}") if st.type.num_fields else \
            pa.nulls(batch.num_rows, pa.string())
        unq = pc.replace_substring_regex(f, '^"((?:[^"\\\\]|\\\\.)*)"$',
                                         r"\1")
        out = out.append_column(name, pc.coalesce(unq, ""))
    return out
