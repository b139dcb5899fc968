"""OTTL statement execution (functions/ottl.py) — transform processor
statement semantics pinned against the reference examples
(examples/otel-logs-severity-splunk/otel-collector-config.yml:33-44,
examples/otel-logs-truncate-splunk/otel-collector-config.yml:38-42)."""

import numpy as np
import pyarrow as pa
import pytest

from splunk_otel_collector_ray.functions.expr import compile_predicate, map_get
from splunk_otel_collector_ray.functions.ottl import (
    OttlTransform,
    compile_statement,
)


def _batch():
    attrs = pa.array(
        [[("Level", "DETAIL"), ("k", "1")], [("Level", "LOG")],
         [("Level", "SEVERE")], []],
        type=pa.map_(pa.string(), pa.string()))
    return pa.table({
        "body": ["hello world wide web", "b", "c", "d"],
        "severity_text": ["", "", "", "x"],
        "severity_number": pa.array([0, 0, 0, 9], type=pa.int8()),
        "attributes": attrs,
    })


def test_reference_severity_statement_list():
    # the exact statement list of the severity example, verbatim
    t = OttlTransform([
        'set(severity_text, "DEBUG") where attributes["Level"] == "DETAIL"',
        'set(severity_text, "INFO") where attributes["Level"] == "LOG"',
        'set(severity_text, "WARN") where attributes["Level"] == "SEVERE"',
        'delete_key(attributes, "Level")',
    ])(_batch())
    assert t["severity_text"].to_pylist() == ["DEBUG", "INFO", "WARN", "x"]
    assert t["attributes"].to_pylist() == [[("k", "1")], [], [], []]


def test_substring_set():
    t = compile_statement("set(body, Substring(body, 0, 10))")(_batch())
    assert t["body"].to_pylist() == ["hello worl", "b", "c", "d"]


def test_set_attribute_upsert_and_append():
    t = compile_statement(
        'set(attributes["Level"], "X") where severity_number == 0')(_batch())
    got = [dict(r) for r in t["attributes"].to_pylist()]
    assert got[0] == {"k": "1", "Level": "X"}
    assert got[1] == {"Level": "X"}
    assert got[3] == {}  # unmasked row untouched (no append)


def test_set_creates_absent_column_and_concat():
    t = compile_statement(
        'set(tag, Concat([severity_text, body], "-"))')(_batch())
    assert t["tag"].to_pylist()[3] == "x-d"


def test_keep_keys():
    t = compile_statement('keep_keys(attributes, ["k"])')(_batch())
    assert t["attributes"].to_pylist() == [[("k", "1")], [], [], []]


def test_conditional_delete_key():
    t = compile_statement(
        'delete_key(attributes, "Level") where severity_number == 0'
    )(_batch())
    lv = map_get(t, "attributes", "Level")
    assert lv.isna().all()


def test_predicate_on_missing_map_key_is_false():
    m = compile_predicate('attributes["Level"] != "LOG"')(_batch())
    # null-propagating: absent key compares false even under !=
    assert m.tolist() == [True, False, True, False]


from hypothesis import given, settings
from hypothesis import strategies as st

_key = st.sampled_from(["a", "b", "c", "d"])
_maps = st.lists(
    st.lists(st.tuples(_key, st.text(alphabet="xy", max_size=3)),
             max_size=4, unique_by=lambda kv: kv[0]),
    min_size=1, max_size=12)


@settings(max_examples=60, deadline=None)
@given(_maps, _key, st.data())
def test_map_set_then_get_roundtrip(rows, key, data):
    """Property: after map_set_key under a mask, map_get returns the new
    value on masked rows and the original elsewhere; other keys untouched."""
    import numpy as np

    from splunk_otel_collector_ray.functions.ottl import map_set_key

    arr = pa.array(rows, type=pa.map_(pa.string(), pa.string()))
    mask = np.array(data.draw(st.lists(st.booleans(), min_size=len(rows),
                                       max_size=len(rows))))
    vals = np.array([f"v{i}" for i in range(len(rows))], dtype=object)
    out = map_set_key(arr, key, vals, mask)
    got = [dict(r) for r in out.to_pylist()]
    for i, row in enumerate(rows):
        orig = dict(row)
        exp = dict(orig)
        if mask[i]:
            exp[key] = vals[i]
        assert got[i] == exp, (i, orig, mask[i])


@settings(max_examples=60, deadline=None)
@given(_maps, _key, st.data())
def test_map_delete_key_only_removes_target(rows, key, data):
    import numpy as np

    from splunk_otel_collector_ray.functions.ottl import map_delete_key

    arr = pa.array(rows, type=pa.map_(pa.string(), pa.string()))
    mask = np.array(data.draw(st.lists(st.booleans(), min_size=len(rows),
                                       max_size=len(rows))))
    out = map_delete_key(arr, key, mask)
    got = [dict(r) for r in out.to_pylist()]
    for i, row in enumerate(rows):
        exp = {k: v for k, v in row if not (mask[i] and k == key)}
        assert got[i] == exp


def test_bad_statements_rejected():
    for bad in ["__import__('os')", "set(body)", "frobnicate(body, 1)"]:
        with pytest.raises((ValueError, IndexError)):
            compile_statement(bad)


def test_where_inside_string_literal_not_split():
    # ADVICE r2: a literal containing " where " must not be parsed as a clause
    fn = compile_statement('set(body, "a where b")')
    out = fn(_batch())
    assert out["body"].to_pylist() == ["a where b"] * 4
    # a real clause after such a literal still works
    fn2 = compile_statement(
        'set(body, "x where y") where severity_number == 9')
    out2 = fn2(_batch())
    assert out2["body"].to_pylist() == ["hello world wide web", "b", "c",
                                        "x where y"]


def test_null_map_validity_preserved():
    # ADVICE r2: rows whose attributes map is NULL stay NULL through
    # delete_key / keep_keys; set() creates the map only on masked rows
    from splunk_otel_collector_ray.functions.ottl import (
        map_delete_key,
        map_keep_keys,
        map_set_key,
    )

    arr = pa.array([[("a", "1")], None, [("a", "2"), ("b", "3")], None],
                   type=pa.map_(pa.string(), pa.string()))
    for out in (map_delete_key(arr, "a"), map_keep_keys(arr, ["b"])):
        assert out.is_valid().to_pylist() == [True, False, True, False]
    vals = np.array(["v0", "v1", "v2", "v3"], dtype=object)
    mask = np.array([False, True, False, False])
    out = map_set_key(arr, "n", vals, mask)
    assert out.is_valid().to_pylist() == [True, True, True, False]
    assert dict(out.to_pylist()[1]) == {"n": "v1"}
    # statement-level: delete_key over a batch with a null map row
    t = pa.table({"attributes": arr,
                  "severity_number": pa.array([1, 2, 3, 4], type=pa.int8())})
    got = compile_statement('delete_key(attributes, "a")')(t)
    assert got["attributes"].is_valid().to_pylist() == [True, False, True,
                                                        False]


def test_replace_pattern_statement_and_ismatch():
    """Upstream OTTL surface breadth (r2 VERDICT missing #5):
    replace_pattern editor + IsMatch condition function."""
    t = _batch()
    out = compile_statement(
        'replace_pattern(body, "[aeiou]", "_")')(t)
    assert out["body"].to_pylist() == ["h_ll_ w_rld w_d_ w_b", "b", "c", "d"]
    # guarded by IsMatch (alias of matches())
    out2 = compile_statement(
        'replace_pattern(body, "o", "0") where IsMatch(body, "hello")')(t)
    assert out2["body"].to_pylist() == ["hell0 w0rld wide web", "b", "c", "d"]
    # map-target variant: only rows with the key present change
    out3 = compile_statement(
        'replace_pattern(attributes["Level"], "DETAIL", "TRACE")')(t)
    got = [dict(r) if r is not None else None
           for r in out3["attributes"].to_pylist()]
    assert got[0]["Level"] == "TRACE" and got[1]["Level"] == "LOG"
    assert got[3] == {}  # empty map row untouched


def test_transform_metrics_example_statement_chain():
    """The reference's transform_metrics example statements, verbatim shapes
    (examples/transform_metrics/otel-collector-config.yml:18-30): Concat of
    a column + map value into a map key gated by IsMatch, then rename +
    delete_key gated by IsMatch."""
    t = pa.table({
        "name": ["system.cpu.time", "system.cpu.time", "system.mem"],
        "attributes": pa.array(
            [[("cpu", "cpu0")], [("cpu", "cpu1")], [("state", "x")]],
            type=pa.map_(pa.string(), pa.string())),
    })
    tr = OttlTransform([
        'set(attributes["myname"], Concat([name, attributes["cpu"]], ".")) '
        'where IsMatch(name, "^system.cpu.time")',
        'set(name, attributes["myname"]) '
        'where IsMatch(name, "^system.cpu.time")',
        'delete_key(attributes, "cpu") where IsMatch(name, "^system.cpu")',
    ])
    out = tr(t)
    assert out["name"].to_pylist() == [
        "system.cpu.time.cpu0", "system.cpu.time.cpu1", "system.mem"]
    attrs = [dict(r) for r in out["attributes"].to_pylist()]
    assert attrs[0] == {"myname": "system.cpu.time.cpu0"}
    assert attrs[2] == {"state": "x"}


def test_truncate_all_statement():
    """Upstream OTTL truncate_all(attributes, limit): every map value cut
    to limit; null maps stay null; where-guard leaves other rows whole."""
    t = pa.table({
        "attributes": pa.array(
            [[("a", "0123456789"), ("b", "xy")], None, [("c", "abcdef")]],
            type=pa.map_(pa.string(), pa.string())),
        "severity_number": pa.array([1, 2, 3], type=pa.int8()),
    })
    out = compile_statement("truncate_all(attributes, 4)")(t)
    got = [None if r is None else dict(r)
           for r in out["attributes"].to_pylist()]
    assert got == [{"a": "0123", "b": "xy"}, None, {"c": "abcd"}]
    out2 = compile_statement(
        "truncate_all(attributes, 4) where severity_number == 1")(t)
    got2 = [None if r is None else dict(r)
            for r in out2["attributes"].to_pylist()]
    assert got2 == [{"a": "0123", "b": "xy"}, None, {"c": "abcdef"}]


def test_convertcase_and_len_values():
    import pyarrow as pa

    from splunk_otel_collector_ray.functions.ottl import OttlTransform

    t = pa.table({"role": ["user", "tool"], "text": ["héllo", ""],
                  "tool": ["bash", "grep"]})
    out = OttlTransform([
        'set(up, ConvertCase(role, "upper"))',
        'set(low, ConvertCase(up, "lower"))',
        'set(n, Len(text))',
        'set(tool, ConvertCase(tool, "upper")) where role == "tool"',
    ])(t)
    assert out["up"].to_pylist() == ["USER", "TOOL"]
    assert out["low"].to_pylist() == ["user", "tool"]
    # Len counts code points (héllo = 5), and the new column is int64
    assert out["n"].to_pylist() == [5, 0]
    assert out["n"].type == pa.int64()
    assert out["tool"].to_pylist() == ["bash", "GREP"]  # guarded overwrite


def test_trim_int_double_sha256_converters():
    import hashlib

    import numpy as np
    import pyarrow as pa

    from splunk_otel_collector_ray.functions.ottl import OttlTransform

    t = pa.table({"s": ["  pad  ", "x\t", "y"],
                  "num": ["3.9", "-2.7", "nope"],
                  "n": [1, 2, 3]})
    out = OttlTransform([
        'set(trimmed, Trim(s))',
        'set(i, Int(num))',
        'set(d, Double(num))',
        'set(dn, Double(n))',
        'set(h, SHA256(s))',
    ])(t)
    assert out["trimmed"].to_pylist() == ["pad", "x", "y"]
    # Int truncates toward zero; unparseable → null; column stays int64
    assert out["i"].to_pylist() == [3, -2, None]
    assert out["i"].type == pa.int64()
    d = out["d"].to_pylist()
    assert d[0] == 3.9 and d[1] == -2.7 and (d[2] is None or np.isnan(d[2]))
    assert out["dn"].to_pylist() == [1.0, 2.0, 3.0]
    assert out["h"].to_pylist()[0] == hashlib.sha256(b"  pad  ").hexdigest()


def test_delete_matching_keys_and_limit_priority():
    import pyarrow as pa

    from splunk_otel_collector_ray.functions.ottl import OttlTransform

    m = pa.array(
        [[("alpha", "1"), ("beta", "2"), ("thread", "t"), ("code", "200"),
          ("time", "x")],
         [("thread", "t")], None, []],
        type=pa.map_(pa.string(), pa.string()))
    t = pa.table({"attributes": m, "role": ["a", "b", "c", "d"]})
    out = OttlTransform([
        'delete_matching_keys(attributes, "^t")',
        'limit(attributes, 2, ["code"])',
    ])(t)["attributes"].to_pylist()
    # row 0: ^t drops thread/time; limit 2 keeps priority 'code' + the
    # first remaining in ORIGINAL order (alpha); survivors keep map order
    assert out[0] == [("alpha", "1"), ("code", "200")]
    assert out[1] == []          # everything matched ^t
    assert out[2] is None        # null map stays null (validity preserved)
    assert out[3] == []


def test_limit_where_clause_scopes_rows():
    import pyarrow as pa

    from splunk_otel_collector_ray.functions.ottl import OttlTransform

    m = pa.array([[("a", "1"), ("b", "2")], [("a", "1"), ("b", "2")]],
                 type=pa.map_(pa.string(), pa.string()))
    t = pa.table({"attributes": m, "role": ["keep", "trim"]})
    out = OttlTransform(['limit(attributes, 1) where role == "trim"'])(t)
    vals = out["attributes"].to_pylist()
    assert vals[0] == [("a", "1"), ("b", "2")]   # unguarded row untouched
    assert vals[1] == [("a", "1")]
