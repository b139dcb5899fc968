"""Filter-precedence matrix (FIXTURES.md §7) — smartagent dpfilters semantics:
static / glob / `/regex/` items, `!` negation, dimension maps, and the
default→extraMetrics-re-include→exclude precedence
(filtering.go:234-259, filter.go:29-103, overridable.go:47-61)."""

import pandas as pd

from splunk_otel_collector_ray.stages.filters import (
    FilterSet,
    OverridableFilter,
    StringFilter,
)


def test_string_filter_static_glob_regex():
    f = StringFilter(["cpu.idle", "mem.*", "/^disk\\.io$/"])
    vals = pd.Series(["cpu.idle", "cpu.user", "mem.free", "disk.io", "disk.iops"])
    assert f.matches(vals).tolist() == [True, False, True, True, False]


def test_string_filter_negation():
    # '!cpu.idle' contributes "does not match cpu.idle" via OR
    f = StringFilter(["!cpu.idle"])
    vals = pd.Series(["cpu.idle", "cpu.user"])
    assert f.matches(vals).tolist() == [False, True]


def test_overridable_requires_name_and_dims():
    f = OverridableFilter(metric_names=["cpu.*"],
                          dimensions={"host": ["web-*"]})
    df = pd.DataFrame({
        "name": ["cpu.idle", "cpu.idle", "mem.free"],
        "host": ["web-1", "db-1", "web-1"],
    })
    assert f.matches(df).tolist() == [True, False, False]


def test_filterset_exclude_then_reinclude():
    fs = FilterSet(
        excludes=[OverridableFilter(metric_names=["cpu.*"])],
        includes=[OverridableFilter(metric_names=["cpu.idle"])],
    )
    df = pd.DataFrame({"name": ["cpu.idle", "cpu.user", "mem.free"]})
    # cpu.* excluded, but cpu.idle re-included; mem.free untouched
    assert fs.keep_mask(df).tolist() == [True, False, True]


def test_filterset_any_exclude_drops():
    fs = FilterSet(excludes=[
        OverridableFilter(metric_names=["a"]),
        OverridableFilter(metric_names=["b"]),
    ])
    df = pd.DataFrame({"name": ["a", "b", "c"]})
    assert fs.keep_mask(df).tolist() == [False, False, True]


def test_missing_dimension_never_matches():
    f = OverridableFilter(metric_names=["x"], dimensions={"nope": ["v"]})
    df = pd.DataFrame({"name": ["x"]})
    assert f.matches(df).tolist() == [False]


def test_discovery_match_rules_first_match_and_emit_once(ray_session):
    """discoveryreceiver evaluator semantics: (strict|regexp|expr) table,
    first-match-wins, emit-once per (endpoint, receiver, status, pattern)
    with the earliest record winning (config.go:66-83, evaluator.go:60-115)."""
    import pyarrow as pa
    import pytest
    import ray.data

    from splunk_otel_collector_ray.stages.discovery import (
        MatchRule,
        discovery_status,
    )

    t = pa.table({
        "conv_id": ["e1", "e1", "e1", "e2", "e2"],
        "turn_idx": [0, 1, 2, 0, 1],
        "body": ["ready", "error: boom", "error: again", "warn x", "ready"],
        "role": ["tool", "assistant", "assistant", "user", "tool"],
    })
    rules = [
        MatchRule(status="failed", message="err", regexp="error"),
        MatchRule(status="partial", message="wrn", strict="warn x"),
        MatchRule(status="successful", message="ok", expr="role == 'tool'"),
    ]
    out = (discovery_status(ray.data.from_arrow(t), rules,
                            receiver_id="r1")
           .to_pandas().sort_values(["endpoint", "status"])
           .reset_index(drop=True))
    # e1: successful@0 (expr), failed@1 (first error only — emit-once)
    # e2: partial@0 (strict), successful@1
    assert out[["endpoint", "status", "turn_idx"]].values.tolist() == [
        ["e1", "failed", 1], ["e1", "successful", 0],
        ["e2", "partial", 0], ["e2", "successful", 1]]
    assert set(out["receiver"]) == {"r1"}
    with pytest.raises(ValueError):
        MatchRule(status="x")  # no match field
    with pytest.raises(ValueError):
        MatchRule(status="x", strict="a", regexp="b")  # two match fields
