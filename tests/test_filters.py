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
