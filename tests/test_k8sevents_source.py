"""k8s_events / k8sobjects receiver analogues: watch-stream decode —
Event→log-record conversion, kind-agnostic object view, non-Event
objects skipped by the events view but kept by the objects view."""

import pyarrow as pa

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources.k8sevents import (
    encode_watch_line,
    events_to_logs,
    objects_to_rows,
)


def _stage(tmp_path, lines):
    d = tmp_path / "watchdump"
    d.mkdir()
    (d / "watch-0.jsonl").write_text("\n".join(lines) + "\n")
    return str(d)


def test_watch_decode_unit(ray_session, tmp_path):
    ev = {
        "apiVersion": "v1", "kind": "Event",
        "metadata": {"name": "c.0", "namespace": "ns",
                     "uid": "uid-1", "resourceVersion": "7"},
        "involvedObject": {"kind": "Pod", "name": "c",
                           "namespace": "ns", "uid": "uid-p"},
        "reason": "Started", "message": "hello", "type": "Warning",
        "count": 3, "eventTime": "2026-01-01T00:00:01.000123Z",
        "source": {"component": "kubelet", "host": "h0"},
    }
    pod = {"apiVersion": "v1", "kind": "Pod",
           "metadata": {"name": "p", "namespace": "ns", "uid": "u",
                        "resourceVersion": "9"}}
    path = _stage(tmp_path, [encode_watch_line("ADDED", ev),
                             encode_watch_line("DELETED", pod)])

    logs = events_to_logs(path).to_pandas()
    # the Pod watch line is not an Event — the events view skips it
    assert len(logs) == 1
    r = logs.iloc[0]
    assert r["severity_text"] == "Warn" and r["severity_number"] == 13
    assert r["body"] == "hello" and r["reason"] == "Started"
    assert r["count"] == 3 and r["object_kind"] == "Pod"
    assert r["ts"] == pa.scalar(1767225601000123,
                                type=pa.timestamp("us")).as_py()

    objs = objects_to_rows(path).to_pandas()
    # ... but the objects view is kind-agnostic and keeps both
    assert len(objs) == 2
    assert set(objs["kind"]) == {"Event", "Pod"}
    assert set(objs["watch_type"]) == {"ADDED", "DELETED"}


def test_event_time_fallback(ray_session, tmp_path):
    """eventTime is optional on corev1 Event: fall back to
    lastTimestamp (fraction-less metav1.Time form), then
    firstTimestamp, then null — never a decode crash."""
    base = {"apiVersion": "v1", "kind": "Event",
            "metadata": {"name": "e", "namespace": "ns", "uid": "u",
                         "resourceVersion": "1"},
            "involvedObject": {"kind": "Pod", "name": "p",
                               "namespace": "ns", "uid": "pu"},
            "reason": "Started", "message": "m", "type": "Normal",
            "count": 1, "source": {}}
    no_evt = dict(base, lastTimestamp="2026-01-01T00:00:02Z")
    first_only = dict(base, firstTimestamp="2026-01-01T00:00:03Z")
    no_time = dict(base)
    path = _stage(tmp_path, [encode_watch_line("ADDED", e)
                             for e in (no_evt, first_only, no_time)])
    df = events_to_logs(path).to_pandas()
    assert df["ts"].iloc[0].value == 1767225602 * 10 ** 9
    assert df["ts"].iloc[1].value == 1767225603 * 10 ** 9
    assert df["ts"].isna().iloc[2]


def test_k8sevents_dump(ray_session, sf_dir):
    path = corpus.ensure_k8sevents_dump(sf_dir)
    df = events_to_logs(path).to_pandas()
    n_turns = corpus.n_turns_for(corpus.sf_name(sf_dir))
    assert len(df) == n_turns
    # severity follows the Normal/Warning → Info/Warn mapping exactly
    warn = df[df["severity_number"] == 13]
    assert (warn["severity_text"] == "Warn").all()
    assert set(df["severity_text"]) == {"Info", "Warn"}
    assert str(df["severity_number"].dtype) == "int8"
    # one Pod object per conversation; the count column is 1-based
    assert df["object_name"].nunique() == df["object_uid"].nunique()
    assert (df["count"] >= 1).all()

    objs = objects_to_rows(path).to_pandas()
    assert len(objs) == n_turns
    assert (objs["kind"] == "Event").all()
    assert objs["uid"].is_unique
