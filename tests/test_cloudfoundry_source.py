"""cloudfoundry receiver analogue: loggregator v2 envelope decode —
oneof dispatch, string-ns/string-int64 JSON mappings, gauge explode,
counter monotonicity over the staged corpus."""

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources.cloudfoundry import (
    encode_envelope,
    envelopes_to_logs,
    envelopes_to_metrics,
)


def _stage(tmp_path, lines):
    d = tmp_path / "rlp"
    d.mkdir()
    (d / "rlp-0.jsonl").write_text("\n".join(lines) + "\n")
    return str(d)


def test_envelope_decode_unit(ray_session, tmp_path):
    path = _stage(tmp_path, [
        encode_envelope(1_700_000_000_000_000_123, "app-1", "0",
                        {"origin": "rep"},
                        log={"payload": "héllo", "type": "ERR"}),
        encode_envelope(2_000, "app-1", "1", {},
                        counter={"name": "requests", "delta": 7,
                                 "total": 2 ** 60}),
        encode_envelope(3_000, "app-2", "2", {"origin": "router"},
                        gauge={"metrics": {
                            "cpu": {"unit": "percentage", "value": 1.5},
                            "memory": {"unit": "bytes", "value": 42.0}}}),
    ])
    logs = envelopes_to_logs(path).to_pandas()
    assert len(logs) == 1
    r = logs.iloc[0]
    # unicode payload through base64; ERR → Error(17); ns → µs floor
    assert r["body"] == "héllo" and r["severity_number"] == 17
    assert r["ts"].value // 1000 == 1_700_000_000_000_000  # pandas ns
    assert r["origin"] == "rep"

    mets = envelopes_to_metrics(path).to_pandas()
    assert len(mets) == 3  # 1 counter + 2 gauge entries
    c = mets[mets["type"] == "counter"].iloc[0]
    # string-int64 JSON mapping survives beyond double precision
    assert c["delta"] == 7 and c["total"] == 2 ** 60
    g = mets[mets["type"] == "gauge"].sort_values("name")
    assert list(g["name"]) == ["cpu", "memory"]
    assert list(g["unit"]) == ["percentage", "bytes"]
    assert g[g["name"] == "cpu"].iloc[0]["origin"] == "router"


def test_cloudfoundry_dump(ray_session, sf_dir):
    path = corpus.ensure_cloudfoundry_dump(sf_dir)
    logs = envelopes_to_logs(path).to_pandas()
    mets = envelopes_to_metrics(path).to_pandas()
    # every turn lands in exactly one family (gauges emit 2 rows)
    n_turns = corpus.n_turns_for(corpus.sf_name(sf_dir))
    n_gauge = (mets["type"] == "gauge").sum()
    n_counter = (mets["type"] == "counter").sum()
    assert len(logs) + n_counter + n_gauge // 2 == n_turns
    assert set(logs["log_type"]) == {"OUT", "ERR"}
    assert str(logs["severity_number"].dtype) == "int8"
    # counter totals are monotone per (app, name) in time order
    c = mets[mets["type"] == "counter"].sort_values("ts")
    assert (c.groupby(["source_id", "name"])["total"].diff().dropna()
            > 0).all()
    # totals are running sums of deltas
    assert (c.groupby(["source_id", "name"])["delta"].cumsum()
            == c["total"]).all()
