"""awscloudwatch receiver analogue: per-group event-dump decode — group
recovery from the filename slug, ms→µs times, dump coverage."""

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources.cloudwatch import (
    encode_event,
    group_slug,
    read_cloudwatch_dump,
)


def test_cloudwatch_decode_unit(ray_session, tmp_path):
    d = tmp_path / "cw"
    d.mkdir()
    slug = group_slug("/aws/lambda/my-fn")
    assert slug == "aws.lambda.my-fn"
    (d / f"events-{slug}-0.jsonl").write_text(
        encode_event(1767225600123, "boom", "stream-a", "42", 1767225600999)
        + "\n")
    df = read_cloudwatch_dump(str(d)).to_pandas()
    r = df.iloc[0]
    assert r["log_group"] == "/aws/lambda/my-fn"
    assert r["log_stream"] == "stream-a" and r["event_id"] == "42"
    assert r["body"] == "boom"
    assert r["ts"].value == 1767225600123 * 10 ** 6      # ms → exact µs
    assert r["ingestion_ts"].value == 1767225600999 * 10 ** 6


def test_group_slug_refuses_unsupported_names():
    """Dots are legal in CloudWatch group names but not reversible in
    this dump layout — refuse up front instead of mis-attributing
    events on read; same for names without the leading slash."""
    import pytest

    with pytest.raises(ValueError):
        group_slug("/aws/my.app")
    with pytest.raises(ValueError):
        group_slug("no-leading-slash")


def test_cloudwatch_dump(ray_session, sf_dir):
    path = corpus.ensure_cloudwatch_dump(sf_dir)
    df = read_cloudwatch_dump(path).to_pandas()
    assert len(df) == corpus.n_turns_for(corpus.sf_name(sf_dir))
    # one group per role, streams are conversations, ids unique
    assert set(df["log_group"]) == {
        "/aws/chat/user", "/aws/chat/assistant", "/aws/chat/system",
        "/aws/chat/tool"}
    assert df["event_id"].is_unique
    assert ((df["ingestion_ts"] - df["ts"]).dt.total_seconds()
            == 0.123).all()
