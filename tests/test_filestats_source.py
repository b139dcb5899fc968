"""filestats receiver analogue: stat-listing decode and the capture's
per-conversation aggregate invariants."""

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources.filestats import (
    encode_stat_line,
    read_filestats_dump,
)


def test_filestats_decode_unit(ray_session, tmp_path):
    d = tmp_path / "stats"
    d.mkdir()
    (d / "stat-0.jsonl").write_text(
        encode_stat_line("/var/log/a.log", 123, 1767225600, 1767225500)
        + "\n"
        + encode_stat_line("/deep/nested/b.log", 0, 5, 5) + "\n")
    df = read_filestats_dump(str(d)).to_pandas()
    assert list(df["file_name"]) == ["a.log", "b.log"]
    assert list(df["file_path"]) == ["/var/log/a.log",
                                     "/deep/nested/b.log"]
    assert list(df["size_bytes"]) == [123, 0]
    assert list(df["mtime_s"]) == [1767225600, 5]
    assert list(df["atime_s"]) == [1767225500, 5]


def test_filestats_dump(ray_session, sf_dir):
    path = corpus.ensure_filestats_dump(sf_dir)
    df = read_filestats_dump(path).to_pandas()
    # one file per conversation; atime (first turn) never after mtime
    assert df["file_path"].is_unique
    assert (df["atime_s"] <= df["mtime_s"]).all()
    assert (df["size_bytes"] > 0).all()
    import pyarrow.parquet as pq

    t = pq.read_table(corpus.ensure_transcripts(sf_dir),
                      columns=["conv_id"])
    assert len(df) == t["conv_id"].to_pandas().nunique()
