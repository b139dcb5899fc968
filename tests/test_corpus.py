"""Corpus generator: determinism, schema, skew, file layout (FIXTURES.md §1)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from splunk_otel_collector_ray import corpus


def test_schema_matches_input_hint():
    t = corpus.build_transcripts("sf0.001")
    assert t.schema.field("conv_id").type == pa.string()
    assert t.schema.field("turn_idx").type == pa.int32()
    assert t.schema.field("role").type == pa.string()
    assert t.schema.field("text").type == pa.string()
    assert t.schema.field("tool").type == pa.string()
    assert t.schema.field("ts").type == pa.timestamp("us")
    assert t.num_rows == 10_000


def test_deterministic():
    a = corpus.build_transcripts("sf0.001")
    b = corpus.build_transcripts("sf0.001")
    assert a.equals(b)


def test_sorted_and_contiguous_turns():
    df = corpus.build_transcripts("sf0.001").to_pandas()
    assert df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
        df.reset_index(drop=True))
    per_conv = df.groupby("conv_id")["turn_idx"]
    assert (per_conv.min() == 0).all()
    assert (per_conv.max() + 1 == per_conv.size()).all()


def test_hot_conversation_skew():
    df = corpus.build_transcripts("sf0.001").to_pandas()
    counts = df.conv_id.value_counts()
    n_hot = max(1, df.conv_id.nunique() // 100)
    assert counts.head(n_hot).sum() / len(df) > 0.25  # ~30% target


def test_ts_in_order_per_conv():
    df = corpus.build_transcripts("sf0.001").to_pandas()
    assert (df.groupby("conv_id")["ts"].apply(lambda s: s.is_monotonic_increasing)).all()


def test_file_layout_conv_aligned(tmp_path):
    path = corpus.ensure_transcripts("sf0.001")
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert files
    # a conversation never spans two files
    last_convs, first_convs = [], []
    for f in files:
        t = pq.read_table(f, columns=["conv_id"])
        c = t.column("conv_id").to_pylist()
        first_convs.append(c[0])
        last_convs.append(c[-1])
    for i in range(1, len(files)):
        assert last_convs[i - 1] != first_convs[i]


def test_tool_only_on_tool_role():
    df = corpus.build_transcripts("sf0.001").to_pandas()
    assert (df.loc[df.role != "tool", "tool"] == "").all()
    assert (df.loc[df.role == "tool", "tool"] != "").all()


def test_corpus_chunked_render_identical(tmp_path, monkeypatch):
    """The memory-bounded super-chunk writer emits the SAME files as a
    monolithic render: same conv-aligned split points, same values — so
    large scales (where one in-memory render would OOM) share a lineage
    with every cached fixture."""
    monkeypatch.setattr(corpus, "RENDER_CHUNK", 700)  # many tiny chunks
    monkeypatch.setattr(corpus, "ROWS_PER_FILE", 2_000)  # and many files
    monkeypatch.setattr(corpus, "FIXTURE_ROOT", str(tmp_path))
    path = corpus.ensure_transcripts("sf0.001")
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) == 5  # 10k rows / 2k per file
    got = pa.concat_tables([pq.read_table(f) for f in files])
    want = corpus.build_transcripts("sf0.001")
    assert got.combine_chunks().equals(want.combine_chunks())
    # chunk boundaries stay conversation-aligned
    for i in range(1, len(files)):
        a = pq.read_table(files[i - 1], columns=["conv_id"])["conv_id"]
        b = pq.read_table(files[i], columns=["conv_id"])["conv_id"]
        assert a[-1].as_py() != b[0].as_py()
