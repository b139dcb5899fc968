"""SignalFx v2 datapoint wire: fixture decode, exporter roundtrip, and
a hypothesis property over the full Datum/dimension value domain (the
fixture corpus only sweeps the three staged metric families; the codec
must hold for arbitrary metrics, negative/boundary int64s, exact IEEE
doubles, unicode dimension values, and every arm of the value oneof)."""

import gzip

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from splunk_otel_collector_ray import corpus
from splunk_otel_collector_ray.sources.sfx import (
    DIM_KEYS,
    _OUT_SCHEMA,
    _cols_to_table,
    _decode_upload,
    encode_upload,
    read_sfx_dump,
    write_sfx_dump,
)

_TYPES = ("GAUGE", "COUNTER", "ENUM", "CUMULATIVE_COUNTER")


def _rows_to_cols(rows):
    cols = {f.name: [] for f in _OUT_SCHEMA}
    _decode_upload(gzip.decompress(encode_upload(rows)), cols)
    return cols


# exactly one value arm per datapoint, like the wire contract
_value_arm = st.one_of(
    st.builds(lambda v: {"value_int": v},
              st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)),
    st.builds(lambda v: {"value_dbl": v}, st.floats(allow_nan=False)),
    st.builds(lambda v: {"value_str": v}, st.text(max_size=40)),
)
_dp = st.builds(
    lambda metric, mtype, ts_ms, source, arm, dims: {
        "metric": metric, "metric_type": mtype, "ts_ms": ts_ms,
        "source": source,
        **{k: None for k in DIM_KEYS}, **dims, **arm},
    st.text(min_size=1, max_size=30),
    st.sampled_from(_TYPES),
    st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
    st.one_of(st.none(), st.text(max_size=20)),
    _value_arm,
    st.fixed_dictionaries(
        {}, optional={k: st.text(max_size=25) for k in DIM_KEYS}),
)


@settings(max_examples=120, deadline=None)
@given(st.lists(_dp, max_size=8))
def test_sfx_upload_roundtrip_property(rows):
    """encode∘decode is the identity for every field, including unset
    (None) dimensions/source and each Datum arm with exact values."""
    cols = _rows_to_cols(rows)
    assert len(cols["metric"]) == len(rows)
    for i, r in enumerate(rows):
        assert cols["metric"][i] == r["metric"]
        assert cols["metric_type"][i] == r["metric_type"]
        assert cols["source"][i] == r["source"]
        assert cols["ts"][i] == r["ts_ms"] * 1000
        for arm in ("value_int", "value_dbl", "value_str"):
            want = r.get(arm)
            got = cols[arm][i]
            if want is None:
                assert got is None
            else:
                assert got == want and type(got) is type(want)
        for k in DIM_KEYS:
            assert cols[k][i] == r.get(k)


def test_sfx_datum_presence_not_defaults():
    """proto2 presence: int 0, double 0.0 and empty string are all
    distinguishable from an unset arm (the implicit-proto3 failure
    mode this codec exists to avoid)."""
    rows = [
        {"metric": "m", "metric_type": "GAUGE", "ts_ms": 0,
         "source": None, **{k: None for k in DIM_KEYS}, "value_int": 0},
        {"metric": "m", "metric_type": "GAUGE", "ts_ms": 0,
         "source": None, **{k: None for k in DIM_KEYS}, "value_dbl": 0.0},
        {"metric": "m", "metric_type": "ENUM", "ts_ms": 0,
         "source": None, **{k: None for k in DIM_KEYS}, "value_str": ""},
    ]
    cols = _rows_to_cols(rows)
    assert cols["value_int"] == [0, None, None]
    assert cols["value_dbl"] == [None, 0.0, None]
    assert cols["value_str"] == [None, None, ""]
    # and the Arrow materialization keeps the schema contract
    t = _cols_to_table(cols)
    assert t.schema == _OUT_SCHEMA


def test_sfx_multi_arm_datum_preserved():
    """Datum is three independent optional fields, not a true oneof —
    a body carrying several arms must survive decode∘encode."""
    rows = [{"metric": "m", "metric_type": "GAUGE", "ts_ms": 1,
             "source": None, **{k: None for k in DIM_KEYS},
             "value_int": 7, "value_dbl": 2.5, "value_str": "s"}]
    cols = _rows_to_cols(rows)
    assert cols["value_int"] == [7]
    assert cols["value_dbl"] == [2.5]
    assert cols["value_str"] == ["s"]


def test_sfx_dump_decode(ray_session, sf_dir):
    path = corpus.ensure_sfx_dump(sf_dir)
    ds = read_sfx_dump(path)
    t = pa.table(ds.to_pandas())
    n_turns = corpus.n_turns_for(corpus.sf_name(sf_dir))
    counts = {m: pc.sum(pc.equal(t["metric"], m)).as_py()
              for m in ("chat.turn.chars", "chat.conv.turns",
                        "chat.conv.role")}
    assert counts["chat.turn.chars"] == n_turns
    assert counts["chat.conv.turns"] == n_turns
    # one ENUM role datapoint per conversation
    n_convs = pc.count_distinct(t["conv_id"]).as_py()
    assert counts["chat.conv.role"] == n_convs
    assert t.num_rows == 2 * n_turns + n_convs
    # the cumulative counter is monotone within a conversation and the
    # ENUM arm is the only strValue carrier
    enum = t.filter(pc.equal(t["metric_type"], "ENUM"))
    assert pc.all(pc.is_valid(enum["value_str"])).as_py()
    assert not pc.any(pc.is_valid(enum["value_int"])).as_py()
    gauges = t.filter(pc.equal(t["metric"], "chat.turn.chars"))
    assert pc.all(pc.is_valid(gauges["value_int"])).as_py()
    assert pc.min(gauges["value_int"]).as_py() >= 0


def test_sfx_export_roundtrip(ray_session, sf_dir, tmp_path):
    """exporter∘receiver identity: re-exported dump decodes to the same
    multiset of datapoints (sorted-table equality)."""
    path = corpus.ensure_sfx_dump(sf_dir)
    out = str(tmp_path / "sfx_rt")
    n = write_sfx_dump(read_sfx_dump(path), out)
    a = read_sfx_dump(path).to_pandas()
    b = read_sfx_dump(out).to_pandas()
    assert n == len(a) == len(b)
    key = ["conv_id", "turn_idx", "metric"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
