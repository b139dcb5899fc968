"""Real PNG/JPEG/WAV decode path (r3 VERDICT item 7 + r4 stretch JPEG):
pure-numpy codecs round-trip, feature extraction on decoded pixels/samples,
real resize re-encode."""

import numpy as np
import pyarrow as pa
import pytest

from splunk_otel_collector_ray.stages.imagecodecs import (
    PNG_MAGIC,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_jpeg,
    encode_png,
    encode_wav,
)
from splunk_otel_collector_ray.stages.multimodal import (
    FeatureExtractStage,
    ResizeStage,
    decode_image,
    make_real_items,
)


def test_png_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(11)
    for shape in [(5, 7), (9, 4, 3), (6, 6, 4), (1, 1), (2, 3, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert (out == img).all()


def test_png_sub_and_up_filters_decode():
    """The decoder must handle filtered scanlines (sub=1, up=2), not just
    the filter-0 rows our encoder emits."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    rows, prev = [], np.zeros(15, np.int64)
    for y in range(4):
        line = img[y].reshape(-1).astype(np.int64)
        if y % 2 == 0:  # sub
            filt = np.empty(15, np.int64)
            filt[:3] = line[:3]
            filt[3:] = (line[3:] - line[:-3]) % 256
            rows.append(bytes([1]) + bytes(filt.astype(np.uint8)))
        else:  # up
            rows.append(bytes([2]) + bytes(((line - prev) % 256)
                                           .astype(np.uint8)))
        prev = line

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    assert (decode_png(png) == img).all()


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(5)
    mono = rng.integers(-3000, 3000, 200).astype(np.int16)
    d, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and (d == mono).all()
    stereo = rng.integers(-3000, 3000, (64, 2)).astype(np.int16)
    d2, _ = decode_wav(encode_wav(stereo))
    assert (d2 == stereo).all()


def test_decode_image_png_and_jpeg_real_other_stub():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (decode_image(encode_png(img)) == img).all()
    # JPEG is lossy: decode through the SAME entry point, bounded error
    yy, xx = np.mgrid[0:16, 0:24]
    smooth = np.stack([(yy * 7) % 256, (xx * 5) % 256,
                       ((yy + xx) * 3) % 256], axis=2).astype(np.uint8)
    dec = decode_image(encode_jpeg(smooth, 90))
    assert dec.shape == smooth.shape
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 24
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a not an image we can decode")


def test_jpeg_roundtrip_quality_and_shapes():
    """Baseline JPEG codec: gray + RGB, non-multiple-of-8 dims, error
    shrinking as quality rises; progressive (SOF2) honestly refused."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:40, 0:56]
    rgb = np.stack([(yy * 4) % 256, (xx * 3) % 256,
                    ((yy + xx) * 2) % 256], axis=2).astype(np.uint8)
    errs = []
    for q in (60, 85, 95):
        dec = decode_jpeg(encode_jpeg(rgb, q))
        assert dec.shape == rgb.shape and dec.dtype == np.uint8
        errs.append(np.abs(dec.astype(int) - rgb.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2] and errs[2] < 1.0

    gray = ((yy * 2 + xx) % 256).astype(np.uint8)
    decg = decode_jpeg(encode_jpeg(gray, 90))
    assert decg.shape == gray.shape and decg.ndim == 2

    odd = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd, 85)).shape == (13, 21, 3)

    # flip SOF0 to SOF2 (progressive) in a real stream → refused
    buf = bytearray(encode_jpeg(gray, 85))
    buf[buf.index(b"\xff\xc0")+1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))


def test_feature_extract_uses_decoded_pixels():
    """Real items: features equal chunk means of DECODED pixels/samples,
    not of the compressed payload bytes."""
    items = make_real_items(16)
    mimes = items["mime"].to_pylist()
    assert "image/jpeg" in mimes  # the fixture must exercise real JPEG
    out = FeatureExtractStage()(items).to_pandas()
    k = FeatureExtractStage.FEAT_DIM
    for i, (mime, buf) in enumerate(zip(mimes,
                                        items["payload"].to_pylist())):
        flat = (decode_png(buf) if mime == "image/png"
                else decode_jpeg(buf) if mime == "image/jpeg"
                else decode_wav(buf)[0]).astype(np.float64).ravel()
        ref = [c.mean() for c in np.array_split(flat, k)]
        assert np.allclose(out.features[i], np.array(ref, np.float32))


def test_feature_extract_stub_fallback_unchanged():
    """real_decode on non-decodable payloads must equal the pure stub."""
    from splunk_otel_collector_ray.stages.multimodal import make_fake_items

    items = make_fake_items(8)
    a = FeatureExtractStage(real_decode=True)(items).to_pandas()
    b = FeatureExtractStage(real_decode=False)(items).to_pandas()
    for fa, fb in zip(a.features, b.features):
        assert list(fa) == list(fb)


def test_resize_real_png_reencodes_target_dims():
    items = make_real_items(16)
    out = ResizeStage(target_width=6, target_height=5)(items)
    assert set(out["width"].to_pylist()) == {6}
    assert set(out["height"].to_pylist()) == {5}
    for mime, orig, new in zip(items["mime"].to_pylist(),
                               items["payload"].to_pylist(),
                               out["payload"].to_pylist()):
        if mime == "image/png":
            img, small = decode_png(orig), decode_png(bytes(new))
            assert small.shape[:2] == (5, 6)
            h, w = img.shape[:2]
            yy, xx = np.arange(5) * h // 5, np.arange(6) * w // 6
            assert (small == img[np.ix_(yy, xx)]).all()
        elif mime == "image/jpeg":  # lossy re-encode: dims + bounded error
            img, small = decode_jpeg(orig), decode_jpeg(bytes(new))
            assert small.shape[:2] == (5, 6)
            h, w = img.shape[:2]
            yy, xx = np.arange(5) * h // 5, np.arange(6) * w // 6
            ref = img[np.ix_(yy, xx)].astype(int)
            assert np.abs(small.astype(int) - ref).mean() < 64


def test_real_items_schema_matches_fake():
    from splunk_otel_collector_ray.stages.multimodal import (
        MULTIMODAL_SCHEMA,
        make_fake_items,
    )

    assert make_real_items(4).schema.equals(MULTIMODAL_SCHEMA)
    assert make_fake_items(4).schema.equals(MULTIMODAL_SCHEMA)


def test_avi_mjpeg_roundtrip_bit_exact():
    """Mux → demux returns the exact JFIF frame bytes plus the header
    dims/fps; odd-length frames exercise the RIFF word-alignment rule."""
    from splunk_otel_collector_ray.stages.videocodecs import (
        decode_avi_mjpeg, encode_avi_mjpeg)

    rng = np.random.default_rng(3)
    frames = [encode_jpeg(rng.integers(0, 256, (16, 24, 3), dtype=np.uint8))
              for _ in range(5)]
    if not any(len(f) % 2 for f in frames):  # force the RIFF word-alignment
        frames[2] += b"\x00"                 # (pad) path to be exercised
    assert any(len(f) % 2 for f in frames)
    avi = encode_avi_mjpeg(frames, 24, 16, fps=30)
    got, w, h, fps = decode_avi_mjpeg(avi)
    assert (w, h, fps) == (24, 16, 30)
    assert got == frames
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"not a riff at all")


def test_frame_sample_demuxes_real_avi():
    """FrameSampleStage on AVI payloads emits every stride-th REAL JPEG
    frame (decodable by the repo's own codec); non-AVI rows in the same
    batch still take the fixed-size slicing path."""
    from splunk_otel_collector_ray.stages.multimodal import (
        FrameSampleStage, make_video_items)

    t = make_video_items(4, seed=9)
    stage = FrameSampleStage(frame_bytes=64, stride=2)
    out = stage(t)
    ids = out["item_id"].to_numpy(zero_copy_only=False)
    idx = out["frame_idx"].to_numpy(zero_copy_only=False)
    assert set(ids) == {0, 1, 2, 3}
    assert (idx % 2 == 0).all()
    # every sampled frame is a complete JFIF image with the right dims
    w = t["width"].to_numpy(zero_copy_only=False)
    h = t["height"].to_numpy(zero_copy_only=False)
    for row in range(out.num_rows):
        img = decode_jpeg(out["frame"][row].as_py())
        assert img.shape == (h[ids[row]], w[ids[row]], 3)
    # mixed batch: append one non-AVI payload -> fixed slicing path rows
    mixed = pa.table({
        "item_id": pa.array([0, 99], type=pa.int64()),
        "mime": pa.array(["video/x-msvideo", "application/octet-stream"]),
        "payload": pa.array([t["payload"][0].as_py(), b"\x01" * 200],
                            type=pa.large_binary()),
        "width": pa.array([0, 0], type=pa.int32()),
        "height": pa.array([0, 0], type=pa.int32()),
    })
    m = stage(mixed)
    mids = m["item_id"].to_numpy(zero_copy_only=False)
    assert 99 in mids and 0 in mids
    sliced = m.filter(pa.array(mids == 99))
    assert all(len(p) == 64 for p in sliced["frame"].to_pylist())


def test_frame_sample_riff_but_not_avi_falls_back():
    """RIFF payloads that are NOT MJPEG AVIs (WAV clips, truncated AVIs)
    must take the fixed-size slicing path, never crash the demuxer."""
    from splunk_otel_collector_ray.stages.imagecodecs import encode_wav
    from splunk_otel_collector_ray.stages.multimodal import (
        FrameSampleStage, make_video_items)

    t = make_video_items(2, seed=1)
    wav = encode_wav(np.arange(-500, 500, dtype=np.int16), 16000)
    truncated_avi = t["payload"][0].as_py()[:40]
    mixed = pa.table({
        "item_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "mime": pa.array(["video/x-msvideo", "audio/wav",
                          "video/x-msvideo", "application/octet-stream"]),
        "payload": pa.array(
            [t["payload"][0].as_py(), wav, truncated_avi, b"\x02" * 300],
            type=pa.large_binary()),
        "width": pa.array([0] * 4, pa.int32()),
        "height": pa.array([0] * 4, pa.int32()),
    })
    out = FrameSampleStage(frame_bytes=16, stride=2)(mixed)
    ids = set(out["item_id"].to_numpy(zero_copy_only=False))
    assert ids == {0, 1, 2, 3}  # 0 demuxed; 1-3 sliced, none crashed


def test_avi_demux_fuzz_never_crashes_unexpectedly():
    """Adversarial inputs: the demuxer must either return frames or raise
    ValueError — never IndexError/struct.error/hang (the fallback contract
    FrameSampleStage relies on)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from splunk_otel_collector_ray.stages.videocodecs import (
        decode_avi_mjpeg, encode_avi_mjpeg)

    base = encode_avi_mjpeg([b"\xff\xd8fakejpeg\xff\xd9"] * 3, 8, 8)

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=64),
           st.integers(0, len(base) - 1), st.integers(0, 255))
    def run(junk, pos, byte):
        corrupted = base[:pos] + bytes([byte]) + base[pos + 1:]
        for payload in (junk, b"RIFF" + junk, corrupted,
                        base[:pos]):
            try:
                frames, w, h, fps = decode_avi_mjpeg(payload)
                assert isinstance(frames, list) and frames
            except ValueError:
                pass  # the contracted failure mode

    run()
