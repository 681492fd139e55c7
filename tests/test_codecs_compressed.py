"""Compressed-format codecs: the pure-stdlib PNG path (always on) and
the opportunistic PIL/av slots (golden-fixture tests that skip cleanly
when the libs are absent — VERDICT r3 #6)."""

import io

import numpy as np
import pyarrow as pa
import pytest

from bigdime_ray.functions.codecs import (decode_png, encode_png,
                                          encode_wav)
from bigdime_ray.pipelines.multimodal import (MediaFeatureExtractor,
                                              MediaResizer)


def _rgb(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


def test_png_round_trip_shapes():
    rng = np.random.default_rng(1)
    for shape in [(5, 7, 3), (4, 4), (3, 9, 4), (1, 1, 3), (64, 48, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_png(encode_png(px))
        assert out.shape == px.shape
        assert (out == px).all()


def _forward_filter(px: np.ndarray, ftype: int) -> bytes:
    """Reference forward PNG filtering (RFC 2083 §6) — builds the raw
    scanline stream our decoder must invert."""
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int64)
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        left = np.r_[np.zeros(ch, dtype=np.int64), cur[:-ch]]
        pleft = np.r_[np.zeros(ch, dtype=np.int64), prior[:-ch]]
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prior
        elif ftype == 3:
            filt = cur - ((left + prior) >> 1)
        else:  # Paeth
            p = left + prior - pleft
            pa_, pb, pc_ = (np.abs(p - left), np.abs(p - prior),
                            np.abs(p - pleft))
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prior, pleft))
            filt = cur - pred
        out.append(ftype)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prior = cur
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_every_filter_type(ftype):
    """Our encoder emits filter 0 only, but PIL/libpng-written files use
    all five — decode must invert each (verified against an independent
    forward-filter implementation)."""
    import struct
    import zlib

    from bigdime_ray.functions.codecs import _png_chunk, _PNG_SIG
    px = _rgb(11, 6, seed=ftype)
    ihdr = struct.pack(">IIBBBBB", 6, 11, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT",
                            zlib.compress(_forward_filter(px, ftype)))
               + _png_chunk(b"IEND", b""))
    assert (decode_png(payload) == px).all()


def test_png_through_feature_extractor_and_resizer():
    px = _rgb(20, 30, seed=3)
    batch = pa.table({
        "media_id": pa.array(["png-0"]),
        "kind": pa.array(["image"]),
        "payload": pa.array([encode_png(px)], type=pa.binary()),
        "width": pa.array([30], type=pa.int32()),
        "height": pa.array([20], type=pa.int32())})
    feat = MediaFeatureExtractor(decoder="auto")(batch)
    assert feat["decode_ok"].to_pylist() == [True]
    assert feat["decoded_width"].to_pylist() == [30]
    assert feat["decoded_height"].to_pylist() == [20]
    # real-pixel check: channel means of the features match the input
    f = np.asarray(feat["features"].to_pylist()[0])
    expect = px.reshape(-1, 3).mean(axis=0) / 255.0
    np.testing.assert_allclose(f[:3], expect, atol=1e-6)

    resized = MediaResizer(width=8, height=4, decoder="auto")(batch)
    out_payload = resized["payload"].to_pylist()[0]
    out_px = decode_png(out_payload)
    assert out_px.shape == (4, 8, 3)
    assert resized["width"].to_pylist() == [8]
    assert resized["height"].to_pylist() == [4]


def test_pil_slot_raises_cleanly_when_absent():
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present — the golden JPEG test covers the slot")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        MediaFeatureExtractor(decoder="pil")


def test_av_slot_raises_cleanly_when_absent():
    try:
        import av  # noqa: F401
        pytest.skip("av present — the golden MP3 test covers the slot")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PyAV"):
        MediaFeatureExtractor(decoder="av")


def test_golden_jpeg_via_pil_slot():
    """Golden compressed-image fixture: turns on with zero code change
    if the container gains PIL (skips cleanly here)."""
    Image = pytest.importorskip("PIL.Image")
    px = _rgb(16, 16, seed=7)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="JPEG", quality=95)
    batch = pa.table({
        "media_id": pa.array(["jpg-0"]),
        "kind": pa.array(["image"]),
        "payload": pa.array([buf.getvalue()], type=pa.binary()),
        "width": pa.array([16], type=pa.int32()),
        "height": pa.array([16], type=pa.int32())})
    feat = MediaFeatureExtractor(decoder="pil")(batch)
    assert feat["decode_ok"].to_pylist() == [True]
    f = np.asarray(feat["features"].to_pylist()[0])
    expect = px.reshape(-1, 3).mean(axis=0) / 255.0
    # JPEG is lossy: channel means must agree loosely, not exactly
    np.testing.assert_allclose(f[:3], expect, atol=0.05)

    # PIL also cross-checks our own PNG encoder bit-for-bit
    via_pil = np.asarray(
        Image.open(io.BytesIO(encode_png(px))).convert("RGB"))
    assert (via_pil == px).all()


def test_golden_mp3_via_av_slot():
    """Golden compressed-audio fixture: turns on with zero code change
    if the container gains PyAV (skips cleanly here)."""
    av = pytest.importorskip("av")
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    samples = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp3") as out:
        stream = out.add_stream("mp3", rate=sr)
        frame = av.AudioFrame.from_ndarray(samples[None, :], format="s16p",
                                           layout="mono")
        frame.sample_rate = sr
        for packet in stream.encode(frame):
            out.mux(packet)
        for packet in stream.encode(None):
            out.mux(packet)
    batch = pa.table({
        "media_id": pa.array(["mp3-0"]),
        "kind": pa.array(["audio"]),
        "payload": pa.array([buf.getvalue()], type=pa.binary()),
        "width": pa.array([0], type=pa.int32()),
        "height": pa.array([0], type=pa.int32())})
    feat = MediaFeatureExtractor(decoder="av")(batch)
    assert feat["decode_ok"].to_pylist() == [True]
    # compare against the lossless WAV path on the same samples
    wav_batch = batch.set_column(
        batch.schema.get_field_index("payload"), "payload",
        pa.array([encode_wav(samples, sr)], type=pa.binary()))
    ref = np.asarray(MediaFeatureExtractor(decoder="auto")(
        wav_batch)["features"].to_pylist()[0])
    got = np.asarray(feat["features"].to_pylist()[0])
    np.testing.assert_allclose(got, ref, atol=0.1)
