"""FLAC codec (functions/flac.py): lossless round trips + integrity."""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdime_ray.functions.flac import (decode_flac, decode_flac_mono16,
                                        encode_flac)


def test_mono_random_round_trip():
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, 10_000).astype(np.int16)
    y, sr = decode_flac(encode_flac(x, 22050, block_size=1024))
    assert sr == 22050
    assert np.array_equal(y[:, 0], x.astype(np.int32))


def test_sine_compresses_with_lpc():
    # a HIGH-frequency tone: the optimal 2-tap predictor [2cos w, -1]
    # has non-integer coefficients, so FIXED predictors cannot model it
    # and quantized LPC must win
    t = np.arange(44100)
    x = (12000 * np.sin(2 * np.pi * 3571 * t / 44100)).astype(np.int16)
    lpc = encode_flac(x, 44100, use_lpc=True)
    fixed = encode_flac(x, 44100, use_lpc=False)
    assert np.array_equal(decode_flac(lpc)[0][:, 0], x)
    assert np.array_equal(decode_flac(fixed)[0][:, 0], x)
    assert len(lpc) < 0.7 * len(fixed) < len(fixed) < x.nbytes


@pytest.mark.parametrize("mode", ["auto", "indep", "ls", "rs", "ms"])
def test_stereo_modes(mode):
    rng = np.random.default_rng(3)
    l = (8000 * np.sin(np.arange(6000) / 20)).astype(np.int16)
    r = (l // 2 + rng.integers(-50, 50, 6000)).astype(np.int16)
    x = np.stack([l, r], axis=1)
    blob = encode_flac(x, 16000, block_size=512, stereo_mode=mode)
    y, sr = decode_flac(blob)
    assert np.array_equal(y, x.astype(np.int32))


def test_edge_signals():
    for sig in (np.zeros(0, np.int16),
                np.array([7], np.int16),
                np.array([32767, -32768], np.int16),
                np.full(999, -5, np.int16)):
        y, _ = decode_flac(encode_flac(sig, 8000))
        assert np.array_equal(y[:, 0], sig.astype(np.int32))


def test_constant_block_is_tiny():
    blob = encode_flac(np.zeros(4096, np.int16), 8000)
    assert len(blob) < 120  # CONSTANT subframe, not 8 KB verbatim


def test_corruption_detected():
    rng = np.random.default_rng(4)
    x = rng.integers(-500, 500, 3000).astype(np.int16)
    blob = bytearray(encode_flac(x, 8000))
    blob[len(blob) // 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError):
        decode_flac(b"not flac at all")
    with pytest.raises(ValueError):
        decode_flac(bytes(encode_flac(x, 8000))[:40])  # truncated


def test_deterministic_bytes():
    rng = np.random.default_rng(5)
    x = rng.integers(-1000, 1000, 5000).astype(np.int16)
    assert encode_flac(x, 16000) == encode_flac(x, 16000)


def test_mono16_helper_and_probe():
    from bigdime_ray.functions.codecs import probe_media
    x = (3000 * np.sin(np.arange(4000) / 9)).astype(np.int16)
    blob = encode_flac(x, 44100)
    got, sr = decode_flac_mono16(blob)
    assert sr == 44100 and np.array_equal(got, x)
    m = probe_media(blob)
    assert m == {"format": "flac", "sample_rate": 44100, "channels": 1,
                 "bits_per_sample": 16, "n_samples": 4000,
                 "duration_s": round(4000 / 44100, 6), "kind": "audio"}


def test_media_features_decode_flac():
    from bigdime_ray.pipelines.multimodal import MediaFeatureExtractor
    import pyarrow as pa
    x = (9000 * np.sin(np.arange(8000) / 15)).astype(np.int16)
    ex = MediaFeatureExtractor(decoder="auto")
    batch = pa.table({"media_id": ["a"], "kind": ["audio"],
                      "payload": pa.array([encode_flac(x, 16000)],
                                          type=pa.binary()),
                      "width": pa.array([0], type=pa.int32()),
                      "height": pa.array([0], type=pa.int32()),
                      "sample_rate": pa.array([16000], type=pa.int32())})
    out = ex(batch)
    feats = out["features"][0].as_py()
    assert len(feats) == 8 and all(np.isfinite(feats))


@given(n=st.integers(0, 2500), seed=st.integers(0, 2**31 - 1),
       block=st.sampled_from([192, 256, 1000, 4096]),
       lpc=st.booleans())
@settings(max_examples=25, deadline=None)
def test_round_trip_property(n, seed, block, lpc):
    """ANY int16 signal round-trips bit-exactly at any block size,
    and the stream MD5 + CRCs all verify."""
    rng = np.random.default_rng(seed)
    # mix tonal + noise + silence so every subframe type gets exercised
    kind = seed % 3
    if kind == 0:
        x = rng.integers(-32768, 32768, n).astype(np.int16)
    elif kind == 1:
        x = (10000 * np.sin(np.arange(n) / 7)).astype(np.int16)
    else:
        x = np.zeros(n, np.int16)
    y, sr = decode_flac(encode_flac(x, 16000, block_size=block,
                                    use_lpc=lpc))
    assert sr == 16000
    assert np.array_equal(y[:, 0], x.astype(np.int32))
