"""Real pure-numpy media codecs (PPM / WAV / PPM-stream) and the real
multimodal decode→resize→frame-sample paths built on them."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from bigdime_ray.functions.codecs import (audio_features, decode_ppm,
                                          decode_wav, encode_ppm,
                                          encode_ppm_stream, encode_wav,
                                          image_features, iter_ppm_stream,
                                          resize_nearest)


def test_ppm_roundtrip():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    out = decode_ppm(encode_ppm(px))
    assert out.shape == (17, 23, 3)
    assert np.array_equal(out, px)


def test_ppm_header_comments_and_whitespace():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    raw = b"P6 # a comment\n# another\n 3\t2 \n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(raw), px)


def test_ppm_rejects_bad_input():
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError):  # truncated pixel data
        decode_ppm(b"P6\n4 4\n255\n\x00\x01")


def test_resize_nearest_exact():
    # 2x2 checkerboard upsampled 2x: each source pixel becomes a 2x2 block
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 1] = px[1, 0] = 255
    up = resize_nearest(px, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up[:2, :2], np.zeros((2, 2, 3), dtype=np.uint8))
    assert (up[:2, 2:] == 255).all() and (up[2:, :2] == 255).all()
    # identity resize is a no-op
    assert np.array_equal(resize_nearest(px, 2, 2), px)


def test_ppm_stream_roundtrip():
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
              for _ in range(4)]
    payload = encode_ppm_stream(frames)
    idx = iter_ppm_stream(payload)
    assert len(idx) == 4
    for (start, ln, w, h), f in zip(idx, frames):
        assert (w, h) == (7, 5)
        assert np.array_equal(decode_ppm(payload, start), f)
        # each frame slice is an independently decodable PPM
        assert np.array_equal(decode_ppm(payload[start:start + ln]), f)


def test_wav_roundtrip():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, 1000).astype(np.int16)
    out, sr = decode_wav(encode_wav(s, 16000))
    assert sr == 16000
    assert np.array_equal(out, s)


def test_wav_chunk_walk_and_stereo():
    # non-canonical chunk order (LIST before data) + stereo downmix
    import struct
    s = np.arange(-10, 10, dtype=np.int16)
    stereo = np.empty(2 * len(s), dtype=np.int16)
    stereo[0::2] = s          # channel 0
    stereo[1::2] = 99         # channel 1 (dropped)
    data = stereo.tobytes()
    fmt = struct.pack("<4sI", b"fmt ", 16) + struct.pack(
        "<HHIIHH", 1, 2, 22050, 22050 * 4, 4, 16)
    lst = struct.pack("<4sI", b"LIST", 5) + b"INFO\x00\x00"  # padded odd
    dat = struct.pack("<4sI", b"data", len(data)) + data
    body = lst + fmt + dat
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    out, sr = decode_wav(payload)
    assert sr == 22050
    assert np.array_equal(out, s)


def test_features_deterministic_and_bounded():
    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    f1, f2 = image_features(px), image_features(px)
    assert np.array_equal(f1, f2) and len(f1) == 8
    assert (f1 >= 0).all() and (f1 <= 1).all()
    s = (np.sin(np.arange(800) / 10) * 20000).astype(np.int16)
    a = audio_features(s, 16000)
    assert len(a) == 8 and np.array_equal(a, audio_features(s, 16000))
    assert np.array_equal(audio_features(np.empty(0, np.int16), 16000),
                          np.zeros(8))


# --------------------------- real multimodal pipeline over real media

def test_synth_real_media_all_decodable():
    from bigdime_ray.pipelines.multimodal import synth_real_media_table
    t = synth_real_media_table(60, seed=9)
    assert t.equals(synth_real_media_table(60, seed=9))  # deterministic
    for row in t.to_pylist():
        p = row["payload"]
        if row["kind"] == "audio":
            # audio rotates PCM16 / G.711 mu / G.711 A / ADPCM / FLAC
            if p[:4] == b"fLaC":
                from bigdime_ray.functions.flac import decode_flac_mono16
                s, sr = decode_flac_mono16(p)
            else:
                s, sr = decode_wav(p)
            assert sr == row["sample_rate"] and len(s) > 0
        elif row["kind"] == "image":
            # images rotate through PPM / PNG / baseline JPEG
            from bigdime_ray.functions.codecs import decode_image
            px = decode_image(p)
            assert px.shape == (row["height"], row["width"], 3)
        else:
            idx = iter_ppm_stream(p)
            assert 3 <= len(idx) <= 5
            assert all((w, h) == (row["width"], row["height"])
                       for _, _, w, h in idx)


def test_extractor_auto_real_media():
    from bigdime_ray.pipelines.multimodal import (MediaFeatureExtractor,
                                                  synth_real_media_table)
    t = synth_real_media_table(40, seed=10)
    out = MediaFeatureExtractor(decoder="auto")(t)
    assert out["decode_ok"].to_pylist() == [True] * 40
    df = out.to_pandas()
    src = t.to_pandas()
    vis = src.kind != "audio"
    assert (df.decoded_width[vis].to_numpy()
            == src.width[vis].to_numpy()).all()
    assert (df.decoded_width[~vis] == 0).all()
    # real pixel features vary across images (not a constant stub)
    feats = np.stack(df.features[vis].to_numpy())
    assert len(np.unique(feats, axis=0)) == len(feats)
    assert feats.std(axis=0).max() > 1e-4


def test_resize_media_auto_really_resamples():
    from bigdime_ray.pipelines.multimodal import (resize_media,
                                                  synth_real_media_table)
    t = synth_real_media_table(30, seed=11)
    out = resize_media(ray.data.from_arrow(t), 16, 12,
                       concurrency=2).to_pandas().set_index("media_id")
    for row in t.to_pylist():
        got = out.loc[row["media_id"]]
        if row["kind"] == "audio":
            assert got["payload"] == row["payload"]  # untouched
        elif row["kind"] == "image":
            from bigdime_ray.functions.codecs import decode_image
            px = decode_image(got["payload"])
            assert px.shape == (12, 16, 3)
            # resample of the source, not garbage
            src = decode_image(row["payload"])
            expect = resize_nearest(src, 16, 12)
            if row["payload"][:2] == b"\xff\xd8":
                # JPEG re-encode is lossy: near, not bit-equal
                err = np.abs(px.astype(int) - expect.astype(int))
                assert err.mean() < 12, err.mean()
            else:
                assert np.array_equal(px, expect)
        else:
            idx = iter_ppm_stream(got["payload"])
            assert all((w, h) == (16, 12) for _, _, w, h in idx)
            assert len(idx) == len(iter_ppm_stream(row["payload"]))
        if row["kind"] != "audio":
            assert (got["width"], got["height"]) == (16, 12)


def test_frame_sample_auto_real_frames():
    from bigdime_ray.pipelines.multimodal import (frame_sample,
                                                  synth_real_media_table)
    t = synth_real_media_table(50, seed=12)
    vids = {r["media_id"]: r for r in t.to_pylist() if r["kind"] == "video"}
    out = frame_sample(ray.data.from_arrow(t).repartition(3),
                       num_frames=3).to_pandas()
    counts = out.groupby("media_id").size()
    for mid, row in vids.items():
        n_src = len(iter_ppm_stream(row["payload"]))
        assert counts[mid] == min(3, n_src)
    # every emitted frame payload is an independently decodable PPM
    for _, r in out.iterrows():
        px = decode_ppm(r["payload"])
        src = vids[r["media_id"]]
        assert px.shape == (src["height"], src["width"], 3)


def test_media_pipeline_end_to_end_real():
    """Real decode → real resize → real frame split, chained as Ray
    actor-pool stages (the shape the 100 TB pipeline runs)."""
    from bigdime_ray.pipelines.multimodal import (MediaFeatureExtractor,
                                                  extract_media_features,
                                                  frame_sample,
                                                  resize_media,
                                                  synth_real_media_table)
    ds = ray.data.from_arrow(synth_real_media_table(48, seed=13)) \
        .repartition(4)
    resized = resize_media(ds, 10, 10, concurrency=2)
    frames = frame_sample(resized, num_frames=2).to_pandas()
    assert len(frames) > 0
    for p in frames.payload:
        assert decode_ppm(p).shape == (10, 10, 3)
    feats = extract_media_features(ds, concurrency=2).to_pandas()
    assert feats.decode_ok.all()


def test_gray_alpha_png_decodes_to_rgb():
    """ADVICE r4: PNG colortype 4 (gray+alpha) must come out of
    decode_image as (h, w, 3) with the luma replicated, never as a
    2-channel array leaking into image_features/_dhash_image."""
    import numpy as np

    from bigdime_ray.functions.codecs import (decode_image, encode_png,
                                              image_features, to_rgb)
    rng = np.random.default_rng(9)
    luma = rng.integers(0, 256, (12, 17)).astype(np.uint8)
    alpha = rng.integers(0, 256, (12, 17)).astype(np.uint8)
    payload = encode_png(np.stack([luma, alpha], axis=2))
    px = decode_image(payload)
    assert px.shape == (12, 17, 3)
    for c in range(3):
        np.testing.assert_array_equal(px[:, :, c], luma)
    # and the features path accepts it end-to-end
    f = image_features(px, 8)
    assert np.isfinite(f).all()
    # to_rgb: gray and RGBA still behave
    assert to_rgb(luma).shape == (12, 17, 3)
    rgba = rng.integers(0, 256, (5, 6, 4)).astype(np.uint8)
    np.testing.assert_array_equal(to_rgb(rgba), rgba[:, :, :3])


def test_g711_wav_round_trip():
    """G.711 μ-law/A-law WAV (format tags 7/6): the decode tables come
    from the spec's exact segment formulas (μ-law peak 32124, A-law
    peak 32256, μ-law code 0xFF = 0), encode is nearest-representable
    inversion — so representable values round-trip exactly and a sine
    survives within companding error."""
    import numpy as np

    from bigdime_ray.functions.codecs import (_g711_decode_table,
                                              decode_wav, encode_wav_g711,
                                              probe_media)
    mu = _g711_decode_table("mu").astype(np.int64)
    al = _g711_decode_table("a").astype(np.int64)
    assert mu.max() == 32124 and mu.min() == -32124
    assert al.max() == 32256 and al.min() == -32256
    assert mu[0xFF] == 0
    t = np.arange(4000)
    sine = (12000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    for law, table in (("mu", mu), ("a", al)):
        # representable values: exact round-trip
        got, sr = decode_wav(encode_wav_g711(table.astype(np.int16),
                                             16000, law))
        np.testing.assert_array_equal(got.astype(np.int64), table)
        assert sr == 16000
        # arbitrary audio: bounded companding error (segment width)
        got, _ = decode_wav(encode_wav_g711(sine, 16000, law))
        err = np.abs(got.astype(np.int64) - sine.astype(np.int64))
        assert err.max() < 1024 and err.mean() < 200
        meta = probe_media(encode_wav_g711(sine, 16000, law))
        assert meta["format"] == "wav" and meta["n_samples"] == 4000


def test_g711_wav_features_end_to_end():
    import numpy as np
    import pyarrow as pa

    from bigdime_ray.functions.codecs import encode_wav_g711
    from bigdime_ray.pipelines.multimodal import MediaFeatureExtractor
    t = np.arange(8000)
    sine = (9000 * np.sin(2 * np.pi * 220 * t / 22050)).astype(np.int16)
    batch = pa.table({
        "media_id": pa.array(["g711-0"]),
        "kind": pa.array(["audio"]),
        "payload": pa.array([encode_wav_g711(sine, 22050, "mu")],
                            type=pa.binary()),
        "width": pa.array([0], type=pa.int32()),
        "height": pa.array([0], type=pa.int32())})
    feat = MediaFeatureExtractor(decoder="auto")(batch)
    assert feat["decode_ok"].to_pylist() == [True]
    f = np.asarray(feat["features"].to_pylist()[0])
    assert np.isfinite(f).all() and np.abs(f).sum() > 0

def test_adpcm_wav_round_trip_and_scalar_parity():
    """IMA ADPCM WAV (format tag 0x11): the block-vectorized decoder
    must match a scalar straight-from-spec reference bit-exactly, a
    sine must survive within adaptive-delta error, and the fact chunk
    must trim final-block padding for any length."""
    import struct

    import numpy as np

    from bigdime_ray.functions.codecs import (_IMA_INDEX_TABLE,
                                              _IMA_STEP_TABLE, decode_wav,
                                              encode_wav_adpcm, probe_media)
    # published-constant sanity: 89 monotone steps 7..32767 growing ~1.1
    st = _IMA_STEP_TABLE
    assert len(st) == 89 and st[0] == 7 and st[-1] == 32767
    ratios = st[1:] / st[:-1]
    assert (np.diff(st) > 0).all() and ratios.min() > 1.04 \
        and ratios.max() < 1.15
    assert list(_IMA_INDEX_TABLE) == [-1, -1, -1, -1, 2, 4, 6, 8]

    t = np.arange(4000)
    sine = (12000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    payload = encode_wav_adpcm(sine, 16000)
    got, sr = decode_wav(payload)
    assert sr == 16000 and len(got) == 4000
    err = np.abs(got.astype(np.int64) - sine.astype(np.int64))
    snr = 10 * np.log10((sine.astype(np.float64) ** 2).mean()
                        / (err.astype(np.float64) ** 2).mean())
    assert snr > 20.0, snr

    # scalar reference decode (textbook recurrence, Python ints)
    pos, data, ba, fact = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            ba = struct.unpack_from("<HHIIHH", payload, pos + 8)[4]
        elif cid == b"fact":
            fact = struct.unpack_from("<I", payload, pos + 8)[0]
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    out = []
    for b0 in range(0, len(data), ba):
        blk = data[b0:b0 + ba]
        pred = struct.unpack_from("<h", blk, 0)[0]
        index = blk[2]
        out.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0xF, byte >> 4):
                step = int(_IMA_STEP_TABLE[index])
                mag = step >> 3
                if nib & 1:
                    mag += step >> 2
                if nib & 2:
                    mag += step >> 1
                if nib & 4:
                    mag += step
                pred = max(-32768, min(32767,
                                       pred + (-mag if nib & 8 else mag)))
                index = max(0, min(88, index + int(
                    _IMA_INDEX_TABLE[nib & 7])))
                out.append(pred)
    np.testing.assert_array_equal(
        np.asarray(out[:fact], dtype=np.int16), got)

    meta = probe_media(payload)
    assert meta["format"] == "wav" and meta["n_samples"] == 4000
    # edge lengths: empty / 1 / exact block multiple / one over
    for n in (0, 1, 505, 1010, 506):
        x = (np.sin(np.arange(n) * 0.1) * 20000).astype(np.int16)
        y, _ = decode_wav(encode_wav_adpcm(x, 16000))
        assert len(y) == n


def test_adpcm_wav_features_end_to_end():
    import numpy as np
    import pyarrow as pa

    from bigdime_ray.functions.codecs import encode_wav_adpcm
    from bigdime_ray.pipelines.multimodal import MediaFeatureExtractor
    t = np.arange(8000)
    sine = (9000 * np.sin(2 * np.pi * 220 * t / 22050)).astype(np.int16)
    batch = pa.table({
        "media_id": pa.array(["adpcm-0"]),
        "kind": pa.array(["audio"]),
        "payload": pa.array([encode_wav_adpcm(sine, 22050)],
                            type=pa.binary()),
        "width": pa.array([0], type=pa.int32()),
        "height": pa.array([0], type=pa.int32())})
    feat = MediaFeatureExtractor(decoder="auto")(batch)
    assert feat["decode_ok"].to_pylist() == [True]
    f = np.asarray(feat["features"].to_pylist()[0])
    assert np.isfinite(f).all() and np.abs(f).sum() > 0


def test_mel_features_tone_localization():
    """Log mel-filterbank energies: a pure tone's peak band must move
    monotonically with frequency, output stays in [0, 1], short inputs
    pad cleanly, and the mel path runs through the actor-pool stage."""
    import numpy as np
    import pyarrow as pa

    from bigdime_ray.functions.codecs import encode_wav, mel_features
    from bigdime_ray.pipelines.multimodal import MediaFeatureExtractor
    sr = 16000
    t = np.arange(sr // 4) / sr
    peaks = []
    for freq in (200.0, 1000.0, 3000.0, 6000.0):
        x = (0.6 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
        f = mel_features(x, sr, dim=8)
        assert f.shape == (8,) and np.isfinite(f).all()
        assert f.min() >= 0.0 and f.max() <= 1.0 + 1e-12
        peaks.append(int(np.argmax(f)))
    assert peaks == sorted(peaks) and peaks[0] < peaks[-1]
    # short input pads; silence stays finite
    assert np.isfinite(mel_features(np.zeros(10, np.int16), sr)).all()

    batch = pa.table({
        "media_id": pa.array(["mel-0"]),
        "kind": pa.array(["audio"]),
        "payload": pa.array(
            [encode_wav((0.5 * np.sin(2 * np.pi * 440 * t) * 32767)
                        .astype(np.int16), sr)], type=pa.binary()),
        "width": pa.array([0], type=pa.int32()),
        "height": pa.array([0], type=pa.int32())})
    feat = MediaFeatureExtractor(decoder="auto",
                                 audio_feature_set="mel")(batch)
    assert feat["decode_ok"].to_pylist() == [True]
    f = np.asarray(feat["features"].to_pylist()[0])
    assert np.isfinite(f).all() and f.max() > 0
