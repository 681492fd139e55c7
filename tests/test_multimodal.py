"""Multimodal plumbing: binary payload schema, actor-pool decode stage."""

import pyarrow as pa
import pytest
import ray.data

from bigdime_ray.pipelines.multimodal import (MEDIA_SCHEMA,
                                              MediaFeatureExtractor,
                                              encode_fake_media,
                                              extract_media_features,
                                              synth_media_table)


def test_synth_media_schema():
    t = synth_media_table(50)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert t.num_rows == 50
    # deterministic
    assert t.equals(synth_media_table(50))


def test_extractor_direct():
    t = synth_media_table(10)
    ex = MediaFeatureExtractor()
    out = ex(t)
    assert out["decode_ok"].to_pylist() == [True] * 10
    assert all(len(f) == 8 for f in out["features"].to_pylist())
    assert out["decoded_width"].to_pylist() == t["width"].to_pylist()


def test_extractor_bad_payload_flagged():
    t = synth_media_table(2)
    bad = t.set_column(2, "payload", pa.array([b"nope", t["payload"][1].as_py()],
                                              type=pa.binary()))
    out = MediaFeatureExtractor()(bad)
    assert out["decode_ok"].to_pylist() == [False, True]


def test_actor_pool_stage():
    ds = ray.data.from_arrow(synth_media_table(64)).repartition(4)
    out = extract_media_features(ds, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 64 and out.decode_ok.all()


def test_real_decoder_stubbed():
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decoder="librosa")


def test_resize_media():
    from bigdime_ray.pipelines.multimodal import (MediaFeatureExtractor,
                                                  resize_media)
    ds = ray.data.from_arrow(synth_media_table(30))
    out = resize_media(ds, 64, 64, concurrency=2,
                       decoder="fake").materialize()
    pdf = out.to_pandas()
    imgs = pdf[pdf.kind != "audio"]
    assert (imgs.width == 64).all() and (imgs.height == 64).all()
    # resized payload still decodes, with the new dims
    feats = MediaFeatureExtractor()(
        pa.Table.from_pandas(pdf, preserve_index=False))
    f = feats.to_pandas()
    assert f[f.kind != "audio"].decoded_width.eq(64).all()
    assert f.decode_ok.all()


def test_frame_sample():
    from bigdime_ray.pipelines.multimodal import frame_sample
    tbl = synth_media_table(40)
    n_videos = sum(1 for k in tbl["kind"].to_pylist() if k == "video")
    out = frame_sample(ray.data.from_arrow(tbl), num_frames=3).to_pandas()
    assert len(out) == 3 * n_videos
    assert set(out.frame_index) == {0, 1, 2}
    assert (out.kind == "frame").all()


def test_resize_tolerates_corrupt_payloads():
    """Review finding (r2): the vectorized header patch must not spill
    into the NEXT row when a payload is truncated."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.multimodal import (MEDIA_SCHEMA,
                                                  encode_fake_media,
                                                  resize_media)
    good = encode_fake_media("m-ok", "image", 64, 64, 0, seed=1)
    rows = [
        {"media_id": "m-bad", "kind": "image", "payload": b"\x01\x02",
         "width": 0, "height": 0, "sample_rate": 0},
        {"media_id": "m-ok", "kind": "image", "payload": good,
         "width": 64, "height": 64, "sample_rate": 0},
    ]
    tbl = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
    out = resize_media(ray.data.from_arrow(tbl), 128, 128,
                       concurrency=1, decoder="fake").to_pandas()
    out = out.set_index("media_id")
    assert out.loc["m-bad", "payload"] == b"\x01\x02"  # untouched
    ok = out.loc["m-ok", "payload"]
    assert ok[:4] == b"FAKE"
    w, h, _ = np.frombuffer(ok[4:16], dtype=np.int32)
    assert (w, h) == (128, 128)
    assert ok[16:] == good[16:]  # body preserved


def test_perceptual_hashes_stability_and_separation():
    """dHash: small pixel noise flips few bits; a different image flips
    many. Audio envelope fingerprint survives gain changes exactly."""
    import numpy as np
    from bigdime_ray.functions.codecs import encode_wav
    from bigdime_ray.pipelines.dedup import hamming64
    from bigdime_ray.pipelines.multimodal import (_dhash_audio,
                                                  _dhash_image)
    rng = np.random.default_rng(7)
    gx = np.linspace(0, 255, 32)
    base = np.clip(np.stack([gx[None, :].repeat(24, 0)] * 3, axis=2),
                   0, 255).astype(np.uint8)
    noisy = np.clip(base.astype(np.int64)
                    + rng.integers(-8, 9, base.shape), 0, 255) \
        .astype(np.uint8)
    other = rng.integers(0, 256, base.shape).astype(np.uint8)
    h_base = np.asarray([_dhash_image(base)], dtype=np.uint64)
    h_noisy = np.asarray([_dhash_image(noisy)], dtype=np.uint64)
    h_other = np.asarray([_dhash_image(other)], dtype=np.uint64)
    assert hamming64(h_base, h_noisy)[0] <= 6
    assert hamming64(h_base, h_other)[0] > 10
    t = np.arange(800) / 16000.0
    wave = np.sin(2 * np.pi * 440 * t) * (1 + 0.5 * np.sin(
        2 * np.pi * 3 * t))
    a = (wave * 16000).astype(np.int16)
    b = (wave * 8000).astype(np.int16)  # half gain, same shape
    from bigdime_ray.functions.codecs import decode_wav
    sa = _dhash_audio(decode_wav(encode_wav(a, 16000))[0])
    sb = _dhash_audio(decode_wav(encode_wav(b, 16000))[0])
    assert hamming64(np.asarray([sa], dtype=np.uint64),
                     np.asarray([sb], dtype=np.uint64))[0] <= 2


def test_media_perceptual_dedup_finds_planted_pairs():
    """Planted near-dup media (noise-perturbed image copy, gain-scaled
    audio copy) are found; the undecodable row is excluded; unrelated
    media do not pair."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.multimodal import (media_perceptual_dedup,
                                                  synth_real_media_table)
    from bigdime_ray.functions.codecs import (decode_image, decode_wav,
                                              encode_ppm, encode_wav)
    t = synth_real_media_table(24, seed=11).to_pandas()
    rng = np.random.default_rng(3)
    extra = []
    img_src = t[t.kind == "image"].iloc[0]
    px = decode_image(img_src.payload)  # PPM / PNG / JPEG source
    noisy = np.clip(px.astype(np.int64) + rng.integers(-4, 5, px.shape),
                    0, 255).astype(np.uint8)
    extra.append({"media_id": "dup-img", "kind": "image",
                  "payload": encode_ppm(noisy), "width": px.shape[1],
                  "height": px.shape[0], "sample_rate": 0})
    aud_src = t[t.kind == "audio"].iloc[0]
    samples, sr = decode_wav(aud_src.payload)  # int16 samples
    half_gain = (samples.astype(np.float64) * 0.5).astype(np.int16)
    extra.append({"media_id": "dup-aud", "kind": "audio",
                  "payload": encode_wav(half_gain, sr), "width": 0,
                  "height": 0, "sample_rate": sr})
    extra.append({"media_id": "junk", "kind": "image",
                  "payload": b"\x00garbage", "width": 0, "height": 0,
                  "sample_rate": 0})
    import pandas as pd
    full = pd.concat([t, pd.DataFrame(extra)], ignore_index=True)
    ds = rd.from_arrow(pa.Table.from_pandas(full)).repartition(3)
    # concurrency < cluster CPUs: an actor pool sized to ALL cpus can
    # deadlock the unfused upstream (repo-wide known Ray behavior)
    res = media_perceptual_dedup(ds, max_hamming=6, concurrency=2)
    pairs = {frozenset((a, b)) for a, b in
             zip(res.pairs.id_a, res.pairs.id_b)}
    assert frozenset((img_src.media_id, "dup-img")) in pairs
    assert frozenset((aud_src.media_id, "dup-aud")) in pairs
    flat = {i for p in pairs for i in p}
    assert "junk" not in flat


def test_probe_media_metadata_stage():
    """Header-only probe: correct format/dims/rate per payload class
    (PPM + PNG + JPEG images, P6 video streams, WAV audio) without a
    full decode; corrupt rows flagged, not fatal."""
    import ray.data as rd
    from bigdime_ray.pipelines.multimodal import (probe_media_metadata,
                                                  synth_real_media_table)
    t = synth_real_media_table(40, seed=15).to_pandas()
    t.loc[len(t)] = {"media_id": "junk", "kind": "image",
                     "payload": b"\x00nope", "width": 0, "height": 0,
                     "sample_rate": 0}
    ds = rd.from_arrow(pa.Table.from_pandas(t)).repartition(3)
    out = probe_media_metadata(ds).to_pandas().set_index("media_id")
    src = t.set_index("media_id")
    for mid, row in src.iterrows():
        got = out.loc[mid]
        if mid == "junk":
            assert not got.probe_ok and got.format == "unknown"
        elif row.kind == "audio":
            assert got.format in ("wav", "flac")
            assert got.sample_rate == row.sample_rate
            assert got.duration_us > 0
        elif row.kind == "video":
            assert got.format == "ppm" and got.frames >= 3
            assert (got.width, got.height) == (row.width, row.height)
        else:
            assert got.format in ("ppm", "png", "jpeg")
            assert (got.width, got.height) == (row.width, row.height)
    # images rotate through all three codecs
    assert {"ppm", "png", "jpeg"} <= set(
        out[out.kind == "image"].format.unique())


def test_media_triage_query():
    """Driver-surface triage pipeline: probe admits only decodable
    formats, planted junk/truncated rows come back probe_ok=False and
    never reach the decode stage, admitted rows all decode."""
    import __ray_entry__ as e
    out = e.queries()["media_triage"]("/root/testdata/sf0.001").to_pandas()
    bad = out[out.media_id.str.startswith("junk")]
    assert len(bad) == 2 and (~bad.probe_ok).all() and (~bad.decode_ok).all()
    good = out[~out.media_id.str.startswith("junk")]
    assert good.probe_ok.all() and good.decode_ok.all()
    assert {"ppm", "png", "jpeg", "wav"} <= set(good.format.unique())
