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
