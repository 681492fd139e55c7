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
