"""Bloom-filter referential scale path."""

import numpy as np
import pyarrow as pa
import pytest

from bigdime_ray.functions.bloom import BloomFilter
from bigdime_ray.functions.hashing import hash_string_column
from bigdime_ray.pipelines.validate import ValidationRunConfig, run_validation
from bigdime_ray.synth import DefectSpec, SynthConfig, generate_dataset


def test_bloom_no_false_negatives_and_low_fp():
    members = [f"src-{i:06d}" for i in range(10_000)]
    bf = BloomFilter.from_strings(members, fp_rate=1e-4)
    h_in = hash_string_column(pa.array(members))
    assert bf.contains_hashes(h_in).all()  # zero false negatives
    outsiders = [f"other-{i:06d}" for i in range(20_000)]
    h_out = hash_string_column(pa.array(outsiders))
    fp = bf.contains_hashes(h_out).mean()
    assert fp < 1e-3, fp


def test_bloom_size_reasonable():
    bf = BloomFilter.build(1_000_000, fp_rate=1e-4)
    assert bf.bits.nbytes < 4 * 1_000_000  # ~2.4 MB for 1M keys


def test_validation_with_bloom_catalog(tmp_path):
    cfg = SynthConfig(num_rows=800, num_partitions=4, seed=31)
    base = str(tmp_path / "ds")
    planted = generate_dataset(base, cfg, DefectSpec(bad_source=3))
    rep = run_validation(ValidationRunConfig(
        input_dir=base, run_dir=str(tmp_path / "run"),
        suite=["referential", "record_count"], catalog_as_bloom=True))
    v = rep.violations.to_pandas()
    got = set(v[v.validator_id == "referential"].doc_id)
    assert got == set(planted.bad_source_doc_ids)
