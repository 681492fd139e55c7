"""Synthetic generator: determinism, shape, defect planting."""

import os

import numpy as np
import pyarrow.parquet as pq

from bigdime_ray.schema import TOKENS_SCHEMA, check_schema
from bigdime_ray.synth import (DefectSpec, SynthConfig, gen_partition,
                               generate_dataset, source_probs)


def test_gen_partition_deterministic_and_shaped():
    cfg = SynthConfig(num_rows=1000, num_partitions=4, seed=7)
    a = gen_partition(cfg, 0, 250)
    b = gen_partition(cfg, 0, 250)
    assert a.equals(b)
    assert a.schema.equals(TOKENS_SCHEMA)
    assert check_schema(a.schema).ok
    ntok = a["n_tok"].to_numpy()
    lens = [len(x) for x in a["tokens"].to_pylist()]
    assert list(ntok) == lens
    # hot source key ~40%
    src = a["source"].to_pylist()
    assert src.count("web") / len(src) > 0.25


def test_source_probs_sum_to_one():
    p = source_probs()
    assert abs(p.sum() - 1.0) < 1e-12 and p[0] == 0.4


def test_generate_dataset_layout_and_manifest(tmp_path):
    out = str(tmp_path / "ds")
    cfg = SynthConfig(num_rows=400, num_partitions=4, seed=11)
    generate_dataset(out, cfg)
    parts = sorted(os.listdir(os.path.join(out, "data")))
    assert parts == [f"partition_id=p000{i}" for i in range(4)]
    man = pq.read_table(os.path.join(out, "ingest_manifest.parquet"))
    assert man.num_rows == 4
    assert sum(man["expected_rows"].to_pylist()) == 400
    cat = pq.read_table(os.path.join(out, "source_catalog.parquet"))
    assert cat.num_rows == 20


def test_defect_planting_recorded(tmp_path):
    out = str(tmp_path / "dirty")
    cfg = SynthConfig(num_rows=400, num_partitions=4, seed=11)
    defects = DefectSpec(dup_intra=1, dup_cross=1, bad_source=2,
                         ntok_mismatch=1, token_oob=1, token_null=1,
                         ref_corrupt_rows=2)
    planted = generate_dataset(out, cfg, defects, write_reference=True)
    assert len(planted.dup_doc_ids) == 2
    assert len(planted.bad_source_doc_ids) == 2
    assert len(planted.ntok_mismatch_doc_ids) == 1
    assert len(planted.token_oob_doc_ids) == 1
    assert len(planted.token_null_doc_ids) == 1
    assert len(planted.ref_corrupt_doc_ids) == 2
    assert os.path.isdir(os.path.join(out, "reference_ingest"))
    # same (cfg, defects) → byte-identical plant
    out2 = str(tmp_path / "dirty2")
    planted2 = generate_dataset(out2, cfg, defects, write_reference=True)
    assert planted2.dup_doc_ids == planted.dup_doc_ids
    assert planted2.ref_corrupt_doc_ids == planted.ref_corrupt_doc_ids
