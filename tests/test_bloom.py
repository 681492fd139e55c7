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


def test_catalog_repr_auto_dispatch(tmp_path):
    """VERDICT r3 #7: with catalog_as_bloom='auto' (the default), an
    over-threshold catalog selects the Bloom representation at plan
    time and yields IDENTICAL verdicts + violation rows to the pinned
    value-set run (the synthetic outsider sources are far more than ε
    apart from the catalog, so the documented 1e-4 FP rate cannot flip
    a verdict at this size)."""
    cfg = SynthConfig(num_rows=800, num_partitions=4, seed=37)
    base = str(tmp_path / "ds")
    planted = generate_dataset(base, cfg, DefectSpec(bad_source=4))
    # per-source max_n_tok bounds force the exact representation (the
    # Bloom filter cannot carry the per-source mapping) — drop the
    # column so the dispatch decision is purely size-driven here
    import os
    import pyarrow.parquet as pq
    cat_path = os.path.join(base, "source_catalog.parquet")
    cat = pq.read_table(cat_path)
    pq.write_table(cat.drop_columns(["max_n_tok"]), cat_path)

    def run(sub: str, **kw):
        return run_validation(ValidationRunConfig(
            input_dir=base, run_dir=str(tmp_path / sub),
            suite=["referential"], **kw))

    exact = run("run_exact", catalog_as_bloom=False)
    assert exact.scale_plan["catalog_repr"] == "value_set"
    # force the auto threshold below the catalog size → Bloom path
    auto = run("run_auto", catalog_as_bloom="auto",
               thresholds={"auto_catalog_bloom_min_rows": 1})
    assert auto.scale_plan["catalog_repr"] == "bloom"
    # ADVICE r4: the exact→approximate flip must surface as a WARNING
    # alert (both in the report and in alerts.jsonl), not just a report
    # field — and only on the run where AUTO picked Bloom
    cfg_alerts = [a for a in auto.alerts if a.alert_type == "config"]
    assert len(cfg_alerts) == 1 and "APPROXIMATE" in cfg_alerts[0].cause
    import json
    with open(str(tmp_path / "run_auto" / "alerts.jsonl")) as f:
        lines = [json.loads(x) for x in f]
    assert any(x["alert_type"] == "config" and x["severity"] == "warning"
               for x in lines)
    assert not any(a.alert_type == "config" for a in exact.alerts)
    # under-threshold auto stays exact
    small = run("run_small", catalog_as_bloom="auto")
    assert small.scale_plan["catalog_repr"] == "value_set"
    assert not any(a.alert_type == "config" for a in small.alerts)

    for rep in (exact, auto):
        v = rep.violations.to_pandas()
        got = set(v[v.validator_id == "referential"].doc_id)
        assert got == set(planted.bad_source_doc_ids)
    assert [r.result for r in exact.responses] == \
        [r.result for r in auto.responses]


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
