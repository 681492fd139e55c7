"""Golden end-to-end validation run (SURVEY.md §5.2 item 2).

Deterministic synthetic table with planted defects → exact per-partition
verdicts + violation rows, reproducing the reference validator-test
semantics (the four ValidationResult branches per validator).
"""

import os

import pytest

from bigdime_ray.pipelines.profile import build_profile
from bigdime_ray.pipelines.validate import (ValidationRunConfig, RunReport,
                                            run_validation)
from bigdime_ray.synth import DefectSpec, SynthConfig, generate_dataset
from bigdime_ray.validators import FULL_SUITE

CFG = SynthConfig(num_rows=4000, num_partitions=8, seed=42)
DEFECTS = DefectSpec(dup_intra=2, dup_cross=2, bad_source=3, ntok_mismatch=2,
                     token_oob=2, token_null=1, drift_partition=3,
                     manifest_count_off=1, manifest_checksum_off=2,
                     schema_variant=5, missing_file=6, ref_corrupt_rows=3)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    base = tmp_path_factory.mktemp("golden")
    clean_dir = str(base / "clean")
    generate_dataset(clean_dir, CFG)
    prof_path = str(base / "reference_profile.json")
    build_profile(os.path.join(clean_dir, "data"), save_path=prof_path)

    dirty_dir = str(base / "dirty")
    planted = generate_dataset(dirty_dir, CFG, DEFECTS, write_reference=True)
    run_cfg = ValidationRunConfig(
        input_dir=dirty_dir, run_dir=str(base / "run1"),
        profile_path=prof_path, suite=list(FULL_SUITE))
    report = run_validation(run_cfg)
    return planted, report, run_cfg, clean_dir, base


def test_schema_gate(golden):
    planted, report, *_ = golden
    assert report.result_for(planted.schema_variant, "schema") == "FAILED"
    # content validators report INCOMPLETE_SETUP for the bad-schema partition
    assert report.result_for(planted.schema_variant, "record_count") == "INCOMPLETE_SETUP"
    # good partitions pass the gate
    assert report.result_for("p0000", "schema") == "PASSED"


def test_not_ready_partition(golden):
    planted, report, *_ = golden
    assert report.result_for(planted.missing_file, "record_count") == "NOT_READY"
    assert report.overall(planted.missing_file) == "NOT_READY"


def test_record_count_and_checksum(golden):
    planted, report, *_ = golden
    assert report.result_for(planted.manifest_count_off, "record_count") == "FAILED"
    assert report.result_for(planted.manifest_checksum_off, "raw_checksum") == "FAILED"
    # count-tampered partition still checksum-passes and vice versa
    assert report.result_for(planted.manifest_count_off, "raw_checksum") == "PASSED"
    assert report.result_for(planted.manifest_checksum_off, "record_count") == "PASSED"


def test_drift(golden):
    planted, report, *_ = golden
    assert report.result_for(planted.drift_partition, "drift_chi2") == "FAILED"
    assert report.result_for(planted.drift_partition, "drift_ks") == "FAILED"
    # a clean partition shows no drift
    assert report.result_for("p0000", "drift_chi2") == "PASSED"
    assert report.result_for("p0000", "drift_ks") == "PASSED"


def _violating_ids(report: RunReport, validator_id: str) -> set:
    v = report.violations.to_pandas()
    return set(v[v.validator_id == validator_id].doc_id)


def test_row_violations_exact(golden):
    planted, report, *_ = golden
    excluded = {planted.schema_variant, planted.missing_file}
    vdf = report.violations.to_pandas()
    scanned = set(vdf[~vdf.partition_id.isin(excluded)].partition_id)
    assert not scanned & excluded

    got_ntok = _violating_ids(report, "ntok_consistency")
    expect_ntok = {d for d in planted.ntok_mismatch_doc_ids}
    # planted rows inside excluded partitions can't be seen by the scan
    assert got_ntok <= expect_ntok
    assert got_ntok == {d for d in expect_ntok
                        if _part_of(d, planted) not in excluded}

    got_range = _violating_ids(report, "token_range")
    expect_range = set(planted.token_oob_doc_ids) | set(planted.token_null_doc_ids)
    assert got_range <= expect_range and len(got_range) >= 1

    got_ref = _violating_ids(report, "referential")
    assert got_ref <= set(planted.bad_source_doc_ids) and len(got_ref) >= 1


def _part_of(doc_id: str, planted) -> str:
    # doc_id = "<source>-<seq:010d>", seq = part * 10_000_000 + row
    seq = int(doc_id.rsplit("-", 1)[1])
    return f"p{seq // 10_000_000:04d}"


def test_uniqueness(golden):
    planted, report, *_ = golden
    got = _violating_ids(report, "uniqueness")
    # every reported id was planted
    assert got <= set(planted.dup_doc_ids)
    assert len(got) >= 1


def test_row_equality(golden):
    planted, report, *_ = golden
    v = report.violations.to_pandas()
    mism = v[(v.validator_id == "row_equality") & (v.reason == "tokens_mismatch")]
    assert set(mism.doc_id) <= set(planted.ref_corrupt_doc_ids)
    assert len(mism) >= 1


def test_overall_verdicts_and_outputs(golden):
    planted, report, run_cfg, clean_dir, base = golden
    assert report.overall(planted.drift_partition) == "FAILED"
    assert os.path.exists(os.path.join(run_cfg.run_dir, "verdicts.parquet"))
    assert os.path.exists(os.path.join(run_cfg.run_dir, "manifest.json"))
    assert os.path.exists(os.path.join(run_cfg.run_dir, "profile.json"))
    assert os.path.exists(os.path.join(run_cfg.run_dir, "violations",
                                       "violations.parquet"))


def test_clean_run_all_passes(golden, tmp_path):
    planted, report, run_cfg, clean_dir, base = golden
    cfg = ValidationRunConfig(
        input_dir=clean_dir, run_dir=str(tmp_path / "clean_run"),
        profile_path=str(base / "reference_profile.json"),
        suite=[v for v in FULL_SUITE if v != "row_equality"])
    rep = run_validation(cfg)
    for p in [f"p{i:04d}" for i in range(8)]:
        assert rep.overall(p) == "PASSED", (p, [
            (r.validator_id, r.result, r.comment) for r in rep.responses
            if r.partition_id == p and r.result.value != "PASSED"])
    assert rep.violations is None or len(rep.violations) == 0


def test_scale_strategies_equal_default(golden, tmp_path):
    """state_merge='combine' + bucketed uniqueness (the >10⁵-block /
    10¹²-row paths) produce identical verdicts to the default paths."""
    planted, report, run_cfg, clean_dir, base = golden
    cfg = ValidationRunConfig(
        input_dir=str(base / "dirty"), run_dir=str(tmp_path / "scale_run"),
        profile_path=str(base / "reference_profile.json"),
        suite=list(FULL_SUITE), state_merge="combine",
        thresholds={"uniqueness_strategy": "bucketed",
                    "uniqueness_buckets": 4,
                    "roweq_strategy": "groupby"})
    rep2 = run_validation(cfg)
    # row_equality strategies attribute ambiguous cross-partition dups
    # differently (packed: every member partition; groupby: max partition)
    # — compare everything else strictly, row_equality by doc_id set
    key = lambda rs: sorted((r.partition_id, r.validator_id, r.result.value)
                            for r in rs if r.validator_id != "row_equality")
    assert key(rep2.responses) == key(report.responses)
    a = report.violations.to_pandas()
    b = rep2.violations.to_pandas()
    assert (set(zip(a.validator_id, a.doc_id))
            == set(zip(b.validator_id, b.doc_id)))
    ra = {(r.partition_id, r.result.value) for r in report.responses
          if r.validator_id == "row_equality" and r.result.value == "FAILED"}
    rb = {(r.partition_id, r.result.value) for r in rep2.responses
          if r.validator_id == "row_equality" and r.result.value == "FAILED"}
    # packed may FAIL a superset of partitions (dup members on both sides)
    assert rb <= ra or ra <= rb


def test_interrupted_run_converges(golden, tmp_path):
    """FIXTURES §5.2 item 5: a run that only saw half the partitions
    (simulated interruption), later resumed over the full input, ends
    with the same per-partition verdicts as one uninterrupted run."""
    import shutil
    planted, report, run_cfg, clean_dir, base = golden
    work = str(tmp_path / "interrupt_input")
    shutil.copytree(clean_dir, work)
    suite = ["record_count", "raw_checksum", "ntok_consistency",
             "referential", "column_stats", "uniqueness"]
    run_dir = str(tmp_path / "interrupt_run")

    # full reference run
    ref_rep = run_validation(ValidationRunConfig(
        input_dir=work, run_dir=str(tmp_path / "ref_run"), suite=suite))

    # "crash" after 4 partitions: hide the rest, run, restore, rerun
    hidden = str(tmp_path / "hidden")
    os.makedirs(hidden)
    for i in range(4, 8):
        shutil.move(os.path.join(work, "data", f"partition_id=p{i:04d}"),
                    hidden)
    rep1 = run_validation(ValidationRunConfig(
        input_dir=work, run_dir=run_dir, suite=suite))
    assert sorted(rep1.partitions_run)[:4] == [f"p{i:04d}" for i in range(4)]
    for i in range(4, 8):
        shutil.move(os.path.join(hidden, f"partition_id=p{i:04d}"),
                    os.path.join(work, "data"))
    rep2 = run_validation(ValidationRunConfig(
        input_dir=work, run_dir=run_dir, suite=suite))
    assert sorted(rep2.partitions_skipped) == [f"p{i:04d}" for i in range(4)]
    assert sorted(rep2.partitions_run) == [f"p{i:04d}" for i in range(4, 8)]

    # converged verdicts equal the uninterrupted run's
    from bigdime_ray.state.manifest import RunManifest
    final = RunManifest.load(os.path.join(run_dir, "manifest.json"))
    ref = RunManifest.load(os.path.join(str(tmp_path / "ref_run"),
                                        "manifest.json"))
    assert {p: e.status for p, e in final.entries.items()} \
        == {p: e.status for p, e in ref.entries.items()}


def test_resume_skips_validated(golden, tmp_path):
    planted, report, run_cfg, clean_dir, base = golden
    run_dir = str(tmp_path / "resume_run")
    cfg = ValidationRunConfig(
        input_dir=clean_dir, run_dir=run_dir,
        profile_path=str(base / "reference_profile.json"),
        suite=["record_count", "raw_checksum", "column_stats"])
    rep1 = run_validation(cfg)
    assert len(rep1.partitions_run) == 8 and not rep1.partitions_skipped
    rep2 = run_validation(cfg)
    assert not rep2.partitions_run
    assert sorted(rep2.partitions_skipped) == [f"p{i:04d}" for i in range(8)]


def test_auto_scale_dispatch(golden, tmp_path):
    """Forcing tiny auto thresholds flips every driver-side merge to its
    scale path (bucketed uniqueness, groupby row-equality, combine state
    merge) WITHOUT the caller naming a strategy — and the verdicts stay
    identical to the default run (VERDICT r1 item 3)."""
    planted, report, run_cfg, clean_dir, base = golden
    assert report.scale_plan["uniqueness_strategy"] == "scan"
    assert report.scale_plan["roweq_strategy"] == "packed"
    assert report.scale_plan["state_merge"] == "driver"
    assert report.scale_plan["estimated_rows"] > 0

    cfg = ValidationRunConfig(
        input_dir=str(base / "dirty"), run_dir=str(tmp_path / "auto_run"),
        profile_path=str(base / "reference_profile.json"),
        suite=list(FULL_SUITE),
        thresholds={"auto_scan_max_rows": 10, "auto_packed_max_rows": 10,
                    "auto_driver_merge_max_blocks": 1})
    rep2 = run_validation(cfg)
    assert rep2.scale_plan["uniqueness_strategy"] == "bucketed"
    assert rep2.scale_plan["uniqueness_buckets"] >= 1
    assert rep2.scale_plan["roweq_strategy"] == "groupby"
    assert rep2.scale_plan["state_merge"] == "combine"

    key = lambda rs: sorted((r.partition_id, r.validator_id, r.result.value)
                            for r in rs if r.validator_id != "row_equality")
    assert key(rep2.responses) == key(report.responses)
    a = report.violations.to_pandas()
    b = rep2.violations.to_pandas()
    assert (set(zip(a.validator_id, a.doc_id))
            == set(zip(b.validator_id, b.doc_id)))


def test_alerts_emitted_per_defect_class(golden, tmp_path):
    """Reference X3 analog: every planted defect class produces a
    structured alert (severity/type/cause) in alerts.jsonl + callback."""
    import json
    planted, report, run_cfg, clean_dir, base = golden
    got = []
    cfg = ValidationRunConfig(
        input_dir=str(base / "dirty"), run_dir=str(tmp_path / "alert_run"),
        profile_path=str(base / "reference_profile.json"),
        suite=list(FULL_SUITE), on_alert=got.append)
    rep = run_validation(cfg)
    assert rep.alerts and len(got) == len(rep.alerts)
    path = os.path.join(cfg.run_dir, "alerts.jsonl")
    assert os.path.exists(path)
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == len(rep.alerts)
    errors = {(r["alert_type"]) for r in rows if r["severity"] == "error"}
    # one failing validator type per planted defect class
    for vid in ["uniqueness", "referential", "ntok_consistency",
                "token_range", "drift_chi2", "record_count",
                "raw_checksum", "row_equality"]:
        assert vid in errors, (vid, errors)
    warn_types = {r["alert_type"] for r in rows
                  if r["severity"] == "warning"}
    assert warn_types  # missing_file partitions → NOT_READY warnings
    assert all(r["cause"] for r in rows)


def test_incremental_profile_equals_rebuild(golden, tmp_path):
    """SURVEY 7.1 #6: merging the new partitions' states into a saved
    profile == rebuilding from all data (mergeable-state algebra)."""
    import numpy as np
    from bigdime_ray.pipelines.profile import build_profile, update_profile
    planted, report, run_cfg, clean_dir, base = golden
    data_dir = os.path.join(clean_dir, "data")
    first = [f"p{i:04d}" for i in range(4)]
    rest = [f"p{i:04d}" for i in range(4, 8)]
    inc_path = str(tmp_path / "inc_profile.json")
    build_profile(data_dir, partitions=first, save_path=inc_path)
    inc = update_profile(inc_path, input_dir=data_dir, partitions=rest)
    full = build_profile(data_dir)
    for c in full.column_stats:
        a, b = inc.column_stats[c], full.column_stats[c]
        assert (a.count, a.null_count, a.minimum, a.maximum) == \
            (b.count, b.null_count, b.minimum, b.maximum), c
        assert np.isclose(a.total, b.total)
    assert np.array_equal(inc.token_histogram.dense(),
                          full.token_histogram.dense())
    assert inc.ntok_digest.total_weight == full.ntok_digest.total_weight
    assert inc.ntok_digest.minimum == full.ntok_digest.minimum
    assert inc.ntok_digest.maximum == full.ntok_digest.maximum
    qs = [0.1, 0.5, 0.9]
    assert np.allclose(inc.ntok_digest.quantile(qs),
                       full.ntok_digest.quantile(qs), rtol=0.02, atol=1.5)


def test_user_expression_validator_extension(tmp_path):
    """B-V0 extension surface: a USER-registered row-predicate
    validator (make_expression_validator, no class written) runs in
    the shared scan pass by suite id, caps + emits violation rows,
    and verdicts FAILED on exactly the violating partitions."""
    import pyarrow.compute as _pc
    from bigdime_ray.validators import make_expression_validator
    from bigdime_ray.spi import registered_validators

    make_expression_validator(
        "ntok_budget",
        lambda tbl: _pc.greater(tbl["n_tok"], 48)
        .to_numpy(zero_copy_only=False),
        "n_tok exceeds the 48-token budget")
    assert "ntok_budget" in registered_validators()

    base = tmp_path / "expr"
    cfg_small = SynthConfig(num_rows=2000, num_partitions=4, seed=7)
    generate_dataset(str(base / "in"), cfg_small)
    rep = run_validation(ValidationRunConfig(
        input_dir=str(base / "in"), run_dir=str(base / "run"),
        suite=["schema", "ntok_budget"]))
    mine = [r for r in rep.responses if r.validator_id == "ntok_budget"]
    assert mine, "custom validator produced no responses"
    import duckdb
    truth = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{base}/in/data/**/*.parquet')"
        " WHERE n_tok > 48").fetchone()[0]
    total = sum(r.metrics.get("violations", 0) for r in mine
                if r.partition_id != "__global__")
    assert total == truth and truth > 0
    # every partition of the random synth data holds n_tok>48 rows, so
    # each per-partition response must be FAILED with a positive count
    for r in mine:
        if r.partition_id == "__global__":
            continue
        assert r.result.value == "FAILED" and \
            r.metrics["violations"] > 0, r
    viol_dir = base / "run" / "violations"
    assert viol_dir.exists()
    # the §4.3 layout holds BOTH a consolidated file and per-partition
    # copies — read only the partition-granular layer
    got_viols = duckdb.sql(
        f"SELECT count(*) FROM read_parquet("
        f"'{viol_dir}/part=*/violations.parquet') WHERE validator_id "
        "= 'ntok_budget'").fetchone()[0]
    assert got_viols == truth  # under the cap → all rows emitted
