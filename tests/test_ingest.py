"""Ingest → manifest → validate loop (the reference's end-to-end flow)."""

import os

import pyarrow as pa
import pytest
import ray.data

from bigdime_ray.pipelines.ingest import attach_partitions, ingest
from bigdime_ray.pipelines.validate import ValidationRunConfig, run_validation
from bigdime_ray.synth import SynthConfig, gen_partition, write_catalog


@pytest.fixture(scope="module")
def raw_ds():
    cfg = SynthConfig(seed=21)
    t = gen_partition(cfg, 0, 1200)
    return ray.data.from_arrow(t).repartition(4), cfg


def test_attach_partitions_deterministic(raw_ds):
    ds, _ = raw_ds
    a = attach_partitions(ds, 8).to_pandas().sort_values("doc_id")
    b = attach_partitions(ds, 8).to_pandas().sort_values("doc_id")
    assert list(a.partition_id) == list(b.partition_id)
    assert set(a.partition_id) <= {f"p{i:04d}" for i in range(8)}


def test_ingest_then_validate_passes(raw_ds, tmp_path):
    ds, cfg = raw_ds
    out = str(tmp_path / "ingested")
    manifest = ingest(ds, out, num_partitions=6)
    assert sum(m["expected_rows"] for m in manifest.values()) == 1200
    assert os.path.exists(os.path.join(out, "ingest_manifest.parquet"))
    write_catalog(out, cfg)

    rep = run_validation(ValidationRunConfig(
        input_dir=out, run_dir=str(tmp_path / "run"),
        suite=["record_count", "raw_checksum", "ntok_consistency",
               "referential", "uniqueness"]))
    for p in manifest:
        assert rep.overall(p) == "PASSED", (p, [
            (r.validator_id, r.comment) for r in rep.responses
            if r.partition_id == p and r.result.value != "PASSED"])


def test_ingest_detects_post_hoc_tamper(raw_ds, tmp_path):
    ds, cfg = raw_ds
    out = str(tmp_path / "tampered")
    manifest = ingest(ds, out, num_partitions=4)
    write_catalog(out, cfg)
    # corrupt one partition's data file after ingest
    import glob
    import pyarrow.parquet as pq
    victim = sorted(glob.glob(os.path.join(out, "data", "partition_id=*",
                                           "*.parquet")))[0]
    t = pq.read_table(victim)
    t = t.slice(1)  # drop a row
    pq.write_table(t, victim)
    rep = run_validation(ValidationRunConfig(
        input_dir=out, run_dir=str(tmp_path / "run2"),
        suite=["record_count", "raw_checksum"]))
    pid = victim.split("partition_id=")[1].split("/")[0]
    assert rep.result_for(pid, "record_count") == "FAILED"
    assert rep.result_for(pid, "raw_checksum") == "FAILED"


def test_compact_parquet_coalesces_small_files(tmp_path):
    import glob
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bigdime_ray.pipelines.ingest import compact_parquet
    src = tmp_path / "many"
    src.mkdir()
    for i in range(20):  # 20 tiny files
        pq.write_table(
            pa.table({"x": pa.array(np.arange(i * 50, i * 50 + 50,
                                              dtype=np.int64)),
                      "y": pa.array(np.full(50, i, dtype=np.int64))}),
            src / f"part-{i:03d}.parquet")
    out = tmp_path / "compact"
    rep = compact_parquet(str(src), str(out),
                          target_rows_per_file=500)
    assert rep["files_in"] == 20
    assert rep["rows"] == 1000
    assert rep["files_out"] < 20  # actually coalesced
    # content preserved exactly (as a multiset)
    got = pq.read_table(sorted(glob.glob(str(out / "*.parquet")))[0]
                        if rep["files_out"] == 1 else str(out))
    assert sorted(got["x"].to_pylist()) == list(range(1000))
    # column pruning path
    out2 = tmp_path / "pruned"
    rep2 = compact_parquet(str(src), str(out2), 500, columns=["y"])
    assert rep2["rows"] == 1000
    import pyarrow.dataset as pads
    assert pads.dataset(str(out2)).schema.names == ["y"]


def test_compact_parquet_zorder_option(tmp_path):
    """compact_parquet(zorder_by=...): rows preserved, files coalesced,
    and the rewrite is Morton-clustered (consecutive rows stay close
    in BOTH keyed columns, unlike the unsorted input)."""
    import glob
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bigdime_ray.pipelines.ingest import compact_parquet
    rng = np.random.default_rng(3)
    src = tmp_path / "src"
    src.mkdir()
    n = 4000
    for i in range(8):
        sl = slice(i * 500, (i + 1) * 500)
        pq.write_table(pa.table({
            "a": pa.array(rng.uniform(0, 100, 500)),
            "b": pa.array(rng.uniform(0, 100, 500)),
            "id": pa.array(np.arange(sl.start, sl.stop,
                                     dtype=np.int64))}),
            src / f"f{i}.parquet")
    out = tmp_path / "out"
    rep = compact_parquet(str(src), str(out), target_rows_per_file=n,
                          zorder_by=["a", "b"])
    assert rep["rows"] == n and rep["files_out"] <= 2
    t = pa.concat_tables([pq.read_table(f) for f in
                          sorted(glob.glob(str(out / "*.parquet")))])
    assert sorted(t["id"].to_pylist()) == list(range(n))
    a = np.asarray(t["a"].to_pylist())
    b = np.asarray(t["b"].to_pylist())
    # Morton clustering: mean |Δ| between consecutive rows is far below
    # the ~33 expected of a random permutation, on BOTH columns
    assert np.abs(np.diff(a)).mean() < 15
    assert np.abs(np.diff(b)).mean() < 15


def test_ingest_with_quarantine_transform(raw_ds, tmp_path):
    """ingest(transform=..., quarantine=True): poison rows land in
    out_dir/quarantine with the error text; the manifest counts only
    healthy rows; quarantined count reported."""
    import glob
    import numpy as np
    import pyarrow.parquet as _pq
    ds, _ = raw_ds
    total = ds.count()

    def cleanse(batch: pa.Table) -> pa.Table:
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False)
        if (n_tok % 97 == 0).any():  # deterministic poison subset
            raise ValueError("cursed length")
        return batch

    out = str(tmp_path / "qing")
    man = ingest(ds, out, num_partitions=4, transform=cleanse,
                 quarantine=True)
    qfiles = glob.glob(os.path.join(out, "quarantine", "*.parquet"))
    assert qfiles
    q = pa.concat_tables([_pq.read_table(f) for f in qfiles])
    n_bad = q.num_rows
    assert n_bad == man["__quarantined__"]["expected_rows"] > 0
    assert all("cursed length" in e for e in q["error"].to_pylist())
    healthy = sum(v["expected_rows"] for k, v in man.items()
                  if k != "__quarantined__")
    assert healthy + n_bad == total
    # the poison predicate actually selected the quarantined rows
    import re
    bads = {int(re.search(r"'n_tok': (\d+)", s).group(1))
            for s in q["row_json"].to_pylist()}
    assert all(b % 97 == 0 for b in bads)


def test_ingest_quarantine_all_healthy(raw_ds, tmp_path):
    """Review regression: an all-healthy quarantining ingest must not
    crash on the (empty) quarantine directory and reports no
    __quarantined__ entry."""
    ds, _ = raw_ds
    man = ingest(ds, str(tmp_path / "clean"), num_partitions=4,
                 transform=lambda b: b, quarantine=True)
    assert "__quarantined__" not in man
    assert sum(v["expected_rows"] for v in man.values()) == ds.count()
