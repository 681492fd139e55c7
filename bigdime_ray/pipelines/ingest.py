"""Ingest pipeline — the source→sink handler-chain analog.

The reference's reader handlers accumulate per-file record counts and
checksums into event headers while the sink writes the data; validation
later compares the loaded side against those header values
[ref: bigdime-adaptor FileInputStreamReaderHandler + WebHDFSWriterHandler,
SURVEY.md §2A S1/K1]. This pipeline reproduces that loop natively:

    raw tokens Dataset
      → (optional) attach partition_id by hashing doc_id ranges
      → write hive-partitioned parquet (idempotent per-partition dirs)
      → ONE map_batches pass accumulating per-partition
        (row count, content checksum) partial states
      → ingest_manifest.parquet  (FIXTURES F3 — the "raw side")

so a downstream ``run_validation`` can perform record-count and
raw-vs-loaded checksum validation against the manifest this produced.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset

from bigdime_ray.functions.hashing import (fold_checksum, row_content_hash,
                                           u64_to_i64)
from bigdime_ray.sources.tables import write_tokens
from bigdime_ray.state.sketches import ChecksumState, PartialState, merge_states


def attach_partitions(ds: Dataset, num_partitions: int,
                      id_col: str = "doc_id") -> Dataset:
    """Assign a stable hash partition per row (when the source has no
    natural partitioning). Deterministic under retries."""
    from bigdime_ray.functions.hashing import hash_string_column

    def fn(batch: pa.Table) -> pa.Table:
        h = hash_string_column(batch[id_col])
        pid = (h % np.uint64(num_partitions)).astype(np.int64)
        names = np.char.add("p", np.char.zfill(pid.astype(str), 4))
        return batch.append_column("partition_id",
                                   pa.array(names, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def ingest(ds: Dataset, out_dir: str,
           num_partitions: Optional[int] = None,
           transform=None, quarantine: bool = False) -> dict:
    """Write the table + produce its ingest manifest. Returns
    {partition_id: {expected_rows, raw_checksum}} (+ ``quarantined``
    row count when quarantining).

    ``transform`` optionally cleanses/normalizes every batch before
    the write (the reference's data-cleansing handler slot, §2A M2).
    With ``quarantine=True`` a FAULTING transform no longer kills the
    partition: ``stages/quarantine.py::quarantine_map`` bisects the
    poison rows into ``out_dir/quarantine/`` (row JSON + error text)
    and only healthy rows are ingested — manifest counts exclude them
    by construction since counting happens on the written data. The
    transform must be row-wise pure; it runs once per output consumed
    (two lazy consumers here — the cost of not materializing)."""
    n_quarantined = 0
    if transform is not None:
        if quarantine:
            import shutil
            from bigdime_ray.sources.tables import metadata_row_counts
            from bigdime_ray.stages.quarantine import quarantine_map
            qdir = os.path.join(out_dir, "quarantine")
            # clean first: write_parquet appends uniquely-named files,
            # so a retried run would otherwise double-count stale rows
            shutil.rmtree(qdir, ignore_errors=True)
            # an all-healthy run writes ZERO quarantine files and Ray's
            # empty write creates no directory — pre-create it so the
            # footer count sees an empty dir, not a missing path
            os.makedirs(qdir, exist_ok=True)
            ds, bad = quarantine_map(ds, transform)
            bad.write_parquet(qdir)
            n_quarantined = int(sum(
                metadata_row_counts(qdir)["rows"].to_pylist()))
        else:
            ds = ds.map_batches(transform, batch_format="pyarrow",
                                zero_copy_batch=True)
    if num_partitions is not None:
        ds = attach_partitions(ds, num_partitions)
    data_dir = os.path.join(out_dir, "data")
    write_tokens(ds, data_dir)

    def partials(batch: pa.Table) -> pa.Table:
        h = row_content_hash(batch["doc_id"], batch["tokens"])
        part = batch["partition_id"]
        uniq = pa.compute.unique(part).to_pylist()
        pids, payloads = [], []
        for pid in uniq:
            mask = pa.compute.equal(part, pid).to_numpy(zero_copy_only=False)
            st = ChecksumState(fold_checksum(h[mask]), int(mask.sum()))
            pids.append(pid)
            payloads.append(st.to_bytes())
        return pa.table({"partition_id": pa.array(pids, type=pa.string()),
                         "payload": pa.array(payloads, type=pa.binary())})

    # read back what was WRITTEN (loaded-side accounting, like the
    # reference's sink-side header accumulation)
    from bigdime_ray.sources.tokens import read_tokens
    written = read_tokens(data_dir)
    rows = written.map_batches(partials, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    by_pid: dict[str, list] = {}
    for r in rows:
        by_pid.setdefault(r["partition_id"], []).append(
            PartialState.from_bytes(r["payload"]))
    manifest = {pid: merge_states(states) for pid, states in by_pid.items()}

    tbl = pa.table({
        "partition_id": pa.array(sorted(manifest)),
        "expected_rows": pa.array([manifest[p].n for p in sorted(manifest)],
                                  type=pa.int64()),
        "raw_checksum": pa.array([u64_to_i64(manifest[p].checksum)
                                  for p in sorted(manifest)], type=pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "ingest_manifest.parquet"))
    out = {p: {"expected_rows": manifest[p].n,
               "raw_checksum": u64_to_i64(manifest[p].checksum)}
           for p in sorted(manifest)}
    if n_quarantined:
        out["__quarantined__"] = {"expected_rows": n_quarantined,
                                  "raw_checksum": 0}
    return out


def compact_parquet(in_dir: str, out_dir: str,
                    target_rows_per_file: int = 1_000_000,
                    columns: list[str] | None = None,
                    zorder_by: list[str] | None = None) -> dict:
    """Small-file compaction — the operational chore every long-lived
    100 TB dataset needs: a directory accreted from many incremental
    writes (one file per micro-batch) re-emerges as files of
    ``target_rows_per_file``, restoring scan parallelism economics
    (footer-read and task-startup cost are per FILE; a million 4 KB
    files starve the read stage no matter how wide the cluster is).

    Streaming end to end: ``read_parquet`` → ``write_parquet`` with
    Ray's ``min_rows_per_file`` sizing — no repartition shuffle and no
    driver materialization; the object store spills if a block exceeds
    memory. ``columns`` optionally prunes while compacting (schema
    evolution / column retirement in the same pass); ``zorder_by``
    additionally CLUSTERS the rewrite by the Morton key of those
    columns (stages/layout.py) — one distributed sort folded into the
    compaction pass so downstream multi-column range scans prune row
    groups. Returns {files_in, files_out, rows}."""
    import glob
    import ray

    files_in = len(glob.glob(os.path.join(in_dir, "**", "*.parquet"),
                             recursive=True))
    ds = ray.data.read_parquet(in_dir, columns=columns)
    if zorder_by:
        from bigdime_ray.stages.layout import zorder_sort
        ds = zorder_sort(ds, zorder_by)
    ds.write_parquet(out_dir, min_rows_per_file=target_rows_per_file)
    files_out = len(glob.glob(os.path.join(out_dir, "*.parquet")))
    rows = ray.data.read_parquet(out_dir).count()
    return {"files_in": files_in, "files_out": files_out, "rows": rows}
