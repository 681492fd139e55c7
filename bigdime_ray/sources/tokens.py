"""Token-table source (SURVEY.md B-R1) — the file-source-handler analog.

The reference's ``FileInputStreamReaderHandler`` polls a directory,
matches files by pattern and carries (path, totals) as event headers
[ref: bigdime-adaptor/io.bigdime.handler.file]. Here: partition discovery
is a directory listing of ``partition_id=<id>/`` hive dirs; the data read
is one ``ray.data.read_parquet`` over the selected files with
``include_paths=True``; ``partition_id`` is re-derived per batch from the
path column with a vectorized regex (``pc.extract_regex``) and the path
column is dropped immediately.

Why not pyarrow hive-partitioning inference: a schema-variant partition
(the reference's ColumnOrder/Type failure case) must not poison dataset
discovery — the schema gate excludes such partitions *before* the read,
which requires selecting files explicitly.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset

_PART_RE = r"partition_id=(?P<pid>[^/]+)/"


def discover_partitions(data_dir: str) -> dict[str, list[str]]:
    """partition_id -> sorted parquet file list (the source-discovery step)."""
    out: dict[str, list[str]] = {}
    for pdir in sorted(glob.glob(os.path.join(data_dir, "partition_id=*"))):
        pid = os.path.basename(pdir).split("=", 1)[1]
        files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        out[pid] = files
    return out


def attach_partition_id(batch: pa.Table) -> pa.Table:
    ext = pc.extract_regex(batch["path"], _PART_RE)
    pid = pc.if_else(pc.is_valid(ext), pc.struct_field(ext, "pid"),
                     pa.scalar("", type=pa.string()))
    return batch.drop_columns(["path"]).append_column(
        pa.field("partition_id", pa.string()), pid)


def decide_read_blocks(n_files: int, avg_size: float, target: int,
                       cpus: int) -> Optional[int]:
    """Plan-time read-task granularity. Small files pin one block per
    file (Ray's SplitBlocks otherwise breaks read→scan fusion —
    measured 2.8× slower). Width-conditional coarsening (BASELINE.md r4
    addendum): Ray's scheduling loop waits ``ray.wait(num_returns=ALL,
    timeout=0.1)``, so at width>1 every task turnover can idle a core
    up to 100 ms — fewer, larger fused tasks (4 per CPU) shrink the
    total bubble (measured 5.99→4.79 s at width 4 with 4 files/task).
    Width 1 keeps one block per file: the single-waitable wait wakes
    instantly there and 4×-larger batches fall out of cache in the scan
    kernel (measured 16.3→19.5 s). None = leave Ray's default."""
    if avg_size >= target or n_files < 2 * cpus:
        return None
    if cpus >= 4 and 8 * cpus <= n_files:
        return 4 * cpus
    return n_files


def read_tokens(data_dir: str, columns: Optional[list[str]] = None,
                partitions: Optional[list[str]] = None,
                **read_kwargs) -> Dataset:
    """Read the hive-partitioned tokens table as a Dataset with a
    ``partition_id`` column. ``columns`` prunes at the read;
    ``partitions`` restricts to a subset (resume / schema-gate exclusion).
    """
    if os.path.isdir(os.path.join(data_dir, "data")):
        data_dir = os.path.join(data_dir, "data")
    parts = discover_partitions(data_dir)
    if partitions is not None:
        parts = {p: f for p, f in parts.items() if p in set(partitions)}
    files = [f for fl in parts.values() for f in fl]
    if not files:
        raise FileNotFoundError(f"no parquet files under {data_dir}")
    # When files are already smaller than the target block size, pin one
    # block per file: Ray's default SplitBlocks sub-splitting both blocks
    # downstream fusion with the scan stage and adds an object-store hop
    # (measured 2.8× slower scan at 8 cpus on 17 MB files).
    # BIGDIME_READ_BLOCKS: pin the read-task count (experiment knob for
    # the scheduler-bubble analysis, BASELINE.md r4 — Ray's scheduling
    # loop waits `ray.wait(num_returns=ALL, timeout=0.1)`, so each task
    # turnover at width>1 can idle a core up to 100 ms; fewer, larger
    # fused tasks shrink the total bubble)
    env_blocks = os.environ.get("BIGDIME_READ_BLOCKS")
    if env_blocks and "override_num_blocks" not in read_kwargs:
        read_kwargs["override_num_blocks"] = int(env_blocks)
    if "override_num_blocks" not in read_kwargs:
        try:
            from ray.data import DataContext
            target = DataContext.get_current().target_max_block_size
            total = sum(os.path.getsize(f) for f in files)
            cpus = int(ray.cluster_resources().get("CPU", 8)) \
                if ray.is_initialized() else 8
            blocks = decide_read_blocks(len(files), total / len(files),
                                        target, cpus)
            if blocks is not None:
                read_kwargs["override_num_blocks"] = blocks
        except Exception:
            pass
    # Ray's read_parquet infers the hive partition column even for explicit
    # file lists — prefer that (no per-row path column at all); fall back to
    # path extraction if inference didn't produce it.
    ds = ray.data.read_parquet(files, columns=columns, **read_kwargs)
    if "partition_id" in ds.schema().names:
        return ds
    ds = ray.data.read_parquet(files, columns=columns, include_paths=True,
                               **read_kwargs)
    return ds.map_batches(attach_partition_id, batch_format="pyarrow",
                          zero_copy_batch=True)
