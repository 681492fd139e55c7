"""Generic table sources/sinks beyond parquet.

The reference ingests from files (delimited/text), Kafka and JDBC
[ref: bigdime-adaptor handler.{file,kafka,jdbc}]; Kafka/JDBC are out of
scope per ``BASELINE.json:15`` (batch Parquet tables are the engine's
input), but file-format breadth is kept: JSONL and CSV readers that
normalize to a declared Arrow schema (the metadata-store-driven schema
application the reference does at ingest), and a hive-partitioned
parquet sink (the WebHDFS-writer analog: partition-granular,
idempotent-overwrite layout).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset


def normalize_to_schema(declared: pa.Schema):
    """map_batches fn: reorder/select columns and cast to the declared
    schema (missing nullable columns become nulls; extras dropped)."""

    def fn(batch: pa.Table) -> pa.Table:
        cols = {}
        for f in declared:
            if f.name in batch.column_names:
                col = batch[f.name]
                if col.type != f.type:
                    col = pc.cast(col, f.type)
                cols[f.name] = col
            else:
                cols[f.name] = pa.nulls(batch.num_rows, f.type)
        return pa.table(cols, schema=declared)

    return fn


def read_table(path: str, fmt: str = "parquet",
               schema: Optional[pa.Schema] = None,
               columns: Optional[list[str]] = None, **kwargs) -> Dataset:
    """Format-dispatching reader with optional schema normalization."""
    if fmt == "parquet":
        ds = ray.data.read_parquet(path, columns=columns, **kwargs)
    elif fmt in ("json", "jsonl"):
        ds = ray.data.read_json(path, **kwargs)
    elif fmt == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    if schema is not None:
        ds = ds.map_batches(normalize_to_schema(schema),
                            batch_format="pyarrow", zero_copy_batch=True)
        if columns:
            ds = ds.select_columns(columns)
    return ds


def write_tokens(ds: Dataset, out_dir: str,
                 partition_col: str = "partition_id",
                 min_rows_per_file: int = 500_000) -> None:
    """Hive-partitioned parquet sink: ``out_dir/partition_id=<v>/...``.

    Partition-granular directories are the resumable unit (§4.3): a rerun
    overwrites whole partition dirs idempotently; never one giant file.
    """
    ds.write_parquet(out_dir, partition_cols=[partition_col],
                     min_rows_per_file=min_rows_per_file)


def metadata_row_counts(path: str, pattern: str = "*.parquet",
                        max_workers: int = 16) -> pa.Table:
    """COUNT(*) from parquet FOOTERS only — zero data rows leave
    storage (the 100 TB answer to \"how big is this table\": a footer
    is a few KB regardless of file size, so counting 10⁵ files costs
    MBs, not TBs). Returns one (path, rows) row per file plus the
    implied total via ``sum``; thread-pooled footer reads (metadata IO
    releases the GIL). ``path`` may be a file or a directory swept
    with ``pattern``. At >10⁵ files, shard the listing over Ray tasks
    — the per-footer cost model is unchanged."""
    import glob
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", pattern),
                                 recursive=True))
    elif os.path.isfile(path):
        files = [path]
    else:
        raise FileNotFoundError(path)
    if not files:
        return pa.table({"path": pa.array([], type=pa.string()),
                         "rows": pa.array([], type=pa.int64())})

    def one(f: str) -> int:
        return pq.ParquetFile(f).metadata.num_rows

    with ThreadPoolExecutor(max_workers=min(max_workers,
                                            len(files))) as ex:
        rows = list(ex.map(one, files))
    return pa.table({"path": pa.array(files, type=pa.string()),
                     "rows": pa.array(rows, type=pa.int64())})
