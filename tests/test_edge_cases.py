"""Edge-case robustness: tiny/empty partitions, unicode ids, single rows."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdime_ray.functions.hashing import (fold_checksum, row_content_hash,
                                           u64_to_i64)
from bigdime_ray.pipelines.validate import ValidationRunConfig, run_validation
from bigdime_ray.schema import TOKENS_SCHEMA


def _write_fixture(base, tables: dict[str, pa.Table], catalog_sources):
    os.makedirs(f"{base}/data", exist_ok=True)
    man = []
    for pid, t in tables.items():
        d = f"{base}/data/partition_id={pid}"
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, f"{d}/part-0.parquet")
        man.append({
            "partition_id": pid, "expected_rows": t.num_rows,
            "raw_checksum": u64_to_i64(fold_checksum(
                row_content_hash(t["doc_id"], t["tokens"])))})
    pq.write_table(pa.Table.from_pylist(man, schema=pa.schema([
        ("partition_id", pa.string()), ("expected_rows", pa.int64()),
        ("raw_checksum", pa.int64())])), f"{base}/ingest_manifest.parquet")
    pq.write_table(pa.table({
        "source": pa.array(catalog_sources),
        "max_n_tok": pa.array([10_000] * len(catalog_sources),
                              type=pa.int32())}),
        f"{base}/source_catalog.parquet")


def _tok_table(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "tokens": pa.array([r[1] for r in rows], type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(r[1]) if r[1] is not None else None
                           for r in rows], type=pa.int32()),
        "source": pa.array([r[2] for r in rows], type=pa.string()),
    }, schema=TOKENS_SCHEMA)


SUITE = ["record_count", "raw_checksum", "ntok_consistency", "token_range",
         "referential", "column_stats", "uniqueness", "per_source_stats"]


def test_single_row_and_unicode(tmp_path):
    base = str(tmp_path / "edge")
    tables = {
        "p0000": _tok_table([("héllo-世界-0001", [1, 2, 3], "wéb")]),
        "p0001": _tok_table([("plain-0002", [7], "wéb"),
                             ("émoji-🚀-0003", [0], "böoks")]),
    }
    _write_fixture(base, tables, ["wéb", "böoks"])
    rep = run_validation(ValidationRunConfig(
        input_dir=base, run_dir=str(tmp_path / "run"), suite=SUITE))
    assert rep.overall("p0000") == "PASSED"
    assert rep.overall("p0001") == "PASSED"


def test_empty_tokens_lists(tmp_path):
    base = str(tmp_path / "empties")
    tables = {"p0000": _tok_table([
        ("a-1", [], "web"), ("a-2", [5], "web"), ("a-3", [], "web")])}
    _write_fixture(base, tables, ["web"])
    rep = run_validation(ValidationRunConfig(
        input_dir=base, run_dir=str(tmp_path / "run"), suite=SUITE))
    assert rep.overall("p0000") == "PASSED"  # empty list: n_tok==0, valid


def test_duplicate_across_tiny_partitions(tmp_path):
    base = str(tmp_path / "dups")
    tables = {
        "p0000": _tok_table([("same-id", [1], "web")]),
        "p0001": _tok_table([("same-id", [2], "web")]),
    }
    _write_fixture(base, tables, ["web"])
    rep = run_validation(ValidationRunConfig(
        input_dir=base, run_dir=str(tmp_path / "run"), suite=SUITE))
    assert rep.result_for("p0000", "uniqueness") == "FAILED"
    assert rep.result_for("p0001", "uniqueness") == "FAILED"
    v = rep.violations.to_pandas()
    assert (v[v.validator_id == "uniqueness"].doc_id == "same-id").all()
