"""Format sources/sinks: jsonl/csv normalization, hive-partitioned sink."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from bigdime_ray.schema import TOKENS_SCHEMA
from bigdime_ray.sources.tables import read_table, write_tokens
from bigdime_ray.sources.tokens import read_tokens


def test_read_jsonl_normalized(tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [{"doc_id": "a", "tokens": [1, 2], "n_tok": 2, "source": "web",
             "extra": 9},
            {"doc_id": "b", "tokens": [3], "n_tok": 1, "source": "books",
             "extra": 8}]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_table(str(p), fmt="jsonl", schema=TOKENS_SCHEMA)
    tbl = pa.Table.from_pylist(ds.take_all(), schema=TOKENS_SCHEMA)
    assert tbl.schema.equals(TOKENS_SCHEMA)
    assert tbl["doc_id"].to_pylist() == ["a", "b"]
    assert tbl["tokens"].to_pylist() == [[1, 2], [3]]


def test_read_csv_normalized(tmp_path):
    p = tmp_path / "t.csv"
    with open(p, "w") as f:
        f.write("doc_id,n_tok,source\na,2,web\nb,1,books\n")
    schema = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int32()),
                        ("source", pa.string())])
    ds = read_table(str(p), fmt="csv", schema=schema)
    tbl = pa.Table.from_pylist(ds.take_all(), schema=schema)
    assert tbl["n_tok"].to_pylist() == [2, 1]
    assert tbl.schema.field("n_tok").type == pa.int32()


def test_write_tokens_roundtrip(tmp_path):
    from bigdime_ray.synth import SynthConfig, gen_partition
    t0 = gen_partition(SynthConfig(seed=3), 0, 200)
    t0 = t0.append_column("partition_id",
                          pa.array(["p0000"] * 100 + ["p0001"] * 100))
    out = str(tmp_path / "sink")
    write_tokens(ray.data.from_arrow(t0), out)
    dirs = sorted(os.listdir(out))
    assert dirs == ["partition_id=p0000", "partition_id=p0001"]
    back = read_tokens(out)
    assert back.count() == 200
    assert set(back.schema().names) == {"doc_id", "tokens", "n_tok",
                                        "source", "partition_id"}


def test_decide_read_blocks_width_conditional():
    """BASELINE.md r4 addendum / VERDICT r4 #6: small-file reads pin
    one block per file at width 1 (scheduler wait wakes instantly,
    per-file batches stay in cache) but coarsen to 4 tasks/CPU at
    width ≥ 4 (each turnover can idle a core up to 100 ms)."""
    from bigdime_ray.sources.tokens import decide_read_blocks
    MB = 1 << 20
    # 64 small files, 128 MiB target
    assert decide_read_blocks(64, 17 * MB, 128 * MB, 1) == 64
    assert decide_read_blocks(64, 17 * MB, 128 * MB, 2) == 64
    assert decide_read_blocks(64, 17 * MB, 128 * MB, 4) == 16
    assert decide_read_blocks(64, 17 * MB, 128 * MB, 8) == 32
    # advertised 32 CPUs: coarsening would not group (256 > 64) — per file
    assert decide_read_blocks(64, 17 * MB, 128 * MB, 32) == 64
    # big files: leave Ray's default splitting
    assert decide_read_blocks(64, 256 * MB, 128 * MB, 4) is None
    # too few files for the pin to matter
    assert decide_read_blocks(4, 17 * MB, 128 * MB, 4) is None
