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
