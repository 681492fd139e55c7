"""unnest_column (SQL UNNEST WITH ORDINALITY) + snapshot_diff (CDC)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from bigdime_ray.pipelines.nested import unnest_column
from bigdime_ray.pipelines.diff import snapshot_diff


def test_unnest_with_ordinality_matches_brute_force():
    tbl = pa.table({
        "id": pa.array([10, 11, 12, 13, 14], type=pa.int64()),
        "xs": pa.array([[1.5, 2.5], [], None, [7.0], [8.0, 9.0, 10.0]],
                       type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = (unnest_column(ds, "xs", value_col="v", ordinal_col="ord",
                         keep_cols=["id"])
           .to_pandas().sort_values(["id", "ord"]).reset_index(drop=True))
    # null and empty lists contribute no rows (DuckDB UNNEST semantics)
    assert out.id.tolist() == [10, 10, 13, 14, 14, 14]
    assert out["ord"].tolist() == [0, 1, 0, 0, 1, 2]
    assert out.v.tolist() == [1.5, 2.5, 7.0, 8.0, 9.0, 10.0]


def test_unnest_without_ordinality_and_empty_block():
    tbl = pa.table({"xs": pa.array([[1], [2, 3]],
                                   type=pa.list_(pa.int64()))})
    out = unnest_column(ray.data.from_arrow(tbl), "xs").take_all()
    assert sorted(r["val"] for r in out) == [1, 2, 3]


def test_snapshot_diff_statuses():
    old = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int64),
                        "v": np.array([10, 20, 30, 0], dtype=np.int64)})
    new = pd.DataFrame({"k": np.array([2, 3, 4, 5], dtype=np.int64),
                        "v": np.array([20, 31, 0, 50], dtype=np.int64)})
    got = snapshot_diff(ray.data.from_pandas(old).repartition(2),
                        ray.data.from_pandas(new).repartition(3),
                        "k", "v").to_pandas()
    want = {1: "removed", 2: "same", 3: "changed", 4: "same",
            5: "added"}
    assert dict(zip(got.k, got.status)) == want
    assert got.k.tolist() == sorted(want)  # key-sorted output


def test_snapshot_diff_rejects_duplicate_keys():
    old = pd.DataFrame({"k": np.array([1, 1], dtype=np.int64),
                        "v": np.array([5, 6], dtype=np.int64)})
    new = pd.DataFrame({"k": np.array([2], dtype=np.int64),
                        "v": np.array([7], dtype=np.int64)})
    with pytest.raises(ValueError, match="one row per key"):
        snapshot_diff(ray.data.from_pandas(old),
                      ray.data.from_pandas(new), "k", "v")


def test_snapshot_diff_zero_value_vs_absent():
    # a present row with value 0 must NOT read as absent
    old = pd.DataFrame({"k": np.array([1], dtype=np.int64),
                        "v": np.array([0], dtype=np.int64)})
    new = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                        "v": np.array([0, 0], dtype=np.int64)})
    got = snapshot_diff(ray.data.from_pandas(old),
                        ray.data.from_pandas(new), "k", "v").to_pandas()
    assert dict(zip(got.k, got.status)) == {1: "same", 2: "added"}
