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


def test_upsert_snapshot_matches_pandas():
    """upsert_snapshot == pandas set logic: replaced, inserted and
    deleted keys land exactly; untouched old rows survive unchanged."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.diff import upsert_snapshot
    old = pd.DataFrame({"k": np.arange(0, 50, dtype=np.int64),
                        "v": np.arange(0, 50, dtype=np.int64) * 10})
    ch = pd.DataFrame({
        "k": np.asarray([3, 7, 60, 61, 9, 12], dtype=np.int64),
        "v": np.asarray([-3, -7, -60, -61, 0, 0], dtype=np.int64),
        "deleted": np.asarray([0, 0, 0, 0, 1, 1], dtype=np.int64)})
    got = (upsert_snapshot(rd.from_pandas(old).repartition(3),
                           rd.from_pandas(ch).repartition(2),
                           "k", delete_col="deleted")
           .to_pandas().sort_values("k").reset_index(drop=True))
    keep = old[~old.k.isin(ch.k)]
    ins = ch[ch.deleted == 0][["k", "v"]]
    want = (pd.concat([keep, ins]).sort_values("k")
            .reset_index(drop=True))
    assert got.k.tolist() == want.k.tolist()
    assert got.v.tolist() == want.v.tolist()
    assert 9 not in got.k.tolist() and 60 in got.k.tolist()


def test_metadata_row_counts(tmp_path):
    """Footer-only counts equal true row counts; directory sweep and
    single-file forms agree; no data pages are touched (counts come
    from metadata even for column-heavy files)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bigdime_ray.sources.tables import metadata_row_counts
    for i, n in enumerate((7, 0, 123)):
        pq.write_table(pa.table({"a": pa.array(range(n)),
                                 "b": pa.array([str(x) for x in
                                                range(n)])}),
                       tmp_path / f"f{i}.parquet")
    t = metadata_row_counts(str(tmp_path))
    rows = dict(zip([p.split("/")[-1] for p in t["path"].to_pylist()],
                    t["rows"].to_pylist()))
    assert rows == {"f0.parquet": 7, "f1.parquet": 0,
                    "f2.parquet": 123}
    one = metadata_row_counts(str(tmp_path / "f2.parquet"))
    assert one["rows"].to_pylist() == [123]
    d = tmp_path / "empty_dir"
    d.mkdir()
    assert metadata_row_counts(str(d)).num_rows == 0
    import pytest
    with pytest.raises(FileNotFoundError):
        metadata_row_counts(str(tmp_path / "nope_missing"))


def test_unpivot_matches_pandas_melt():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from bigdime_ray.pipelines.nested import unpivot
    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                       "a": np.arange(10, dtype=np.int64) * 2,
                       "b": np.arange(10, dtype=np.int64) * 3})
    ds = rd.from_pandas(df).repartition(3)
    got = (unpivot(ds, ["k"], ["a", "b"]).to_pandas()
           .sort_values(["k", "metric"]).reset_index(drop=True))
    want = (df.melt(id_vars=["k"], value_vars=["a", "b"],
                    var_name="metric", value_name="value")
            .sort_values(["k", "metric"]).reset_index(drop=True))
    assert got.equals(want)
    # mixed value types are rejected, not silently promoted
    df2 = df.assign(b=df.b.astype(float))
    with pytest.raises(Exception, match="mix types"):
        unpivot(rd.from_pandas(df2), ["k"], ["a", "b"]).to_pandas()
