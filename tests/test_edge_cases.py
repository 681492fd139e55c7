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


def test_new_ops_on_empty_and_tiny_inputs():
    """Heavy hitters / distinct / hopping / asof behave on degenerate
    inputs (empty filter results, single rows)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.frequency import distinct_count, heavy_hitters
    from bigdime_ray.pipelines.stream import asof_join_grouped, hopping_window

    one = ray.data.from_arrow(pa.table({"k": pa.array([7], pa.int64())}))
    hh = heavy_hitters(one, "k", threshold=1).to_pandas()
    assert hh.k.tolist() == [7] and hh.cnt.tolist() == [1]
    assert heavy_hitters(one, "k", threshold=2).to_pandas().empty
    assert distinct_count(one, "k") == 1

    df = pd.DataFrame({
        "event_id": [0, 1], "user_id": [1, 1],
        "ts": pd.to_datetime(["2026-01-01 00:00", "2026-01-01 00:10"]),
        "event_type": ["purchase", "purchase"], "v": [1.0, 2.0]})
    ds = ray.data.from_pandas(df)
    left = ds.filter(expr="event_type == 'purchase'")
    right = ds.filter(expr="event_type == 'click'")  # EMPTY right side
    out = asof_join_grouped(left, right, "user_id", "ts",
                            "event_id", "event_id").to_pandas()
    assert len(out) == 2 and out.matched_id.isna().all()

    hw = hopping_window(ds, "user_id", "ts", "v",
                        size_seconds=3600, hop_seconds=1800).to_pandas()
    assert hw.cnt.sum() == 4  # 2 events × 2 windows


def test_train_val_split_deterministic_and_partition_invariant():
    import numpy as np
    import pandas as pd
    import ray.data
    from bigdime_ray.pipelines.curate import train_val_split
    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
    a = (train_val_split(ray.data.from_pandas(df).repartition(3))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (train_val_split(ray.data.from_pandas(df).repartition(11))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.split.tolist() == b.split.tolist()  # retry/partition-safe
    frac = (a.split == "val").mean()
    assert 0.06 < frac < 0.14  # ~10% with hash wobble
    assert set(a.split) == {"train", "val"}


def test_shuffled_export_deterministic_permutation():
    """shuffled_export: output is a permutation of the input; the same
    seed reproduces the same order; a different seed differs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.curate import shuffled_export
    tbl = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64))})
    ds = rd.from_arrow(tbl).repartition(5)
    a1 = shuffled_export(ds, seed=7).to_pandas().k.to_numpy()
    a2 = shuffled_export(ds, seed=7).to_pandas().k.to_numpy()
    b = shuffled_export(ds, seed=8).to_pandas().k.to_numpy()
    assert sorted(a1) == list(range(5000))
    assert np.array_equal(a1, a2)          # seed-deterministic
    assert not np.array_equal(a1, b)       # seed-sensitive
    assert not np.array_equal(a1, np.arange(5000))  # actually shuffled


def test_quarantine_map_isolates_bad_rows():
    """quarantine_map: healthy rows flow through one vectorized fn
    call; rows that crash the kernel are bisected out with the error
    text; good ∪ quarantined == input."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.stages.quarantine import quarantine_map
    vals = list(range(40))
    poison = {7, 23, 24}
    ds = rd.from_arrow(pa.table({
        "v": pa.array(vals, type=pa.int64())})).repartition(3)

    def kernel(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        if np.isin(v, list(poison)).any():
            raise ValueError("poison row")
        return pa.table({"v": batch["v"],
                         "sq": pa.array(v * v)})

    good, quar = quarantine_map(ds, kernel)
    g = good.to_pandas().sort_values("v")
    q = quar.to_pandas()
    assert set(g.v) == set(vals) - poison
    assert (g.sq.to_numpy() == g.v.to_numpy() ** 2).all()
    assert len(q) == len(poison)
    assert all("poison row" in e for e in q.error)
    got_poison = {int(s.split("'v': ")[1].rstrip("}")) for s in q.row_json}
    assert got_poison == poison


def test_quarantine_map_all_good_and_all_bad():
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.stages.quarantine import quarantine_map
    ds = rd.from_arrow(pa.table({"v": pa.array([1, 2, 3])}))
    good, quar = quarantine_map(ds, lambda b: b)
    assert sorted(good.to_pandas().v) == [1, 2, 3]
    assert quar.count() == 0

    def always_fail(b):
        raise RuntimeError("nope")
    # all-poison block + fn that also rejects the empty probe slice:
    # with out_schema the good side keeps a real schema
    good2, quar2 = quarantine_map(
        ds, always_fail, out_schema=pa.schema([("v", pa.int64())]))
    assert good2.count() == 0
    assert quar2.count() == 3
    # without out_schema the failure is LOUD at the source (ADVICE r3:
    # a marker-only block would otherwise become a zero-column empty
    # block that crashes join/union far downstream)
    good3, _quar3 = quarantine_map(ds, always_fail)
    with pytest.raises(Exception, match="out_schema"):
        good3.count()


def test_zorder_sort_improves_two_column_pruning(tmp_path):
    """Z-order layout: a 2D box query overlaps far fewer parquet row
    groups than a single-column sort; content is a permutation of the
    input; both filter columns get pruning power."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from bigdime_ray.stages.layout import zorder_sort
    rng = np.random.default_rng(13)
    n = 20_000
    a = rng.uniform(0, 1000, n)
    b = rng.uniform(0, 1000, n)
    tbl = pa.table({"a": pa.array(a), "b": pa.array(b),
                    "id": pa.array(np.arange(n, dtype=np.int64))})
    ds = rd.from_arrow(tbl).repartition(4)

    z = zorder_sort(ds, ["a", "b"]).to_pandas()
    assert sorted(z.id) == list(range(n))  # permutation, nothing lost

    def overlap_fraction(df, qa=(0, 250), qb=(0, 250)):
        t = pa.Table.from_pandas(df, preserve_index=False)
        p = tmp_path / "probe.parquet"
        pq.write_table(t, p, row_group_size=200)
        md = pq.ParquetFile(p).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ia, ib = names.index("a"), names.index("b")
        hit = 0
        for g in range(md.num_row_groups):
            sa = md.row_group(g).column(ia).statistics
            sb = md.row_group(g).column(ib).statistics
            if (sa.min <= qa[1] and sa.max >= qa[0]
                    and sb.min <= qb[1] and sb.max >= qb[0]):
                hit += 1
        return hit / md.num_row_groups

    import pandas as pd
    base = pd.DataFrame({"a": a, "b": b,
                         "id": np.arange(n)}).sort_values("a")
    f_sorted_a = overlap_fraction(base)
    f_z = overlap_fraction(z)
    # sort-by-a prunes a (25% of groups hit) but every survivor spans
    # all of b; z-order prunes BOTH dims (measured ~8% of groups)
    assert f_z < f_sorted_a / 2, (f_z, f_sorted_a)
    assert f_z < 0.15
