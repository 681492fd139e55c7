"""Heavy hitters (Misra-Gries + exact verify), distinct count, HLL."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from bigdime_ray.functions.hashing import mix64
from bigdime_ray.pipelines.frequency import (approx_distinct_count,
                                             distinct_count, heavy_hitters)
from bigdime_ray.state.sketches import (HyperLogLogState, MisraGriesState,
                                        merge_states)


@pytest.fixture(scope="module")
def key_ds():
    rng = np.random.default_rng(17)
    # zipf-ish: a few hot keys + a long tail
    hot = np.repeat(np.arange(5), [500, 300, 200, 120, 80])
    tail = rng.integers(100, 5000, 3000)
    keys = np.concatenate([hot, tail])
    rng.shuffle(keys)
    return (ray.data.from_arrow(pa.table({
        "k": pa.array(keys, type=pa.int64())})).repartition(6),
        pd.Series(keys))


def test_heavy_hitters_exact(key_ds):
    ds, series = key_ds
    for threshold in (50, 100, 400):
        expect = series.value_counts()
        expect = expect[expect >= threshold].sort_index()
        got = heavy_hitters(ds, "k", threshold=threshold,
                            capacity=256).to_pandas().sort_values("k")
        assert got.k.tolist() == expect.index.tolist(), threshold
        assert got.cnt.tolist() == expect.tolist(), threshold


def test_misra_gries_superset_guarantee():
    rng = np.random.default_rng(4)
    keys = np.concatenate([np.repeat(7, 900), rng.integers(10, 10_000, 9000)])
    n = len(keys)
    cap = 64
    chunks = np.array_split(keys, 10)
    merged = merge_states([MisraGriesState.from_keys(c, cap)
                           for c in chunks])
    # any key with true count > n/cap must survive the merge
    assert 7 in merged.keys
    true = pd.Series(keys).value_counts()
    for k in true[true > n / cap].index:
        assert k in merged.keys


def test_distinct_count_exact(key_ds):
    ds, series = key_ds
    assert distinct_count(ds, "k") == series.nunique()


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(9)
    for true_n in (100, 5_000, 200_000):
        vals = rng.integers(0, 2**62, true_n).astype(np.int64)
        h = mix64(np.unique(vals).view(np.uint64))
        whole = HyperLogLogState.from_hashes(h)
        est = whole.estimate()
        assert abs(est - len(np.unique(vals))) / true_n < 0.05, true_n
        chunks = np.array_split(h, 7)
        merged = merge_states([HyperLogLogState.from_hashes(c)
                               for c in chunks])
        assert np.array_equal(merged.registers, whole.registers)


def test_approx_distinct_count(key_ds):
    ds, series = key_ds
    est = approx_distinct_count(ds, "k")
    assert abs(est - series.nunique()) / series.nunique() < 0.1


def test_heavy_hitters_capacity_escalation():
    """Review finding (r2): undersized capacity must auto-escalate, not
    silently drop true heavy hitters."""
    rng = np.random.default_rng(2)
    # 3 true HH at threshold 30 among heavy tail noise
    keys = np.concatenate([np.repeat([1, 2, 3], 40),
                           rng.integers(100, 50_000, 20_000)])
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys,
                                                     type=pa.int64())})) \
        .repartition(5)
    got = heavy_hitters(ds, "k", threshold=30, capacity=8) \
        .to_pandas().sort_values("k")
    expect = pd.Series(keys).value_counts()
    expect = expect[expect >= 30].sort_index()
    assert got.k.tolist() == expect.index.tolist()
    assert got.cnt.tolist() == expect.tolist()


def test_label_propagation_nonconvergence_raises():
    import pytest as _pytest
    from bigdime_ray.pipelines.dedup import label_propagation_components
    chain = pd.DataFrame({"id_a": list(range(0, 6)),
                          "id_b": list(range(1, 7))})
    with _pytest.raises(RuntimeError, match="did not converge"):
        label_propagation_components(chain, max_iter=2).to_pandas()


def test_distinct_count_bucketed_equals_driver(key_ds):
    """VERDICT r2 #3: the bucketed merge path (per-bucket count, driver
    sums ints) must equal the driver merge and the true nunique."""
    ds, series = key_ds
    for nb in (1, 3, 8):
        assert distinct_count(ds, "k", num_buckets=nb) == series.nunique()


def test_grouped_distinct_count_equals_pandas():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import grouped_distinct_count
    rng = np.random.default_rng(31)
    n = 5000
    t = pa.table({
        "g": pa.array(np.asarray(["a", "b", "c", "dd"])[
            rng.integers(0, 4, n)], type=pa.string()),
        "k": pa.array(rng.integers(0, 400, n), type=pa.int64())})
    for nb in (1, 8):
        got = grouped_distinct_count(
            rd.from_arrow(t).repartition(5), "g", "k",
            num_buckets=nb).to_pandas().set_index("g")["n_distinct"]
        exp = t.to_pandas().groupby("g")["k"].nunique()
        assert got.sort_index().tolist() == exp.sort_index().tolist()


def test_pivot_counts_matches_crosstab():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import pivot_counts
    rng = np.random.default_rng(32)
    n = 4000
    types = ["a", "b", "c"]
    t = pa.table({
        "k": pa.array(rng.integers(0, 120, n), type=pa.int64()),
        "tp": pa.array(np.asarray(types + ["zz"])[  # zz excluded
            rng.integers(0, 4, n)], type=pa.string())})
    got = (pivot_counts(rd.from_arrow(t).repartition(5), "k", "tp", types)
           .to_pandas().sort_values("k").reset_index(drop=True))
    df = t.to_pandas()
    ct = pd.crosstab(df.k, df.tp).reindex(columns=types + ["zz"],
                                          fill_value=0)
    # keys whose only rows are 'zz' never appear; align on got's keys
    assert set(got.k) == set(df[df.tp.isin(types)].k.unique())
    for _, r in got.iterrows():
        for tp in types:
            assert r[f"n_{tp}"] == ct.loc[r.k, tp]


def test_grouped_quantiles_exact_matches_pandas():
    """Exact path == pandas quantile(interpolation='linear') — the
    quantile_cont rule — including 1-row groups and duplicate values."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import grouped_quantiles
    rng = np.random.default_rng(5)
    n = 900
    df = pd.DataFrame({
        "k": rng.integers(0, 20, n),
        "v": np.round(rng.uniform(0, 100, n), 2)})
    df.loc[df.k == 19, "k"] = 21   # leave a gap
    df = pd.concat([df, pd.DataFrame({"k": [99], "v": [3.5]})])  # 1-row grp
    qs = [0.25, 0.5, 0.75]
    got = (grouped_quantiles(rd.from_pandas(df).repartition(5),
                             "k", "v", qs)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.groupby("k")["v"]
           .quantile(qs, interpolation="linear").unstack()
           .reset_index())
    exp.columns = ["k", "q25", "q50", "q75"]
    for c in ["q25", "q50", "q75"]:
        np.testing.assert_allclose(got[c].to_numpy(), exp[c].to_numpy(),
                                   rtol=0, atol=1e-9)


def test_grouped_quantiles_tdigest_within_epsilon():
    """t-digest path within the documented O(q(1-q)/compression) error
    of exact (as a rank tolerance, checked by value bracketing)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import grouped_quantiles
    rng = np.random.default_rng(11)
    n = 20_000
    df = pd.DataFrame({"k": rng.integers(0, 4, n),
                       "v": rng.lognormal(3, 1, n)})
    got = (grouped_quantiles(rd.from_pandas(df).repartition(8),
                             "k", "v", [0.5, 0.9], method="tdigest")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, r in got.iterrows():
        vals = np.sort(df[df.k == r.k].v.to_numpy())
        m = len(vals)
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            # rank of the digest's answer must be within eps of q
            rank = np.searchsorted(vals, r[col]) / m
            assert abs(rank - q) < 0.02, (r.k, q, rank)


def test_grouped_moments_exact():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import grouped_moments
    rng = np.random.default_rng(8)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 500),
                       "v": rng.integers(-50, 500, 500)})
    got = (grouped_moments(rd.from_pandas(df).repartition(4), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = df.groupby("k")["v"].agg(
        n="count", s="sum", ss=lambda x: int((x.astype(object) ** 2).sum())
    ).reset_index()
    assert got.n.tolist() == exp.n.tolist()
    assert got.s.tolist() == exp.s.tolist()
    assert got.ss.tolist() == exp.ss.tolist()
    # variance derived from the moments == pandas var (float check)
    for _, r in got.iterrows():
        var = (r.n * r.ss - r.s * r.s) / (r.n * (r.n - 1))
        pd_var = df[df.k == r.k].v.var()
        np.testing.assert_allclose(var, pd_var, rtol=1e-12)


def test_grouped_comoments_exact():
    """Bivariate moment sums == exact integer brute force; covariance /
    correlation derived from them == pandas cov/corr."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import grouped_comoments
    rng = np.random.default_rng(17)
    n = 800
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c", "d"], n),
                       "x": rng.integers(-20, 80, n),
                       "y": rng.integers(0, 11, n)})
    # correlate x and y within group 'a' so corr isn't ~0 everywhere
    m = df.k == "a"
    df.loc[m, "y"] = (df.loc[m, "x"] // 10).clip(0, 10)
    got = (grouped_comoments(rd.from_pandas(df).repartition(5),
                             "k", "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, r in got.iterrows():
        g = df[df.k == r.k]
        assert r.n == len(g)
        assert r.sx == g.x.sum() and r.sy == g.y.sum()
        assert r.sxx == (g.x.astype(object) ** 2).sum()
        assert r.syy == (g.y.astype(object) ** 2).sum()
        assert r.sxy == (g.x.astype(object) * g.y).sum()
        cov = (r.n * r.sxy - r.sx * r.sy) / (r.n * (r.n - 1))
        np.testing.assert_allclose(cov, g.x.cov(g.y), rtol=1e-12)
        corr = (r.n * r.sxy - r.sx * r.sy) / np.sqrt(
            float(r.n * r.sxx - r.sx * r.sx)
            * float(r.n * r.syy - r.sy * r.sy))
        np.testing.assert_allclose(corr, g.x.corr(g.y), rtol=1e-9)


def test_grouped_string_agg_deterministic_order():
    """string_agg == per-group sep-join in explicit order_col order,
    independent of input partitioning / physical row order."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import grouped_string_agg
    rng = np.random.default_rng(41)
    n = 300
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], n),
                       "v": rng.permutation(n).astype(np.int64)})
    shuffled = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    got = (grouped_string_agg(rd.from_pandas(shuffled).repartition(5),
                              "k", "v", "v", sep="|")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.sort_values(["k", "v"]).groupby("k")["v"]
           .agg(lambda s: "|".join(s.astype(str)))
           .rename("agg").reset_index())
    assert got.equals(exp)


def test_rollup_aggregate_matches_pandas():
    """rollup == every hierarchical grain of groupby-sum + grand total,
    coalesced with the all-label."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import rollup_aggregate
    rng = np.random.default_rng(53)
    n = 400
    df = pd.DataFrame({"a": rng.choice(["x", "y", "z"], n),
                       "b": rng.choice(["p", "q"], n),
                       "v": rng.integers(0, 1000, n)})
    got = (rollup_aggregate(rd.from_pandas(df).repartition(4),
                            ["a", "b"], "v")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    fine = df.groupby(["a", "b"], as_index=False)["v"] \
        .agg(n="count", s="sum")
    lvl1 = df.groupby("a", as_index=False)["v"].agg(n="count", s="sum")
    lvl1["b"] = "(all)"
    total = pd.DataFrame({"a": ["(all)"], "b": ["(all)"],
                          "n": [n], "s": [df.v.sum()]})
    fine = fine.rename(columns={"count": "n", "sum": "s"})
    exp = (pd.concat([fine, lvl1, total], ignore_index=True)
           [["a", "b", "n", "s"]]
           .sort_values(["a", "b"]).reset_index(drop=True))
    exp["n"] = exp["n"].astype(np.int64)
    exp["s"] = exp["s"].astype(np.int64)
    assert got.equals(exp)


def test_grouped_collect_list_ordered():
    """collect_list == per-group values in explicit order_col order,
    invariant to input shuffling; typed list<int64> output."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import grouped_collect_list
    rng = np.random.default_rng(61)
    n = 250
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], n),
                       "o": rng.permutation(n).astype(np.int64),
                       "v": rng.integers(0, 100, n).astype(np.int64)})
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    got = (grouped_collect_list(rd.from_pandas(shuffled).repartition(4),
                                "k", "v", "o")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, r in got.iterrows():
        exp = df[df.k == r.k].sort_values("o").v.tolist()
        assert list(r.vals) == exp


def test_count_histogram_matches_pandas(key_ds):
    from bigdime_ray.pipelines.frequency import count_histogram
    ds, series = key_ds
    expect = (series.value_counts().value_counts().sort_index())
    got = count_histogram(ds, "k").to_pandas().sort_values("cnt")
    assert got.cnt.tolist() == expect.index.tolist()
    assert got.num_keys.tolist() == expect.tolist()
    # bucketed path == driver path (strategy equivalence)
    got8 = (count_histogram(ds, "k", num_buckets=8).to_pandas()
            .sort_values("cnt").reset_index(drop=True))
    assert got8.equals(got.reset_index(drop=True))


def test_count_histogram_zero_bucket(key_ds):
    from bigdime_ray.pipelines.frequency import count_histogram
    ds, series = key_ds
    n_distinct = series.nunique()
    # dimension claims 1000 extra keys that never occur in the fact
    got = count_histogram(ds, "k", total_keys=n_distinct + 1000) \
        .to_pandas().sort_values("cnt")
    assert got.cnt.iloc[0] == 0 and got.num_keys.iloc[0] == 1000
    assert got.num_keys.sum() == n_distinct + 1000
    # fact ⊄ dimension must raise, never silently emit a negative row
    with pytest.raises(ValueError):
        count_histogram(ds, "k", total_keys=3)


def test_grouped_mode_ties_deterministic():
    from bigdime_ray.pipelines.frequency import grouped_mode
    df = pd.DataFrame({
        "g": ["a"] * 6 + ["b"] * 4 + ["c"] * 1,
        # group a: x and y tied 3-3 -> smallest value "x" wins;
        # group b: z strictly wins; group c: singleton
        "v": ["y", "x", "y", "x", "y", "x",
              "z", "z", "q", "z", "solo"]})
    ds = ray.data.from_pandas(df).repartition(3)
    got = grouped_mode(ds, "g", "v").to_pandas().sort_values("g")
    assert got.g.tolist() == ["a", "b", "c"]
    assert got["mode"].tolist() == ["x", "z", "solo"]
    assert got.cnt.tolist() == [3, 3, 1]
    # partition-invariance: a different physical layout, same answer
    got1 = grouped_mode(ray.data.from_pandas(df).repartition(7),
                        "g", "v").to_pandas().sort_values("g")
    assert got1["mode"].tolist() == got["mode"].tolist()


def test_pivot_sums_matches_crosstab():
    from bigdime_ray.pipelines.frequency import pivot_sums
    rng = np.random.default_rng(23)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "t": rng.choice(["a", "b", "c", "zz"], n),
        "v": rng.uniform(-10, 10, n).round(4)})
    ds = ray.data.from_pandas(df).repartition(5)
    got = (pivot_sums(ds, "k", "t", "v", values=["a", "b", "c"],
                      scale=10_000).to_pandas()
           .sort_values("k").reset_index(drop=True))
    df["vs"] = np.floor(df.v.to_numpy() * 10_000 + 0.5).astype(np.int64)
    expect = pd.crosstab(df.k, df.t, values=df.vs, aggfunc="sum") \
        .fillna(0).astype(np.int64)
    for t in ["a", "b", "c"]:
        assert got[f"s_{t}"].tolist() == expect[t].tolist(), t
    # "zz" ignored: totals only cover the listed values
    assert got[[f"s_{t}" for t in "abc"]].to_numpy().sum() == \
        df.loc[df.t != "zz", "vs"].sum()


def test_grouped_mad_matches_brute_force():
    from bigdime_ray.pipelines.frequency import grouped_mad
    rng = np.random.default_rng(41)
    n = 4000
    df = pd.DataFrame({
        "g": rng.integers(0, 25, n).astype(np.int64),
        "v": rng.integers(-1000, 1000, n).astype(np.int64)})
    # odd- and even-sized groups both exercised by random sizes
    got = (grouped_mad(ray.data.from_pandas(df).repartition(6), "g", "v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    for g, sub in df.groupby("g"):
        v = sub.v.to_numpy().astype(np.float64)
        mad = np.median(np.abs(v - np.median(v)))
        want = int(round(4 * mad))
        assert got.loc[got.g == g, "mad4"].iloc[0] == want, g


def test_cube_and_grouping_sets_match_pandas():
    from bigdime_ray.pipelines.frequency import (cube_aggregate,
                                                 grouping_sets_aggregate)
    import pytest as _pytest
    rng = np.random.default_rng(43)
    n = 2000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(0, 100, n).astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(4)
    got = cube_aggregate(ds, ["a", "b"], "v").to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == 3 * 2 + 3 + 2 + 1  # all four grouping sets
    # finest grain
    fine = df.groupby(["a", "b"], as_index=False).v.agg(["count", "sum"])
    for _, r in fine.reset_index().iterrows():
        row = got[(got.a == r.a) & (got.b == r.b)]
        assert row.n.iloc[0] == r["count"] and row.s.iloc[0] == r["sum"]
    # b-only grain (the set ROLLUP cannot produce)
    bonly = df.groupby("b").v.sum()
    for b, s in bonly.items():
        assert got[(got.a == "(all)") & (got.b == b)].s.iloc[0] == s
    # grand total
    assert got[(got.a == "(all)") & (got.b == "(all)")].s.iloc[0] == \
        df.v.sum()
    # explicit grouping sets subset: just (a) and ()
    gs = grouping_sets_aggregate(ds, ["a", "b"], "v", [["a"], []]) \
        .to_pandas()
    assert len(gs) == 3 + 1
    assert (gs.b == "(all)").all()
    with _pytest.raises(ValueError):
        grouping_sets_aggregate(ds, ["a", "b"], "v", [["nope"]])


def test_grouped_quantiles_disc_matches_duckdb_semantics():
    from bigdime_ray.pipelines.frequency import grouped_quantiles
    rng = np.random.default_rng(47)
    n = 3000
    df = pd.DataFrame({
        "g": rng.integers(0, 20, n).astype(np.int64),
        "v": rng.integers(0, 10_000, n).astype(np.int64)})
    qs = [0.25, 0.5, 0.9]
    got = (grouped_quantiles(ray.data.from_pandas(df).repartition(5),
                             "g", "v", qs, method="disc")
           .to_pandas().sort_values("g").reset_index(drop=True))
    # dtype passes through: int64 in, int64 out, values FROM the set
    assert got.q50.dtype == np.int64
    for g, sub in df.groupby("g"):
        v = np.sort(sub.v.to_numpy())
        for q, name in zip(qs, ["q25", "q50", "q90"]):
            idx = max(int(np.ceil(q * len(v))) - 1, 0)
            assert got.loc[got.g == g, name].iloc[0] == v[idx], (g, q)


def test_group_share_exact_integer_division():
    from bigdime_ray.pipelines.frequency import group_share
    rng = np.random.default_rng(59)
    n = 2500
    df = pd.DataFrame({
        "g": rng.integers(0, 8, n).astype(np.int64),
        "v": rng.integers(0, 100_000, n).astype(np.int64)})
    got = (group_share(ray.data.from_pandas(df).repartition(5),
                       "g", "v").to_pandas()
           .sort_index().reset_index(drop=True))
    totals = df.groupby("g").v.sum()
    exp = (df.v.to_numpy() * 1_000_000
           // totals[df.g].to_numpy())
    # row identity preserved (input columns untouched, share appended)
    assert got.v.tolist() == df.v.tolist()
    assert got.share_ppm.tolist() == exp.tolist()
    # shares of a group sum to ~1e6 (floor division undershoots)
    per_g = got.groupby("g").share_ppm.sum()
    assert ((1_000_000 - per_g) >= 0).all()
    assert ((1_000_000 - per_g) < df.groupby("g").size()).all()


def test_grouped_iqr_outliers_matches_brute_force():
    from bigdime_ray.pipelines.frequency import grouped_iqr_outliers
    rng = np.random.default_rng(67)
    n = 4000
    df = pd.DataFrame({
        "g": rng.integers(0, 10, n).astype(np.int64),
        "v": rng.integers(0, 1000, n).astype(np.int64)})
    # plant unambiguous outliers
    df.loc[df.sample(40, random_state=1).index, "v"] = 10_000_000
    df.loc[df.sample(30, random_state=2).index, "v"] = -10_000_000
    got = (grouped_iqr_outliers(ray.data.from_pandas(df).repartition(6),
                                "g", "v").to_pandas()
           .sort_values("g").reset_index(drop=True))
    for g, sub in df.groupby("g"):
        v = sub.v.to_numpy().astype(np.float64)
        q1, q3 = np.quantile(v, [0.25, 0.75])  # linear interp = SQL
        iqr = q3 - q1
        nl = int((v < q1 - 1.5 * iqr).sum())
        nh = int((v > q3 + 1.5 * iqr).sum())
        row = got[got.g == g]
        assert row.n_low.iloc[0] == nl, g
        assert row.n_high.iloc[0] == nh, g
        assert row.n_outliers.iloc[0] == nl + nh, g


def test_grouped_approx_distinct_accuracy_and_invariance():
    """Grouped HLL: estimates within sketch tolerance of the exact
    per-group distinct counts, and PARTITION-INVARIANT (register
    merges are exact maxima, so any block split yields the identical
    table)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.frequency import grouped_approx_distinct
    rng = np.random.default_rng(21)
    n = 30_000
    grp = rng.choice(["a", "b", "c", "d"], n, p=[0.5, 0.3, 0.15, 0.05])
    # very different distinct cardinalities per group
    key = np.where(grp == "a", rng.integers(0, 8000, n),
                   np.where(grp == "b", rng.integers(0, 800, n),
                            np.where(grp == "c",
                                     rng.integers(0, 60, n),
                                     rng.integers(0, 5, n))))
    tbl = pa.table({"g": pa.array(grp), "k": pa.array(key,
                                                      type=pa.int64())})
    exact = pd.DataFrame({"g": grp, "k": key}).groupby("g")["k"] \
        .nunique()
    results = {}
    for parts in (2, 7):
        t = grouped_approx_distinct(
            rd.from_arrow(tbl).repartition(parts), "g", "k", p=8,
            num_buckets=3)
        results[parts] = list(zip(t["g"].to_pylist(),
                                  t["approx_distinct"].to_pylist()))
    assert results[2] == results[7]  # partition-invariant, bit-exact
    for g, est in results[2]:
        true = exact[g]
        assert abs(est - true) <= max(3, 0.2 * true), (g, est, true)
