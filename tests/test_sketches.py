"""Mergeable sketches: associativity/commutativity (metamorphic), accuracy."""

import numpy as np
import pytest

from bigdime_ray.state.sketches import (ChecksumState, ColumnStatsState,
                                        CountState, HistogramState,
                                        PartialState, TDigestState,
                                        merge_states)


def test_count_and_checksum_merge():
    a, b = CountState(3), CountState(4)
    assert a.merge(b).n == 7
    c1 = ChecksumState(2**64 - 1, 1)
    c2 = ChecksumState(5, 1)
    m = c1.merge(c2)
    assert m.checksum == 4 and m.n == 2  # wrap-around


def test_column_stats_merge_matches_exact():
    rng = np.random.default_rng(0)
    data = rng.normal(100, 15, 10_000)
    # split arbitrarily, merge in shuffled order
    chunks = np.array_split(data, 13)
    states = [ColumnStatsState.from_numpy(c) for c in chunks]
    rng.shuffle(states)
    st = merge_states(states)
    assert st.count == len(data)
    assert st.minimum == data.min() and st.maximum == data.max()
    assert st.mean == pytest.approx(data.mean(), rel=1e-9)
    assert st.std == pytest.approx(data.std(), rel=1e-6)


def test_column_stats_nulls():
    st = ColumnStatsState.from_numpy(np.array([1.0, 2.0]), null_count=2)
    assert st.null_rate == 0.5 and st.valid_count == 2


def test_histogram_merge_equals_direct():
    rng = np.random.default_rng(1)
    v = rng.integers(0, 1000, 50_000)
    parts = np.array_split(v, 7)
    states = [HistogramState.from_values(p, 1000) for p in parts]
    merged = merge_states(states)
    direct = HistogramState.from_values(v, 1000)
    assert np.array_equal(merged.dense(), direct.dense())
    assert merged.total == 50_000


def test_histogram_ignores_out_of_range():
    h = HistogramState.from_values(np.array([-1, 0, 5, 1000, 999]), 1000)
    assert h.total == 3


def test_tdigest_quantiles_within_eps():
    rng = np.random.default_rng(2)
    data = rng.lognormal(4.0, 0.6, 100_000)
    chunks = np.array_split(data, 23)
    states = [TDigestState.from_values(c) for c in chunks]
    rng.shuffle(states)
    dig = merge_states(states)
    assert dig.total_weight == pytest.approx(len(data))
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        exact = np.quantile(data, q)
        est = dig.quantile(q)[0]
        assert abs(est - exact) / exact < 0.05, (q, est, exact)
    # cdf is monotone in [0, 1]
    grid = np.linspace(data.min(), data.max(), 100)
    cdf = dig.cdf(grid)
    assert (np.diff(cdf) >= -1e-12).all()
    assert 0.0 <= cdf[0] and cdf[-1] == 1.0
    # bounded centroid count
    assert len(dig.means) < 3 * dig.compression


def test_tdigest_merge_associative_estimates():
    rng = np.random.default_rng(3)
    data = rng.normal(0, 1, 30_000)
    a, b, c = np.array_split(data, 3)
    d1 = TDigestState.from_values(a).merge(
        TDigestState.from_values(b)).merge(TDigestState.from_values(c))
    d2 = TDigestState.from_values(a).merge(
        TDigestState.from_values(b).merge(TDigestState.from_values(c)))
    qs = [0.1, 0.5, 0.9]
    assert np.allclose(d1.quantile(qs), d2.quantile(qs), atol=0.05)


def test_serialization_roundtrip():
    st = ColumnStatsState.from_numpy(np.array([1.0, 5.0]))
    st2 = PartialState.from_bytes(st.to_bytes())
    assert st2.minimum == 1.0 and st2.maximum == 5.0
