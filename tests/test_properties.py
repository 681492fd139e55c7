"""Property-based tests (hypothesis) for the mergeable-state algebra and
hashing kernels — SURVEY.md §5.2 item 3: partial-state merge must be
associative + commutative under ANY block split/permutation; checksums
order-insensitive but content-sensitive; digests within ε of exact."""

import numpy as np
import pyarrow as pa
from hypothesis import example, given, settings, strategies as st

from bigdime_ray.functions.hashing import (fold_checksum, hash_int_list_column,
                                           merge_checksums, row_content_hash)
from bigdime_ray.state.sketches import (ColumnStatsState, HistogramState,
                                        TDigestState, merge_states)

SETTINGS = dict(max_examples=30, deadline=None)

token_lists = st.lists(
    st.one_of(st.integers(-100, 40_000), st.none()), min_size=0, max_size=30)
rows = st.lists(st.one_of(token_lists, st.none()), min_size=1, max_size=40)


@given(rows)
@settings(**SETTINGS)
def test_list_hash_total_and_deterministic(data):
    arr = pa.array(data, type=pa.list_(pa.int32()))
    h1 = hash_int_list_column(arr)
    h2 = hash_int_list_column(arr)
    assert len(h1) == len(data)
    assert np.array_equal(h1, h2)


@given(rows, st.randoms(use_true_random=False))
@settings(**SETTINGS)
def test_checksum_order_insensitive(data, rnd):
    ids = pa.array([f"d{i}" for i in range(len(data))])
    toks = pa.array(data, type=pa.list_(pa.int32()))
    total = fold_checksum(row_content_hash(ids, toks))
    perm = list(range(len(data)))
    rnd.shuffle(perm)
    idx = pa.array(perm)
    total_p = fold_checksum(row_content_hash(ids.take(idx), toks.take(idx)))
    assert total == total_p
    # any block split folds to the same value
    cut = len(data) // 2
    h = row_content_hash(ids, toks)
    assert merge_checksums(fold_checksum(h[:cut]), fold_checksum(h[cut:])) \
        == total


@given(st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=200),
       st.integers(1, 7), st.randoms(use_true_random=False))
@settings(**SETTINGS)
def test_column_stats_split_invariant(values, n_chunks, rnd):
    v = np.asarray(values)
    whole = ColumnStatsState.from_numpy(v)
    chunks = [c for c in np.array_split(v, min(n_chunks, len(v))) if len(c)]
    states = [ColumnStatsState.from_numpy(c) for c in chunks]
    rnd.shuffle(states)
    merged = merge_states(states)
    assert merged.count == whole.count
    assert merged.minimum == whole.minimum
    assert merged.maximum == whole.maximum
    assert np.isclose(merged.total, whole.total, rtol=1e-9, atol=1e-6)


@given(st.lists(st.integers(0, 499), min_size=0, max_size=500),
       st.integers(1, 5))
@settings(**SETTINGS)
def test_histogram_split_invariant(ids, n_chunks):
    v = np.asarray(ids, dtype=np.int64)
    whole = HistogramState.from_values(v, 500)
    chunks = np.array_split(v, n_chunks)
    merged = merge_states([HistogramState.from_values(c, 500)
                           for c in chunks])
    assert np.array_equal(merged.dense(), whole.dense())


@given(st.lists(st.floats(0, 1e4), min_size=50, max_size=400),
       st.integers(2, 6))
@settings(**SETTINGS)
@example(values=[0.0] * 40 + [158.0] * 39 + [314.0], n_chunks=1)
@example(values=[0.0] * 50 + [274.0] + [158.0] * 4 + [314.0], n_chunks=2)
@example(values=[0.0] * 45 + [10000.0] * 5, n_chunks=3)
def test_tdigest_quantiles_bounded_error(values, n_chunks):
    v = np.asarray(values)
    merged = merge_states([TDigestState.from_values(c)
                           for c in np.array_split(v, n_chunks) if len(c)])
    assert merged.total_weight == len(v)
    lo, hi = v.min(), v.max()
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)[0]
        assert lo - 1e-9 <= est <= hi + 1e-9
        exact = np.quantile(v, q)
        span = max(hi - lo, 1e-9)
        assert abs(est - exact) <= 0.25 * span  # coarse bound, small n


@given(st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=300),
       st.integers(1, 6), st.randoms(use_true_random=False))
@settings(**SETTINGS)
def test_hll_merge_split_invariant(values, n_chunks, rnd):
    from bigdime_ray.functions.hashing import mix64
    from bigdime_ray.state.sketches import HyperLogLogState
    h = mix64(np.asarray(values, dtype=np.int64).view(np.uint64))
    whole = HyperLogLogState.from_hashes(h)
    chunks = [c for c in np.array_split(h, n_chunks) if len(c)]
    states = [HyperLogLogState.from_hashes(c) for c in chunks]
    rnd.shuffle(states)
    merged = merge_states(states)
    assert np.array_equal(merged.registers, whole.registers)


@given(st.lists(st.integers(0, 500), min_size=1, max_size=400),
       st.integers(1, 5), st.integers(8, 64))
@settings(**SETTINGS)
def test_misra_gries_guarantee_under_splits(keys, n_chunks, cap):
    from bigdime_ray.state.sketches import MisraGriesState
    k = np.asarray(keys, dtype=np.int64)
    merged = merge_states([MisraGriesState.from_keys(c, cap)
                           for c in np.array_split(k, n_chunks)
                           if len(c)])
    import collections
    true = collections.Counter(keys)
    bound = len(keys) / cap
    for key, cnt in true.items():
        if cnt > bound:
            assert key in merged.keys, (key, cnt, bound)


@given(st.lists(st.integers(1, 2000), min_size=1, max_size=300),
       st.integers(100, 2048))
@settings(**SETTINGS)
def test_pack_block_invariants_random(lengths, max_len):
    from bigdime_ray.pipelines.pack import pack_block
    ln = np.asarray(lengths, dtype=np.int64)
    capped = np.minimum(ln, max_len)
    packs, offsets = pack_block(capped, max_len)
    # every row assigned; per-pack totals within budget; offsets gap-free
    import pandas as pd
    df = pd.DataFrame({"p": packs, "o": offsets, "l": capped})
    assert (df.groupby("p")["l"].sum() <= max_len).all()
    for _, g in df.groupby("p"):
        g = g.sort_values("o")
        assert g.o.iloc[0] == 0
        assert (g.o.iloc[1:].to_numpy()
                == (g.o + g.l).iloc[:-1].to_numpy()).all()
