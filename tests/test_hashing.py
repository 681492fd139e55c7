"""Hashing kernels: determinism, content/order sensitivity, fold merge."""

import numpy as np
import pyarrow as pa

from bigdime_ray.functions.hashing import (fold_checksum, hash_int_list_column,
                                           hash_string_column, i64_to_u64,
                                           merge_checksums, mix64,
                                           row_content_hash, u64_to_i64)


def _lists(data):
    return pa.array(data, type=pa.list_(pa.int32()))


def test_list_hash_deterministic_and_content_sensitive():
    a = _lists([[1, 2, 3], [4, 5], [], [7]])
    b = _lists([[1, 2, 3], [4, 5], [], [7]])
    assert np.array_equal(hash_int_list_column(a), hash_int_list_column(b))
    c = _lists([[1, 2, 4], [4, 5], [], [7]])
    assert hash_int_list_column(a)[0] != hash_int_list_column(c)[0]
    # order inside the list matters
    d = _lists([[3, 2, 1], [4, 5], [], [7]])
    assert hash_int_list_column(a)[0] != hash_int_list_column(d)[0]
    # distinct hashes for distinct rows
    h = hash_int_list_column(a)
    assert len(set(h.tolist())) == 4


def test_list_hash_handles_nulls_empties_slices():
    arr = _lists([None, [], [1], [1, None, 3]])
    h = hash_int_list_column(arr)
    assert len(h) == 4
    assert len(set(h.tolist())) == 4
    # null-inside differs from the same list with a value
    arr2 = _lists([None, [], [1], [1, 2, 3]])
    h2 = hash_int_list_column(arr2)
    assert h[3] != h2[3]
    # sliced array hashes like the equivalent unsliced one
    sl = arr.slice(2, 2)
    hs = hash_int_list_column(sl)
    assert np.array_equal(hs, h[2:4])
    # chunked arrays ok
    ch = pa.chunked_array([_lists([[1]]), _lists([[1, None, 3]])])
    hc = hash_int_list_column(ch)
    assert hc[1] == h[3]


def test_string_hash_deterministic():
    a = pa.array(["x", "y", None, ""])
    h1, h2 = hash_string_column(a), hash_string_column(a)
    assert np.array_equal(h1, h2)
    assert len(set(h1.tolist())) == 4


def test_checksum_fold_order_insensitive_content_sensitive():
    doc = pa.array(["a", "b", "c"])
    tok = _lists([[1], [2], [3]])
    h = row_content_hash(doc, tok)
    total = fold_checksum(h)
    # permuted rows → same fold
    perm = [2, 0, 1]
    h_perm = row_content_hash(doc.take(pa.array(perm)), tok.take(pa.array(perm)))
    assert fold_checksum(h_perm) == total
    # changed content → different fold
    tok2 = _lists([[1], [2], [4]])
    assert fold_checksum(row_content_hash(doc, tok2)) != total
    # fold merges associatively across blocks
    assert merge_checksums(fold_checksum(h[:2]), fold_checksum(h[2:])) == total


def test_u64_i64_roundtrip():
    for v in [0, 1, 2**63, 2**64 - 1, 0x9E3779B97F4A7C15]:
        assert i64_to_u64(u64_to_i64(v)) == v
    arr = np.array([0, 2**63, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(u64_to_i64(arr).view(np.uint64), arr)


def test_mix64_bijective_ish():
    xs = np.arange(10_000, dtype=np.uint64)
    assert len(np.unique(mix64(xs))) == 10_000


# ------------------------- fused single-pass kernel (SURVEY §7.2 #1)

def _fused_reference(col, vocab):
    """The three separate kernels the fused pass must reproduce."""
    import pyarrow.compute as pc
    from bigdime_ray.state.sketches import HistogramState
    lengths = (pc.fill_null(pc.list_value_length(col), 0)
               .to_numpy(zero_copy_only=False).astype(np.int64))
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = pc.list_flatten(col)
    # range (token_range's boolean path)
    if flat.null_count:
        inner_null = pc.is_null(flat).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(flat, 0).to_numpy(zero_copy_only=False)
    else:
        inner_null = np.zeros(len(flat), dtype=bool)
        vals = flat.to_numpy(zero_copy_only=False)
    bad = np.nonzero(inner_null | (vals < 0) | (vals >= vocab))[0]
    # histogram (stats_profile path)
    hv = (vals[~inner_null] if inner_null.any() else vals)
    hist = HistogramState.from_values(hv, vocab)
    return offsets, lengths, flat, bad, hist


def _check_fused(data, vocab, chunk_elems):
    from bigdime_ray.functions.fused import fused_token_scan
    from bigdime_ray.state.sketches import HistogramState
    col = _lists(data)
    offsets, lengths, flat, bad_ref, hist_ref = _fused_reference(col, vocab)
    f = fused_token_scan(flat, offsets, lengths, vocab,
                         chunk_elems=chunk_elems)
    assert np.array_equal(np.sort(f["bad_pos"]), bad_ref)
    got_hist = HistogramState.from_dense(f["hist"], vocab)
    assert np.array_equal(got_hist.ids, hist_ref.ids)
    assert np.array_equal(got_hist.counts, hist_ref.counts)
    # hash tail: via ScanCache against the separate kernel
    import pyarrow as _pa
    from bigdime_ray.stages.scan import ScanCache
    tbl = _pa.table({"tokens": col})
    cache = ScanCache(tbl, vocab=vocab)
    assert np.array_equal(cache.tokens_hash, hash_int_list_column(col))


def test_fused_token_scan_matches_separate_kernels():
    cases = [
        [[1, 2, 3], [4, 5], [], [7]],
        [None, [], [1], [1, None, 3]],
        [[0, 9, 9, 9], [-1, 100], None, [5]],
        [[]] * 5,
        [[3] * 50, [1], [2] * 17],
    ]
    for data in cases:
        for chunk in (4, 7, 1 << 18):   # force multi-chunk splits
            _check_fused(data, vocab=10, chunk_elems=chunk)


def test_fused_token_scan_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    rows = st.lists(
        st.one_of(st.none(),
                  st.lists(st.one_of(st.none(),
                                     st.integers(-5, 30)), max_size=12)),
        min_size=0, max_size=25)

    @settings(max_examples=60, deadline=None)
    @given(rows, st.integers(1, 3))
    def run(data, chunk):
        _check_fused(data, vocab=20, chunk_elems=chunk)

    run()


def test_incremental_dup_detector_equals_sorted_merge():
    """Drain-overlapped detector == the one-shot sorted-arrays kernel,
    including duplicates split across many block states and values
    landing exactly on bucket edges."""
    import numpy as np
    from bigdime_ray.validators.uniqueness import (
        IncrementalDupDetector, PackedHashState, _bucket_edges,
        _dups_from_sorted_arrays)

    rng = np.random.default_rng(7)
    edges = _bucket_edges(8)
    blocks = []
    for i in range(12):
        vals = rng.integers(-2**63, 2**63 - 1, 5000, dtype=np.int64)
        # plant cross-block dups + edge-exact values
        vals[:3] = [42, -42, int(edges[i % len(edges)])]
        blocks.append(vals)
    states = [PackedHashState.from_hashes(b.view(np.uint64)) for b in blocks]

    det = IncrementalDupDetector(n_buckets=8)
    for st in states:
        det.add_state_bytes(st.to_bytes())
    got = np.sort(det.finish())
    want = np.sort(_dups_from_sorted_arrays([s.array() for s in states]))
    np.testing.assert_array_equal(got, want)
    assert 42 in got and -42 in got


def test_uniqueness_member_fetch_bounded(ray_session):
    """VERDICT r4 #3: one id duplicated far beyond the collection cap
    yields a BOUNDED violations table while the verdict counts stay
    exact (counts come from block-local partials, not the fetch)."""
    import pandas as pd
    import ray.data as rd
    from bigdime_ray.spi import ValidationContext
    from bigdime_ray.validators.uniqueness import UniquenessValidator

    n_hot = 400
    df = pd.DataFrame({
        "doc_id": ["hot-id"] * n_hot + [f"u-{i:06d}" for i in range(200)],
        "partition_id": (["p0000"] * (n_hot // 2) + ["p0001"] * (n_hot // 2)
                         + ["p0000"] * 100 + ["p0001"] * 100)})
    ds = rd.from_pandas(df).repartition(8)
    ctx = ValidationContext(partitions=["p0000", "p0001"],
                            thresholds={"max_collected_violations": 50})
    v = UniquenessValidator()
    states = {}
    for i, ref in enumerate(ds.to_arrow_refs()):
        import ray as _ray
        tbl = _ray.get(ref)
        states[f"b{i}"] = v.scan_partition(tbl, "px", ctx).state
    viol_tbl, responses = v.run_global(ds, ctx, states=states)
    # bounded sample ...
    assert viol_tbl.num_rows <= 50
    # ... exact counts in the verdicts
    by_part = {r.partition_id: r for r in responses}
    assert by_part["p0000"].metrics["dup_member_rows"] == n_hot // 2
    assert by_part["p0001"].metrics["dup_member_rows"] == n_hot // 2
    assert by_part["p0000"].metrics["dup_ids_global"] == 1
    assert by_part["p0000"].metrics["members_truncated"] is True
    assert by_part["p0000"].result.name == "FAILED"
