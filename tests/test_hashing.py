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
