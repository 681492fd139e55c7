"""Vectorized 64-bit hashing kernels for Arrow columns.

Reimplements the *capability* of the reference's raw-vs-loaded checksum
validation (BigDime ``RawChecksumValidator`` — see SURVEY.md §2A V2;
``BASELINE.json:6`` "raw-vs-loaded checksum validation") as content hashes
computable vectorized over zero-copy Arrow batches:

- per-row content hash = mix(hash(doc_id), polynomial_hash(tokens))
- per-partition checksum = wrap-around uint64 SUM of row hashes
  (order-insensitive, content-sensitive, mergeable across blocks)

xxhash is not available in this environment; strings use pandas'
vectorized SipHash (``pd.util.hash_array``, C implementation, fixed key →
deterministic across processes), integer lists use a numpy polynomial
hash with a splitmix64-style finalizer. All arithmetic is uint64 with
silent wrap-around (numpy array semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# odd multiplicative constants (splitmix64 / xxhash-style)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_POLY_A = np.uint64(0x100000001B3)  # FNV prime, used as the polynomial base
_NULL_ROW = np.uint64(0x9AE16A3B2F90404F)

_S33 = np.uint64(33)
_S29 = np.uint64(29)
_S32 = np.uint64(32)

with np.errstate(over="ignore"):
    _POW_CACHE = np.empty(8192, dtype=np.uint64)
    _POW_CACHE[0] = np.uint64(1)
    np.cumprod(np.full(8191, _POLY_A, dtype=np.uint64), out=_POW_CACHE[1:])


_ARANGE_CACHE = np.empty(0, dtype=np.int64)


def _arange(n: int) -> np.ndarray:
    """Cached 0..n-1 view (the per-batch arange alloc showed up in
    profiles; per-process buffer grows on demand, slices are views)."""
    global _ARANGE_CACHE
    if n > len(_ARANGE_CACHE):
        _ARANGE_CACHE = np.arange(max(n, 2 * len(_ARANGE_CACHE)),
                                  dtype=np.int64)
    return _ARANGE_CACHE[:n]


def _powers(n: int) -> np.ndarray:
    """A^0..A^(n-1) mod 2^64."""
    global _POW_CACHE
    if n > len(_POW_CACHE):
        with np.errstate(over="ignore"):
            ext = np.empty(n, dtype=np.uint64)
            ext[0] = np.uint64(1)
            np.cumprod(np.full(n - 1, _POLY_A, dtype=np.uint64), out=ext[1:])
        _POW_CACHE = ext
    return _POW_CACHE[:n]


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized; uint64 in → uint64 out."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = x ^ (x >> _S33)
        x = x * _M1
        x = x ^ (x >> _S29)
        x = x * _M2
        x = x ^ (x >> _S32)
    return x


def hash_string_column(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic per-row uint64 hash of a string column (vectorized SipHash)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "\x00<null>")
    obj = col.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(obj, categorize=False).astype(np.uint64, copy=False)


def hash_int_list_column(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Order-sensitive polynomial hash of each ``list<int>`` row.

    row_hash = mix64( Σ_j (v_j + GOLDEN) * A^j  +  GOLDEN * len )   (mod 2^64)

    Null rows hash to a fixed constant; nulls inside a list hash as a
    sentinel value distinct from any int32. Handles slices/chunks/empty
    lists. Output dtype uint64, length = len(col).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    null_rows = pc.is_null(col).to_numpy(zero_copy_only=False)
    lengths = (
        pc.fill_null(pc.list_value_length(col), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64, copy=False)
    )
    flat = pc.list_flatten(col)  # values of valid rows only, inner nulls kept
    if flat.null_count:
        # sentinel outside int32 range → widen only when inner nulls exist
        flat = pc.fill_null(pc.cast(flat, pa.int64()), -(2**31) - 7)
    flat_np = flat.to_numpy(zero_copy_only=False)

    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])

    sums = np.zeros(n, dtype=np.uint64)
    if total > 0:
        # single widening cast; negatives (the null sentinel) wrap mod 2^64
        # deterministically. In-place arithmetic: the pass is bandwidth-bound.
        with np.errstate(over="ignore"):
            vals = flat_np.astype(np.uint64)
            vals += _GOLDEN
            pos = np.repeat(offsets[:-1], lengths)
            np.subtract(_arange(total), pos, out=pos)
            vals *= _powers(int(lengths.max()))[pos]
            # reduceat over NON-EMPTY rows only: clipping an empty row's
            # start to total-1 would truncate the preceding segment
            # (found by hypothesis: [None, [1,None,3]] reversed)
            nz = lengths > 0
            seg = np.add.reduceat(vals, offsets[:-1][nz])
        sums[nz] = seg
    with np.errstate(over="ignore"):
        out = mix64(sums + _GOLDEN * lengths.astype(np.uint64))
    out[null_rows] = _NULL_ROW
    return out


def row_content_hash(doc_id: pa.Array | pa.ChunkedArray,
                     tokens: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row content hash over (doc_id, tokens) — the checksum unit."""
    h_id = hash_string_column(doc_id)
    h_tok = hash_int_list_column(tokens)
    with np.errstate(over="ignore"):
        return mix64(h_id ^ (h_tok * _GOLDEN))


def fold_checksum(row_hashes: np.ndarray) -> int:
    """Order-insensitive fold (wrap-around uint64 sum) → python int."""
    with np.errstate(over="ignore"):
        return int(row_hashes.astype(np.uint64, copy=False).sum(dtype=np.uint64))


def merge_checksums(a: int, b: int) -> int:
    return (a + b) & 0xFFFFFFFFFFFFFFFF


def column_hashes(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """uint64 per-row hash of an Arrow key column of any type —
    integers via mix64, everything else via the string SipHash. The
    shared kernel behind hash-bucketing (stages.shuffle.add_hash_bucket),
    as-of join tagging and pack-id fingerprints."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return mix64(col.to_numpy(zero_copy_only=False)
                     .astype(np.int64).view(np.uint64))
    return hash_string_column(col)


def u64_to_i64(x: int | np.ndarray):
    """Reinterpret uint64 bits as int64 (for Arrow/parquet storage)."""
    if isinstance(x, np.ndarray):
        return x.view(np.int64)
    return int(np.array([x], dtype=np.uint64).view(np.int64)[0])


def i64_to_u64(x: int | np.ndarray):
    if isinstance(x, np.ndarray):
        return x.view(np.uint64)
    return int(np.array([x], dtype=np.int64).view(np.uint64)[0])
