"""Fused single-pass token-payload kernel (SURVEY.md §7.2 #1).

The scan phase is memory-bandwidth-bound: at ~500 B/row of token
payload, every full-array pass is wall-clock. Before this kernel the
payload was traversed separately by the checksum hash (~4 temporary
full-size uint64 arrays), the token-range check (2 comparisons) and the
histogram (one bincount) — ~40 B of memory traffic per 4 B token.

``fused_token_scan`` computes all three in ONE chunked pass: each
row-aligned chunk (default 256 Ki elements ≈ 2 MB of int64 temporaries,
sized to stay L2/L3-resident per worker) is widened, range-checked,
bincounted and polynomial-hashed while it is hot in cache, so the
payload crosses the memory bus once. Results are bit-identical to the
separate kernels (hypothesis-pinned in tests/test_hashing.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bigdime_ray.functions.hashing import _GOLDEN, _arange, _powers

_NULL_SENTINEL = -(2 ** 31) - 7  # matches hash_int_list_column


def fused_token_scan(flat: pa.Array, offsets: np.ndarray,
                     lengths: np.ndarray, vocab: int,
                     chunk_elems: int = 1 << 18):
    """One pass over the flattened token values of a list<int> column.

    Inputs: ``flat`` = ``pc.list_flatten(tokens)`` (values of valid rows,
    inner nulls kept), ``offsets``/``lengths`` the per-row prefix sums
    (empty/null rows have length 0). Returns a dict:

    - ``row_sums``   u64[n_rows] — pre-finalize polynomial hash sums,
      identical to the internal sums of ``hash_int_list_column``
    - ``hist``       int64[vocab] — dense histogram of IN-RANGE values
    - ``bad_pos``    int64[k] — flat positions of out-of-range elements
      (inner nulls included; their sentinel is out of range by design)
    - ``null_pos``   int64[m] — flat positions of inner-null elements
    - ``vals``       the int64/int32 numpy view used (for detail lookups)
    """
    n_rows = len(lengths)
    if flat.null_count:
        null_pos = np.nonzero(
            pc.is_null(flat).to_numpy(zero_copy_only=False))[0]
        vals = (pc.fill_null(pc.cast(flat, pa.int64()), _NULL_SENTINEL)
                .to_numpy(zero_copy_only=False))
    else:
        null_pos = np.empty(0, dtype=np.int64)
        vals = flat.to_numpy(zero_copy_only=False)
    total = len(vals)
    sums = np.zeros(n_rows, dtype=np.uint64)
    hist = np.zeros(vocab, dtype=np.int64)
    bad_chunks: list[np.ndarray] = []
    r0 = 0
    while r0 < n_rows:
        # advance to a ROW-ALIGNED chunk end (a single huge row extends
        # its chunk rather than splitting the reduceat segment)
        r1 = int(np.searchsorted(offsets, offsets[r0] + chunk_elems,
                                 side="left"))
        r1 = min(max(r1, r0 + 1), n_rows)
        i0, i1 = int(offsets[r0]), int(offsets[r1])
        v = vals[i0:i1]
        if len(v):
            # range + histogram while the chunk is cache-hot
            bad = (v < 0) | (v >= vocab)
            if bad.any():
                bp = np.nonzero(bad)[0]
                bad_chunks.append(bp + i0)
                hist += np.bincount(v[~bad], minlength=vocab)
            else:
                hist += np.bincount(v, minlength=vocab)
            # polynomial hash (same arithmetic as hash_int_list_column)
            ll = lengths[r0:r1]
            with np.errstate(over="ignore"):
                u = v.astype(np.uint64)
                u += _GOLDEN
                pos = np.repeat(offsets[r0:r1] - i0, ll)
                np.subtract(_arange(len(v)), pos, out=pos)
                u *= _powers(int(ll.max()))[pos]
                nz = ll > 0
                seg = np.add.reduceat(u, (offsets[r0:r1][nz] - i0))
            rows_nz = np.nonzero(nz)[0] + r0
            sums[rows_nz] = seg
        r0 = r1
    bad_pos = (np.concatenate(bad_chunks) if bad_chunks
               else np.empty(0, dtype=np.int64))
    return {"row_sums": sums, "hist": hist, "bad_pos": bad_pos,
            "null_pos": null_pos, "vals": vals, "total": total}
