"""Distributed BPE tokenizer training — the tokenizer-building half of
an LLM data pipeline (the validation engine consumes pre-tokenized
sequences; this is where those tokens come from).

Byte-level BPE (GPT-2 style): initial vocabulary = 256 byte symbols;
each round counts ADJACENT SYMBOL PAIRS over the whole corpus, merges
the most frequent pair into a new symbol, and rewrites the corpus.
The shape mirrors the repo's other iterative operators (k-means, label
propagation): per round, blocks emit bounded pair-count partials (≤
distinct-pairs-per-block rows, never corpus rows), the driver folds
them and broadcasts one (a, b, new_id) decision, and a pure map
rewrites the sequences — materialized per round for the next
iteration. Greedy left-to-right application (overlapping candidates in
an equal-symbol run take even offsets) matches the reference BPE
semantics exactly; determinism: ties break toward the smallest packed
(a, b) key. Real trainers run on a corpus SAMPLE — merge quality
converges long before the full corpus is counted; pass the sample in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

PAIR_SHIFT = np.int64(32)


def encode_bytes(ds: Dataset, text_col: str = "text",
                 out_col: str = "symbols") -> Dataset:
    """UTF-8 bytes of every row as the initial list<int32> symbol
    sequence (zero-copy flat-buffer slice per block)."""
    def enc(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        if pa.types.is_large_string(t.type):
            t = pc.cast(t, pa.string())  # int32-offset buffer below
        t = pc.fill_null(t, "")
        bufs = t.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int32)[
            t.offset:t.offset + len(t) + 1].astype(np.int64)
        data = (np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None else np.empty(0, np.uint8))
        flat = data[off[0]:off[-1]].astype(np.int32)
        arr = pa.ListArray.from_arrays(
            pa.array(off - off[0], type=pa.int32()), pa.array(flat))
        return batch.append_column(out_col, arr)

    return ds.map_batches(enc, batch_format="pyarrow",
                          zero_copy_batch=True)


def _flat_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
        .astype(np.int32)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    return flat, off


def _pair_keys(flat: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Packed (s1 << 32 | s2) keys of all within-row adjacent pairs."""
    if len(flat) < 2:
        return np.empty(0, dtype=np.int64)
    valid = np.ones(len(flat) - 1, dtype=bool)
    ends = off[1:-1] - 1
    valid[ends[(ends >= 0) & (ends < len(valid))]] = False
    s1 = flat[:-1][valid].astype(np.int64)
    s2 = flat[1:][valid].astype(np.int64)
    return (s1 << PAIR_SHIFT) | s2


def apply_merge(flat: np.ndarray, off: np.ndarray, a: int, b: int,
                new_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right merge of every within-row (a, b) adjacency
    — overlapping candidates (a == b runs) take even offsets within
    the run, exactly the sequential-scan semantics, fully vectorized."""
    n = len(flat)
    if n < 2:
        return flat, off
    cand = (flat[:-1] == a) & (flat[1:] == b)
    ends = off[1:-1] - 1
    cand[ends[(ends >= 0) & (ends < len(cand))]] = False
    if not cand.any():
        return flat, off
    # resolve overlaps: in each run of consecutive candidates keep
    # every other one starting at the run head (only a==b makes runs)
    starts = cand & ~np.r_[False, cand[:-1]]
    run_id = np.cumsum(starts)
    idx = np.arange(len(cand))
    run_start_idx = np.zeros(len(cand), dtype=np.int64)
    run_start_idx[starts] = idx[starts]
    run_start_idx = np.maximum.accumulate(
        np.where(cand, run_start_idx, -1))
    keep = cand & (((idx - run_start_idx) % 2) == 0)
    kpos = np.nonzero(keep)[0]
    out = flat.copy()
    out[kpos] = new_id
    drop = np.zeros(n, dtype=bool)
    drop[kpos + 1] = True
    new_flat = out[~drop]
    row = np.searchsorted(off, kpos, side="right") - 1
    merged_per_row = np.bincount(row, minlength=len(off) - 1)
    new_off = off - np.r_[0, np.cumsum(merged_per_row)]
    return new_flat, new_off


def bpe_train(ds: Dataset, text_col: str = "text",
              num_merges: int = 50, min_count: int = 2
              ) -> list[tuple[int, int, int]]:
    """Train ``num_merges`` byte-level BPE merges over the corpus.
    Returns [(a, b, new_id)] in merge order (new ids start at 256).
    Per round: one pair-count pass (block partials of ≤ distinct
    pairs, driver fold, deterministic argmax — count desc, packed key
    asc) and one rewrite pass, materialized (iterative-operator
    shape). Stops early when no pair reaches ``min_count``."""
    corpus = encode_bytes(ds, text_col=text_col).select_columns(
        ["symbols"]).materialize()
    merges: list[tuple[int, int, int]] = []
    next_id = 256

    def count_pairs(batch: pa.Table) -> pa.Table:
        flat, off = _flat_offsets(batch["symbols"])
        keys = _pair_keys(flat, off)
        uniq, cnt = np.unique(keys, return_counts=True)
        return pa.table({"k": pa.array(uniq),
                         "c": pa.array(cnt.astype(np.int64))})

    for _ in range(num_merges):
        parts = corpus.map_batches(count_pairs, batch_format="pyarrow",
                                   zero_copy_batch=True).to_pandas()
        if len(parts) == 0 or "k" not in parts.columns:
            break
        agg = parts.groupby("k")["c"].sum()
        if len(agg) == 0 or agg.max() < min_count:
            break
        best_count = agg.max()
        best = int(min(agg.index[agg.values == best_count]))
        a, b = best >> 32, best & 0xFFFFFFFF
        merges.append((int(a), int(b), next_id))
        aa, bb, nid = int(a), int(b), next_id

        def rewrite(batch: pa.Table, _a=aa, _b=bb, _n=nid) -> pa.Table:
            flat, off = _flat_offsets(batch["symbols"])
            nf, no = apply_merge(flat, off, _a, _b, _n)
            return pa.table({"symbols": pa.ListArray.from_arrays(
                pa.array(no, type=pa.int32()), pa.array(nf))})

        corpus = corpus.map_batches(rewrite, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
        next_id += 1
    return merges


def bpe_encode_texts(texts: list[str],
                     merges: list[tuple[int, int, int]]
                     ) -> list[list[int]]:
    """Apply a trained merge list to new texts (driver-side helper —
    the distributed form is :func:`bpe_encode`)."""
    out = []
    for t in texts:
        flat = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int32)
        off = np.asarray([0, len(flat)], dtype=np.int64)
        for a, b, nid in merges:
            flat, off = apply_merge(flat, off, a, b, nid)
        out.append(flat.tolist())
    return out


def bpe_encode(ds: Dataset, merges: list[tuple[int, int, int]],
               text_col: str = "text",
               out_col: str = "tokens") -> Dataset:
    """Distributed tokenization with a TRAINED merge list: one
    streaming map — the merge table is broadcast once via ``ray.put``
    and every batch replays the merges in training order over its flat
    symbol buffer (the same vectorized ``apply_merge`` kernel the
    trainer uses, so encode ≡ train rewrite by construction). Zero
    shuffle; output is a list<int32> token column alongside the input
    columns."""
    import ray
    ref = ray.put(list(merges))

    def enc(batch: pa.Table, m_ref=ref) -> pa.Table:
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        if pa.types.is_large_string(t.type):
            t = pc.cast(t, pa.string())
        t = pc.fill_null(t, "")
        bufs = t.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int32)[
            t.offset:t.offset + len(t) + 1].astype(np.int64)
        data = (np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None else np.empty(0, np.uint8))
        flat = data[off[0]:off[-1]].astype(np.int32)
        off = off - off[0]
        for a, b, nid in ray.get(m_ref):
            flat, off = apply_merge(flat, off, a, b, nid)
        arr = pa.ListArray.from_arrays(
            pa.array(off, type=pa.int32()), pa.array(flat))
        return batch.append_column(out_col, arr)

    return ds.map_batches(enc, batch_format="pyarrow",
                          zero_copy_batch=True)
