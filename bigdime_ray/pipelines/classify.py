"""Distributed linear text classifier — fastText-style hashed char
n-gram bag features + logistic regression trained by full-batch
gradient descent over a Ray Dataset.

Scale design (SURVEY §4 discipline):

- Features are extracted ONCE into a narrow materialized dataset
  (``buckets`` list<int32> per doc + int8 label) so the text column is
  not re-tokenized on every GD pass; extraction rides the existing
  one-pass ``rolling_hashes`` kernel (pipelines/text.py) — no per-row
  Python.
- Each GD iteration is one ``map_batches`` pass emitting a single
  fixed-point int64 gradient partial per block (dim+2 values) with the
  current weight vector broadcast via ``ray.put`` (read zero-copy in
  every task, never re-shipped per batch).
- Fixed-point rounding happens PER OCCURRENCE (each token's
  ``residual/len`` contribution is quantized before summation), so the
  summed gradient — and therefore the trained weights — are EXACTLY
  partition-invariant: any block count yields bit-identical weights.
  Integer sums are order-independent (CLAUDE.md / BASELINE.md house
  rule for float reductions).
- Training input is expected to be a BOUNDED sample (weights are
  dim+1 float64 on the driver; gradient partials are nblocks×(dim+2)
  int64 — cap the training sample, then STREAM inference over the full
  corpus with the final weights broadcast once).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

__all__ = [
    "hashed_ngram_buckets", "extract_features", "train_logreg",
    "score_logreg", "train_logreg_table",
]

_DEFAULT_DIM = 1 << 18


def hashed_ngram_buckets(text: pa.Array | pa.ChunkedArray,
                         dim: int = _DEFAULT_DIM, k: int = 4
                         ) -> tuple[np.ndarray, np.ndarray]:
    """(flat int32 bucket ids, int64 row offsets) of every char
    ``k``-gram of every row, hashed into ``dim`` buckets — the
    fastText hashing trick over the one-pass rolling-hash kernel.
    Every row contributes >= 1 bucket (short/empty rows hash whole-row).
    """
    from bigdime_ray.pipelines.text import rolling_hashes
    h, off = rolling_hashes(text, k=k)
    return (h % np.uint64(dim)).astype(np.int32), off


def extract_features(ds: Dataset, text_col: str = "text",
                     label_col: str = "label",
                     dim: int = _DEFAULT_DIM, k: int = 4) -> Dataset:
    """Materialized narrow features dataset: ``buckets`` list<int32> +
    ``label`` int8. Run once; GD iterations re-read THIS, not the text.
    """
    def feats(batch: pa.Table) -> pa.Table:
        vals, off = hashed_ngram_buckets(batch[text_col], dim, k)
        lst = pa.ListArray.from_arrays(pa.array(off, type=pa.int32()),
                                       pa.array(vals, type=pa.int32()))
        lab = pa.compute.cast(batch[label_col], pa.int8())
        return pa.table({"buckets": lst, "label": lab})

    return ds.map_batches(feats, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()


def _list_buffers(col: pa.ChunkedArray | pa.Array
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(int64 offsets, int32 flat values) view of a list<int32> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.asarray(col.offsets, dtype=np.int64)
    vals = np.asarray(col.values, dtype=np.int32)
    return off, vals[off[0]:off[-1]]


def _margins(off: np.ndarray, vals: np.ndarray, w: np.ndarray
             ) -> tuple[np.ndarray, np.ndarray]:
    """Per-row mean feature weight + bias. Offsets are strictly
    increasing (every row has >= 1 bucket by construction), so
    ``reduceat`` over non-empty segments is safe."""
    base = off - off[0]
    counts = (base[1:] - base[:-1]).astype(np.float64)
    sums = np.add.reduceat(w[vals], base[:-1]) if len(vals) else \
        np.zeros(0, dtype=np.float64)
    return sums / counts + w[-1], counts


def _grad_partial(off: np.ndarray, vals: np.ndarray, labels: np.ndarray,
                  w: np.ndarray, dim: int, scale: float) -> np.ndarray:
    """Fixed-point int64 gradient partial [g_0..g_dim-1, g_bias, n_rows]
    for one block. Per-occurrence quantization -> partition-invariant."""
    m, counts = _margins(off, vals, w)
    p = 1.0 / (1.0 + np.exp(-m))
    res = p - labels.astype(np.float64)
    g = np.zeros(dim + 2, dtype=np.int64)
    per_occ = np.rint(np.repeat(res / counts, counts.astype(np.int64))
                      * scale).astype(np.int64)
    # bincount with int64 weights: float64 accumulation is exact for
    # integer sums < 2^53 (a block's per-bucket total is far below),
    # and ~10x faster than np.add.at
    g[:dim] = np.bincount(vals, weights=per_occ,
                          minlength=dim)[:dim].astype(np.int64)
    g[dim] = np.rint(res * scale).astype(np.int64).sum()
    g[dim + 1] = len(labels)
    return g


def train_logreg(feats: Dataset, dim: int = _DEFAULT_DIM,
                 iters: int = 20, lr: float = 2.0, l2: float = 1e-6,
                 momentum: float = 0.9,
                 scale: float = float(1 << 24)) -> np.ndarray:
    """Full-batch logistic regression (heavy-ball momentum) over a
    features dataset from ``extract_features``. Returns ``w`` (dim
    weights + bias at w[-1]). Deterministic and block-count-invariant
    (see module docstring) — momentum uses only the exact summed
    gradient, so invariance is preserved."""
    w = np.zeros(dim + 1, dtype=np.float64)
    v = np.zeros(dim + 1, dtype=np.float64)
    n_total = None
    for _ in range(iters):
        ref = ray.put(w)

        def part(batch: pa.Table, w_ref=ref) -> pa.Table:
            off, vals = _list_buffers(batch["buckets"])
            labels = batch["label"].to_numpy(zero_copy_only=False)
            g = _grad_partial(off, vals, labels, ray.get(w_ref),
                              dim, scale)
            return pa.table({"g": pa.array([g.tobytes()],
                                           type=pa.binary())})

        acc = np.zeros(dim + 2, dtype=np.int64)
        for b in feats.map_batches(part, batch_format="pyarrow",
                                   zero_copy_batch=True).iter_batches(
                                       batch_format="pyarrow"):
            for buf in b["g"]:
                acc += np.frombuffer(buf.as_py(), dtype=np.int64)
        n_total = int(acc[dim + 1])
        if n_total == 0:
            break
        grad = acc[:dim + 1].astype(np.float64) / (scale * n_total)
        grad[:dim] += l2 * w[:dim]
        v = momentum * v - lr * grad
        w = w + v
    return w


def train_logreg_table(table: pa.Table, text_col: str = "text",
                       label_col: str = "label",
                       dim: int = _DEFAULT_DIM, k: int = 4,
                       iters: int = 20, lr: float = 2.0,
                       l2: float = 1e-6, momentum: float = 0.9,
                       scale: float = float(1 << 24)) -> np.ndarray:
    """Single-process reference trainer over one Arrow table — SAME
    numpy core, no Ray. Exists so tests can assert the distributed
    trainer is bit-identical at any block count."""
    vals, off = hashed_ngram_buckets(table[text_col], dim, k)
    labels = np.asarray(table[label_col].to_numpy(zero_copy_only=False),
                        dtype=np.int8)
    w = np.zeros(dim + 1, dtype=np.float64)
    v = np.zeros(dim + 1, dtype=np.float64)
    for _ in range(iters):
        g = _grad_partial(off, vals, labels, w, dim, scale)
        n = int(g[dim + 1])
        grad = g[:dim + 1].astype(np.float64) / (scale * n)
        grad[:dim] += l2 * w[:dim]
        v = momentum * v - lr * grad
        w = w + v
    return w


def score_logreg(ds: Dataset, w: np.ndarray, text_col: str = "text",
                 dim: int = _DEFAULT_DIM, k: int = 4,
                 out_col: str = "prob") -> Dataset:
    """Streaming inference: adds ``out_col`` (P(label=1)) to every row.
    The weight vector is broadcast ONCE via ``ray.put``."""
    ref = ray.put(np.ascontiguousarray(w, dtype=np.float64))

    def score(batch: pa.Table, w_ref=ref) -> pa.Table:
        wv = ray.get(w_ref)
        vals, off = hashed_ngram_buckets(batch[text_col], dim, k)
        m, _ = _margins(off, vals, wv)
        p = 1.0 / (1.0 + np.exp(-m))
        return batch.append_column(out_col, pa.array(p))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
