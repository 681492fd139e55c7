"""Link-graph analytics for crawl curation — integer-exact PageRank.

Crawl pipelines rank hosts by link authority to prioritize fetch and
curation budgets. This module implements PageRank over an edge Dataset
with the repo's exactness discipline: the whole iteration is defined in
INTEGER arithmetic (ranks are fixed-point units of 1e-12, per-edge
contributions use integer floor division), so

- sums are order-independent → the result is BIT-IDENTICAL at any
  block count (partition invariance, tested), and
- a DuckDB oracle can replay the identical recurrence relationally
  (``__ray_entry__.py::host_pagerank`` unrolls the iterations as
  chained CTEs) — an iterative graph algorithm with a hash-exact
  oracle, not an ε-tolerance check.

Update rule (all integer; S = 10^12 mass units, N = |V|, d = 17/20):

    r_0[v]     = S // N
    contrib[v] = Σ_{u→v} r[u] // outdeg[u]
    dang       = Σ_{outdeg[u]=0} r[u]
    r_{t+1}[v] = (3*S) // (20*N)  +  (17 * (contrib[v] + dang // N)) // 20

Scale shape: the NODE table (labels, out-degrees, rank vector) is
broadcast-bound — right for host-level graphs (|V| ~ 10⁶–10⁷ hosts per
crawl, a few hundred MB at most), documented as the partitioning
assumption; the EDGE set streams. Edges are indexed ONCE into a
materialized narrow (src_idx, dst_idx) dataset (same pattern as
pipelines/classify.py feature extraction); each iteration is then one
``grouped_int_sums_exchange`` over it — per block only (dst_idx,
partial-sum) cells move, never edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

RANK_SCALE = 10 ** 12


def _collect_nodes(edges: Dataset, src_col: str, dst_col: str
                   ) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique node labels, out-degree per node). One pass:
    each block emits its distinct (label, out_cnt) partials; the driver
    merge is a single np.unique over ≤ blocks × block-distinct rows
    (broadcast-bound by design — module docstring)."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False)
        dst = batch[dst_col].to_numpy(zero_copy_only=False)
        su, sc = np.unique(src, return_counts=True)
        du = np.unique(dst)
        return pa.table({
            "label": pa.array(np.concatenate([su, du])),
            "out": pa.array(np.concatenate(
                [sc, np.zeros(len(du), np.int64)]).astype(np.int64)),
        })

    rows = edges.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    if not rows:
        return np.array([], dtype=object), np.zeros(0, np.int64)
    labels = np.array([r["label"] for r in rows])
    outs = np.array([r["out"] for r in rows], dtype=np.int64)
    uniq, inv = np.unique(labels, return_inverse=True)
    deg = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(deg, inv, outs)
    return uniq, deg


def pagerank(edges: Dataset, src_col: str = "src", dst_col: str = "dst",
             iterations: int = 20,
             num_buckets: int | None = None) -> pa.Table:
    """Integer-exact PageRank (module docstring). Returns a pa.Table
    (node:string, rank_fp:int64 fixed-point 1e-12 units, rank:float64)
    sorted by node. Deterministic and block-count-invariant."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    labels, deg = _collect_nodes(edges, src_col, dst_col)
    n = len(labels)
    if n == 0:
        return pa.table({"node": pa.array([], type=pa.string()),
                         "rank_fp": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.float64())})

    # index edges once into a narrow materialized dataset
    def index(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False)
        dst = batch[dst_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "si": pa.array(np.searchsorted(labels, src), type=pa.int64()),
            "di": pa.array(np.searchsorted(labels, dst), type=pa.int64()),
        })

    idx = edges.map_batches(index, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    deg_ref = ray.put(deg)
    dangling = deg == 0
    r = np.full(n, RANK_SCALE // n, dtype=np.int64)
    base = (3 * RANK_SCALE) // (20 * n)
    for _ in range(iterations):
        r_ref = ray.put(r)

        def extract(batch: pa.Table, _r=r_ref, _d=deg_ref):
            rv, dv = ray.get(_r), ray.get(_d)
            si = batch["si"].to_numpy(zero_copy_only=False)
            di = batch["di"].to_numpy(zero_copy_only=False)
            return di, [rv[si] // dv[si]]

        keys, (sums,) = grouped_int_sums_exchange(
            idx, extract, num_values=1, num_buckets=num_buckets)
        contrib = np.zeros(n, dtype=np.int64)
        contrib[keys] = sums
        dang = int(r[dangling].sum())
        r = base + (17 * (contrib + dang // n)) // 20

    return pa.table({
        "node": pa.array(labels.astype(str)),
        "rank_fp": pa.array(r, type=pa.int64()),
        "rank": pa.array(r / RANK_SCALE, type=pa.float64()),
    })
