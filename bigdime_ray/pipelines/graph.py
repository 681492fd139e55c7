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

# HITS uses a smaller fixed-point scale because its contributions are
# UNDIVIDED ranks (no outdeg division): a block partial for one node is
# ≤ indegree × HITS_SCALE, and the global Σ of authority partials is
# ≤ HITS_SCALE × max_outdeg — at 1e9 that stays int64-safe for any
# out-degree < 9.2e9 (every host graph; documented overflow bound).
HITS_SCALE = 10 ** 9


def _exact_sum(x: np.ndarray) -> int:
    """Exact Python-int sum of a NON-NEGATIVE int64 array: hi/lo 32-bit
    split so each numpy partial stays < 2^63 (np.sum would wrap)."""
    lo = int((x & 0xFFFFFFFF).sum())
    hi = int((x >> 32).sum())
    return (hi << 32) + lo


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
             num_buckets: int | None = None,
             seed_nodes: list[str] | None = None) -> pa.Table:
    """Integer-exact PageRank (module docstring). Returns a pa.Table
    (node:string, rank_fp:int64 fixed-point 1e-12 units, rank:float64)
    sorted by node. Deterministic and block-count-invariant.

    ``seed_nodes`` switches to PERSONALIZED PageRank (the crawl
    seed-expansion / trust-propagation variant): initial mass and the
    teleport term concentrate on the seed set instead of all nodes —
    r₀[v] = (S // |seeds|)·[v∈seeds],  and per iteration

        r'[v] = (3S // (20·|seeds|))·[v∈seeds]
                + (17·(contrib[v] + (dang // |seeds|)·[v∈seeds])) // 20

    (dangling mass returns to the seeds, like the teleport). Seeds
    absent from the graph are ignored; ``seed_nodes=None`` is the
    uniform case above (identical arithmetic when seeds = all
    nodes). Still pure integers, same oracle discipline."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    labels, deg = _collect_nodes(edges, src_col, dst_col)
    n = len(labels)
    if n == 0:
        return pa.table({"node": pa.array([], type=pa.string()),
                         "rank_fp": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.float64())})
    if seed_nodes is not None:
        seed = np.isin(labels, np.asarray(seed_nodes))
        ns = int(seed.sum())
        if ns == 0:
            raise ValueError("no seed_nodes present in the graph")
    else:
        seed, ns = np.ones(n, dtype=bool), n

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
    seed64 = seed.astype(np.int64)
    r = (RANK_SCALE // ns) * seed64
    base = ((3 * RANK_SCALE) // (20 * ns)) * seed64
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
        r = base + (17 * (contrib + (dang // ns) * seed64)) // 20

    return pa.table({
        "node": pa.array(labels.astype(str)),
        "rank_fp": pa.array(r, type=pa.int64()),
        "rank": pa.array(r / RANK_SCALE, type=pa.float64()),
    })


def degree_stats(edges: Dataset, src_col: str = "src",
                 dst_col: str = "dst",
                 num_buckets: int | None = None) -> pa.Table:
    """Per-node in/out degrees over an edge Dataset — the first-look
    statistic of any link graph (frontier sizing, hub/sink detection,
    sanity bounds for the iterative algorithms above). Labels resolve
    through the same broadcast-bound node table as pagerank/hits:
    :func:`_collect_nodes` already returns out-degrees, and in-degrees
    cost ONE packed (node-idx, count) exchange. Returns
    (node, out_deg, in_deg) sorted by node."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    labels, out_deg = _collect_nodes(edges, src_col, dst_col)
    n = len(labels)
    if n == 0:
        e = pa.array([], type=pa.int64())
        return pa.table({"node": pa.array([], type=pa.string()),
                         "out_deg": e, "in_deg": e})

    def extract(batch: pa.Table):
        dst = batch[dst_col].to_numpy(zero_copy_only=False)
        di = np.searchsorted(labels, dst)
        return di, [np.ones(len(di), dtype=np.int64)]

    keys, (sums,) = grouped_int_sums_exchange(
        edges, extract, num_values=1, num_buckets=num_buckets)
    in_deg = np.zeros(n, dtype=np.int64)
    in_deg[keys] = sums
    return pa.table({
        "node": pa.array(labels.astype(str)),
        "out_deg": pa.array(out_deg, type=pa.int64()),
        "in_deg": pa.array(in_deg, type=pa.int64()),
    })


def hits(edges: Dataset, src_col: str = "src", dst_col: str = "dst",
         iterations: int = 20,
         num_buckets: int | None = None) -> pa.Table:
    """Integer-exact HITS hubs/authorities (Kleinberg) — the companion
    crawl-ranking signal to :func:`pagerank` (hubs = link directories,
    authorities = link targets; PageRank conflates the two).

    Same exactness discipline: fixed-point ``HITS_SCALE`` vectors and a
    DETERMINISTIC integer normalization — instead of the float L1/L2
    norm, each half-step divides by ``max(1, total // HITS_SCALE)`` so
    the vector's exact sum is rescaled to ≈ HITS_SCALE in pure int64
    (relative quantization 1e-9/element). Every operation is an
    order-independent integer sum or a pointwise floor division, so the
    result is bit-identical at any block count AND replayable by a
    DuckDB oracle (``host_hits`` unrolls the iterations as CTEs).

    Update rule (S = HITS_SCALE, N = |V|, h_0 = S // N):

        a_raw[v]  = Σ_{u→v} h[u];   a = a_raw // max(1, Σa_raw // S)
        h_raw[u]  = Σ_{u→v} a[v];   h = h_raw // max(1, Σh_raw // S)

    Scale shape identical to pagerank: node table broadcast-bound,
    edges indexed once, each iteration = TWO packed
    ``grouped_int_sums_exchange`` passes over the same narrow (si, di)
    dataset (keyed by dst for authorities, by src for hubs); only
    (node-idx, partial-sum) cells move. Driver totals use
    :func:`_exact_sum` (hi/lo split), never a wrapping np.sum.
    """
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    labels, _deg = _collect_nodes(edges, src_col, dst_col)
    n = len(labels)
    empty = pa.table({"node": pa.array([], type=pa.string()),
                      "hub_fp": pa.array([], type=pa.int64()),
                      "auth_fp": pa.array([], type=pa.int64()),
                      "hub": pa.array([], type=pa.float64()),
                      "auth": pa.array([], type=pa.float64())})
    if n == 0:
        return empty

    def index(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False)
        dst = batch[dst_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "si": pa.array(np.searchsorted(labels, src), type=pa.int64()),
            "di": pa.array(np.searchsorted(labels, dst), type=pa.int64()),
        })

    idx = edges.map_batches(index, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def _half_step(vec: np.ndarray, key_col: str, gather_col: str
                   ) -> np.ndarray:
        """One propagate+normalize: out[k] = (Σ_{edges with key k}
        vec[gather]) // max(1, total // S)."""
        vec_ref = ray.put(vec)

        def extract(batch: pa.Table, _v=vec_ref):
            vv = ray.get(_v)
            keys = batch[key_col].to_numpy(zero_copy_only=False)
            src = batch[gather_col].to_numpy(zero_copy_only=False)
            return keys, [vv[src]]

        keys, (sums,) = grouped_int_sums_exchange(
            idx, extract, num_values=1, num_buckets=num_buckets)
        raw = np.zeros(n, dtype=np.int64)
        raw[keys] = sums
        d = max(1, _exact_sum(raw) // HITS_SCALE)
        return raw // d

    h = np.full(n, HITS_SCALE // n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iterations):
        a = _half_step(h, "di", "si")   # authorities ← hub mass
        h = _half_step(a, "si", "di")   # hubs ← authority mass

    return pa.table({
        "node": pa.array(labels.astype(str)),
        "hub_fp": pa.array(h, type=pa.int64()),
        "auth_fp": pa.array(a, type=pa.int64()),
        "hub": pa.array(h / HITS_SCALE, type=pa.float64()),
        "auth": pa.array(a / HITS_SCALE, type=pa.float64()),
    })
