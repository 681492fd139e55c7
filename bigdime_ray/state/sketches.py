"""Mergeable partial-aggregate states (block-local → tree merge).

Every scan-pass validator produces one small state object per
(block, partition); states are associative+commutative under ``merge`` so
Ray Data can combine them in any order (property-tested). They serialize
with pickle into a binary Arrow column, keeping the shuffle narrow — only
states move, never the ``tokens`` payload (SURVEY.md §4 "shuffle narrow
columns only").

- ``CountState``        — record count (B-V1, BigDime RecordCountValidator semantics)
- ``ChecksumState``     — order-insensitive uint64 content-hash fold (B-V2,
                          RawChecksumValidator semantics)
- ``ColumnStatsState``  — min/max/null-count/count/sum/sumsq per column (B-S1)
- ``HistogramState``    — bounded-vocab token-id counts, sparse-encoded (B-S1, drift χ²)
- ``TDigestState``      — mergeable t-digest over n_tok (B-S1, drift KS).
                          Arrow's ``tdigest`` kernel is terminal (returns
                          quantiles, not a mergeable state) so this is a
                          hand-rolled Dunning-style merging digest in numpy.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Any

import numpy as np


class PartialState:
    """Base: mergeable, picklable block-local aggregate."""

    def merge(self, other: "PartialState") -> "PartialState":
        raise NotImplementedError

    def to_bytes(self) -> bytes:
        return pickle.dumps(self, protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def from_bytes(b: bytes) -> "PartialState":
        return pickle.loads(b)


def merge_states(states: list[PartialState]) -> PartialState:
    """Merge a list of states. Uses the class's ``merge_many`` when
    overridden (single-pass, avoids O(n²) incremental concat for
    array-backed states), else a sequential reduce."""
    states = list(states)
    if not states:
        raise ValueError("no states to merge")
    if len(states) == 1:
        # one state per key is the common case with one block per
        # partition file — a merge_many([s]) still re-sorts/uniques the
        # arrays (measured ~5 s of pure no-op work on a 64-partition run)
        return states[0]
    cls = type(states[0])
    mm = getattr(cls, "merge_many", None)
    if mm is not None:
        return mm(states)
    acc = states[0]
    for s in states[1:]:
        acc = acc.merge(s)
    return acc


@dataclass
class CountState(PartialState):
    n: int = 0

    def merge(self, other: "CountState") -> "CountState":
        return CountState(self.n + other.n)


@dataclass
class ChecksumState(PartialState):
    """Wrap-around uint64 sum of per-row content hashes + row count."""

    checksum: int = 0  # uint64 value held as python int
    n: int = 0

    def merge(self, other: "ChecksumState") -> "ChecksumState":
        return ChecksumState((self.checksum + other.checksum) & 0xFFFFFFFFFFFFFFFF,
                             self.n + other.n)


@dataclass
class ColumnStatsState(PartialState):
    """Numeric column stats; min/max also defined for strings (lexicographic)."""

    count: int = 0
    null_count: int = 0
    minimum: Any = None
    maximum: Any = None
    total: float = 0.0
    total_sq: float = 0.0

    @staticmethod
    def from_numpy(values: np.ndarray, null_count: int = 0,
                   numeric: bool = True) -> "ColumnStatsState":
        """values = non-null values of the block."""
        st = ColumnStatsState(count=len(values) + null_count, null_count=null_count)
        if len(values):
            st.minimum = values.min()
            st.maximum = values.max()
            if numeric:
                v = values.astype(np.float64, copy=False)
                st.total = float(v.sum())
                st.total_sq = float((v * v).sum())
        return st

    def merge(self, other: "ColumnStatsState") -> "ColumnStatsState":
        def _min(a, b):
            if a is None:
                return b
            if b is None:
                return a
            return min(a, b)

        def _max(a, b):
            if a is None:
                return b
            if b is None:
                return a
            return max(a, b)

        return ColumnStatsState(
            count=self.count + other.count,
            null_count=self.null_count + other.null_count,
            minimum=_min(self.minimum, other.minimum),
            maximum=_max(self.maximum, other.maximum),
            total=self.total + other.total,
            total_sq=self.total_sq + other.total_sq,
        )

    @property
    def valid_count(self) -> int:
        return self.count - self.null_count

    @property
    def null_rate(self) -> float:
        return self.null_count / self.count if self.count else 0.0

    @property
    def mean(self) -> float:
        return self.total / self.valid_count if self.valid_count else float("nan")

    @property
    def std(self) -> float:
        n = self.valid_count
        if n < 1:
            return float("nan")
        var = max(0.0, self.total_sq / n - self.mean ** 2)
        return float(np.sqrt(var))

    def to_dict(self) -> dict:
        def _py(x):
            return x.item() if isinstance(x, np.generic) else x

        return {
            "count": self.count,
            "null_count": self.null_count,
            "null_rate": self.null_rate,
            "min": _py(self.minimum),
            "max": _py(self.maximum),
            "mean": self.mean if self.valid_count else None,
            "std": self.std if self.valid_count else None,
        }


@dataclass
class HistogramState(PartialState):
    """Counts over integer ids in [0, size). Stored sparse (ids, counts).

    Out-of-range ids are NOT counted here (the token-range validator owns
    them); callers clip before calling ``add``.
    """

    size: int = 0
    ids: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.int64))
    counts: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.int64))

    @staticmethod
    def from_values(values: np.ndarray, size: int) -> "HistogramState":
        v = values[(values >= 0) & (values < size)]
        if len(v) == 0:
            return HistogramState(size=size)
        dense = np.bincount(v, minlength=0)
        ids = np.nonzero(dense)[0]
        cts = dense[ids]
        # compact per-block states: vocab and per-block counts fit int32
        # → half the bytes through the scan-union exchange (merge paths
        # upcast transparently)
        if size < 2**31 and (len(cts) == 0 or cts.max() < 2**31):
            return HistogramState(size=size, ids=ids.astype(np.int32),
                                  counts=cts.astype(np.int32))
        return HistogramState(size=size, ids=ids.astype(np.int64),
                              counts=cts.astype(np.int64))

    @staticmethod
    def from_dense(dense: np.ndarray, size: int) -> "HistogramState":
        """From a precomputed dense count array (the fused scan kernel's
        histogram) — same compaction as ``from_values``."""
        ids = np.nonzero(dense)[0]
        cts = dense[ids]
        if size < 2**31 and (len(cts) == 0 or cts.max() < 2**31):
            return HistogramState(size=size, ids=ids.astype(np.int32),
                                  counts=cts.astype(np.int32))
        return HistogramState(size=size, ids=ids.astype(np.int64),
                              counts=cts.astype(np.int64))

    def merge(self, other: "HistogramState") -> "HistogramState":
        size = max(self.size, other.size)
        if len(self.ids) == 0:
            return HistogramState(size, other.ids.copy(), other.counts.copy())
        if len(other.ids) == 0:
            return HistogramState(size, self.ids.copy(), self.counts.copy())
        ids = np.concatenate([self.ids, other.ids])
        cts = np.concatenate([self.counts, other.counts])
        uniq, inv = np.unique(ids, return_inverse=True)
        merged = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(merged, inv, cts)
        return HistogramState(size, uniq, merged)

    @staticmethod
    def merge_many(states: list) -> "HistogramState":
        """Dense accumulation: ids are unique within each state, so each
        state is one fancy-indexed += into a dense vocab-size buffer —
        O(Σ nnz) with no sort (the previous concat+unique cost ~2.5 s
        merging a 64-partition scan's per-batch states)."""
        size = max(s.size for s in states)
        dense = np.zeros(size, dtype=np.int64)
        for s in states:
            if len(s.ids):
                dense[s.ids] += s.counts
        ids = np.nonzero(dense)[0]
        if len(ids) == 0:
            return HistogramState(size=size)
        return HistogramState(size, ids, dense[ids])

    def dense(self) -> np.ndarray:
        out = np.zeros(self.size, dtype=np.int64)
        if len(self.ids):
            out[self.ids] = self.counts
        return out

    @property
    def total(self) -> int:
        return int(self.counts.sum()) if len(self.counts) else 0


@dataclass
class TDigestState(PartialState):
    """Merging t-digest (Dunning). Mergeable, numpy-backed.

    ``means``/``weights`` are the compressed centroids; ``compression``
    bounds the centroid count (~2*compression). Quantile error is
    O(q(1-q)/compression) — documented ε for the oracle checks.
    """

    compression: float = 200.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.float64))
    minimum: float = float("inf")
    maximum: float = float("-inf")

    @staticmethod
    def from_values(values: np.ndarray, compression: float = 200.0) -> "TDigestState":
        st = TDigestState(compression=compression)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            # pre-aggregate identical values (exact): n_tok-style integer
            # data has far fewer distincts than rows, and the compress
            # loop is O(#centroids) Python — this cuts it ~15×
            uniq, counts = np.unique(v, return_counts=True)
            st.means = uniq.astype(np.float64)
            st.weights = counts.astype(np.float64)
            st.minimum = float(uniq[0])
            st.maximum = float(uniq[-1])
            st._compress()
        return st

    def _compress(self) -> None:
        """Fully vectorized k1 compression: each output cluster is the
        run of sorted centroids whose cumulative k = (δ/2π)·asin(2q−1)
        falls in one unit bucket [m, m+1) — the k-span of every cluster
        is < 1 (same bound as the greedy merge), computed with one
        cumsum + floor + reduceat instead of a Python loop over every
        input centroid (the loop dominated driver state-merging at 10³+
        digests per run)."""
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        delta = self.compression
        cum = np.cumsum(weights)
        k_cum = delta / (2.0 * np.pi) * np.arcsin(
            np.clip(2.0 * cum / total - 1.0, -1.0, 1.0))
        group = np.floor(k_cum)
        bounds = np.nonzero(np.r_[True, group[1:] != group[:-1]])[0]
        ws = np.add.reduceat(weights, bounds)
        sums = np.add.reduceat(means * weights, bounds)
        self.means = sums / ws
        self.weights = ws

    def merge(self, other: "TDigestState") -> "TDigestState":
        return TDigestState.merge_many([self, other])

    @staticmethod
    def merge_many(states: list) -> "TDigestState":
        st = TDigestState(
            compression=max(s.compression for s in states),
            means=np.concatenate([s.means for s in states]),
            weights=np.concatenate([s.weights for s in states]),
            minimum=min(s.minimum for s in states),
            maximum=max(s.maximum for s in states),
        )
        st._compress()
        return st

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum()) if len(self.weights) else 0.0

    def cdf(self, xs: np.ndarray) -> np.ndarray:
        """P[X <= x] interpolated across centroids."""
        xs = np.asarray(xs, dtype=np.float64)
        if len(self.means) == 0:
            return np.full(len(xs), np.nan)
        total = self.total_weight
        # centroid cdf positions (midpoint rule)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        grid_x = np.concatenate([[self.minimum], self.means, [self.maximum]])
        grid_y = np.concatenate([[0.0], cum / total, [1.0]])
        # ensure monotone x for interp (duplicates ok)
        out = np.interp(xs, grid_x, grid_y)
        out[xs < self.minimum] = 0.0
        out[xs >= self.maximum] = 1.0
        return out

    def quantile(self, qs) -> np.ndarray:
        """Weighted positional interpolation (numpy 'linear' rule).

        Treats a centroid of weight w as w points at its mean and
        evaluates h = q·(n−1) between the two bracketing points — exact
        for duplicate-run data (where a pure step or midpoint rule each
        exceed the 0.25·span property bound on two-point distributions),
        and off by at most one centroid's internal spread on continuous
        data (mass per centroid ≈ 4·q(1−q)/compression)."""
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        if len(self.means) == 0:
            return np.full(len(qs), np.nan)
        total = self.total_weight
        cum = np.cumsum(self.weights)
        h = np.clip(qs, 0.0, 1.0) * max(total - 1.0, 0.0)
        p0 = np.floor(h)
        frac = h - p0
        # 0-based point p lives in centroid i with cum[i-1] <= p < cum[i]
        last = len(self.means) - 1
        i0 = np.minimum(np.searchsorted(cum, p0, side="right"), last)
        i1 = np.minimum(np.searchsorted(cum, p0 + 1.0, side="right"), last)
        v0, v1 = self.means[i0], self.means[i1]
        out = v0 + frac * (v1 - v0)
        out[qs <= 0.0] = self.minimum
        out[qs >= 1.0] = self.maximum
        return np.clip(out, self.minimum, self.maximum)


def hll_index_rank(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per 64-bit hash: index = top p bits,
    rank = leading zeros of the rest + 1 (capped) — the HLL update,
    vectorized per bit, shared by the global and grouped sketches."""
    h = h.view(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for bit in range(64 - p):
        hit = ~found & ((rest >> np.uint64(63 - bit))
                        & np.uint64(1)).astype(bool)
        rank[hit] = bit + 1
        found |= hit
    return idx, rank


def hll_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimate per ROW of a (n_keys, m) register
    matrix — same bias-corrected + linear-counting rule as
    ``HyperLogLogState.estimate``."""
    n, m = regs.shape
    mf = float(m)
    alpha = 0.7213 / (1.0 + 1.079 / mf)
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    raw = alpha * mf * mf / inv.sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    lc = np.where(zeros > 0, mf * np.log(mf / np.maximum(zeros, 1)),
                  raw)
    return np.where((raw <= 2.5 * mf) & (zeros > 0), lc, raw)


@dataclass
class HyperLogLogState(PartialState):
    """HyperLogLog distinct-count sketch (p-bit register index, 2^p
    uint8 registers, mergeable via elementwise max). Standard
    bias-corrected estimator with linear-counting small-range
    correction; relative error ≈ 1.04/√(2^p) (p=12 → ~1.6%).
    Feed it 64-bit hashes (``functions.hashing.mix64`` output)."""

    p: int = 12
    registers: np.ndarray = field(
        default_factory=lambda: np.zeros(1 << 12, dtype=np.uint8))

    @staticmethod
    def from_hashes(h: np.ndarray, p: int = 12) -> "HyperLogLogState":
        st = HyperLogLogState(p=p, registers=np.zeros(1 << p,
                                                      dtype=np.uint8))
        if len(h) == 0:
            return st
        idx, rank = hll_index_rank(h, p)
        np.maximum.at(st.registers, idx, rank)
        return st

    def merge(self, other: "HyperLogLogState") -> "HyperLogLogState":
        return HyperLogLogState.merge_many([self, other])

    @staticmethod
    def merge_many(states: list) -> "HyperLogLogState":
        p = states[0].p
        regs = np.maximum.reduce([s.registers for s in states])
        return HyperLogLogState(p=p, registers=regs)

    def estimate(self) -> float:
        m = float(len(self.registers))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(raw)


@dataclass
class MisraGriesState(PartialState):
    """Misra-Gries heavy-hitters sketch over int64 keys (capacity k).

    Candidate guarantee: any key with true count > n/k survives (its
    stored count underestimates by ≤ n/k). Merging sums counters then
    decrements by the (k+1)-th largest — the standard mergeable-summary
    construction (Agarwal et al.), preserving the additive error bound.
    An exact second pass over the candidates turns this into EXACT
    heavy hitters (pipelines/frequency.py)."""

    capacity: int = 1024
    keys: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    counts: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    total: int = 0  # rows ingested — lets callers CHECK the guarantee

    @staticmethod
    def from_keys(k: np.ndarray, capacity: int = 1024) -> "MisraGriesState":
        uniq, cts = np.unique(np.asarray(k, dtype=np.int64),
                              return_counts=True)
        st = MisraGriesState(capacity=capacity, keys=uniq,
                             counts=cts.astype(np.int64), total=len(k))
        st._shrink()
        return st

    def _shrink(self) -> None:
        if len(self.keys) <= self.capacity:
            return
        # subtract the (k+1)-th largest count from all, drop ≤0
        kth = np.partition(self.counts,
                           len(self.counts) - self.capacity - 1)[
            len(self.counts) - self.capacity - 1]
        c = self.counts - kth
        keep = c > 0
        self.keys, self.counts = self.keys[keep], c[keep]

    def merge(self, other: "MisraGriesState") -> "MisraGriesState":
        return MisraGriesState.merge_many([self, other])

    @staticmethod
    def merge_many(states: list) -> "MisraGriesState":
        cap = max(s.capacity for s in states)
        total = sum(s.total for s in states)
        allk = np.concatenate([s.keys for s in states])
        if len(allk) == 0:
            return MisraGriesState(capacity=cap, total=total)
        allc = np.concatenate([s.counts for s in states])
        order = np.argsort(allk, kind="stable")
        k, c = allk[order], allc[order]
        bounds = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        st = MisraGriesState(capacity=cap, keys=k[bounds],
                             counts=np.add.reduceat(c, bounds),
                             total=total)
        st._shrink()
        return st
