"""doc_id uniqueness (SURVEY.md B-V6).

``BASELINE.json:6``: "doc_id uniqueness via groupby-aggregate hash
shuffle" — re-expressed exchange-optimized:

- **"scan" strategy (default):** each block contributes a sorted packed
  array of 8-byte doc_id hashes as a mergeable scan state
  (``PackedHashState``) — uniqueness piggybacks on the single shared
  scan pass, costing zero extra reads; cross-partition duplicate
  detection is a numpy sorted-merge over the per-partition arrays
  (8 B/row on the driver — fine to ~10⁸ rows).
- **"bucketed" strategy (``ctx.thresholds["uniqueness_strategy"]``):**
  the 10¹²-row path — a separate narrow pass through
  ``stages.shuffle.find_duplicate_hashes`` with hash-range buckets so
  each merge task handles a bounded slice. Same result, no driver
  bottleneck.

Either way the ``tokens`` payload and even the id strings never enter
an exchange (SURVEY.md §7 hard part c). doc_id is a uniform key, so no
salting is needed (the skew-prone key is ``source``). Duplicate hashes
are broadcast back (capped) and member rows fetched with a vectorized
``pc.is_in`` semi-join — only when duplicates exist, so the clean-data
fast path is free; hash-collision false positives are removed by
re-grouping the (small) member set by real doc_id.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from bigdime_ray.functions.hashing import hash_string_column, u64_to_i64
from bigdime_ray.spi import (ScanResult, ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)
from bigdime_ray.state.sketches import PartialState

MAX_REPORTED_DUP_IDS = 100_000


@dataclass
class PackedHashState(PartialState):
    """Sorted uint64 hash array (stored as raw bytes for cheap pickle)."""

    packed: bytes = b""
    n: int = 0

    @staticmethod
    def from_hashes(h: np.ndarray) -> "PackedHashState":
        arr = np.sort(h.view(np.int64), kind="stable")  # int64 radix
        return PackedHashState(arr.tobytes(), len(arr))

    def array(self) -> np.ndarray:
        return np.frombuffer(self.packed, dtype=np.int64)

    def merge(self, other: "PackedHashState") -> "PackedHashState":
        return PackedHashState.merge_many([self, other])

    @staticmethod
    def merge_many(states: list) -> "PackedHashState":
        """Single concat + one sort — incremental pairwise merging of k
        states is O(k²·n) memcpy; this is O(k·n log)."""
        a = np.concatenate([s.array() for s in states])
        a.sort(kind="stable")
        return PackedHashState(a.tobytes(), len(a))


def _bucket_edges(n_buckets: int) -> np.ndarray:
    """Inner edges partitioning the int64 range into ``n_buckets`` equal
    hash ranges, computed in integer arithmetic (a float linspace over
    the full int64 span overflows on the top edge and warns on cast)."""
    step = (1 << 64) // n_buckets
    return np.array([-(1 << 63) + k * step for k in range(1, n_buckets)],
                    dtype=np.int64)


class IncrementalDupDetector:
    """Cross-partition duplicate detection that overlaps the scan drain.

    Per-block hash states arrive SORTED (``PackedHashState.from_hashes``
    radix-sorts worker-side). Instead of the old two-step driver tail
    (merge per partition: full concat+sort, THEN bucket+sort again for
    detection — two serial passes over 8 B/row), ``add_state_bytes``
    slices each arriving sorted array into fixed hash-range buckets with
    ``searchsorted`` (zero-copy views) on a background thread WHILE the
    driver idles waiting on the streaming executor, and ``finish``
    radix-sorts each bucket once in a thread pool (numpy releases the
    GIL). Net: one sort pass instead of two, and the bucketing cost is
    hidden inside the drain wait (serial-tail item, VERDICT r2 #1 /
    SURVEY §7.3 #1).
    """

    def __init__(self, n_buckets: int = 8):
        import threading
        from concurrent.futures import ThreadPoolExecutor
        self.n_buckets = n_buckets
        self.edges = _bucket_edges(n_buckets)
        self.buckets: list[list[np.ndarray]] = [[] for _ in range(n_buckets)]
        self.total = 0
        self._lock = threading.Lock()
        self._ex = ThreadPoolExecutor(max_workers=2)
        self._futs: list = []

    def add_state_bytes(self, payload: bytes) -> None:
        self._futs.append(self._ex.submit(self._add, payload))

    def _add(self, payload: bytes) -> None:
        st = PartialState.from_bytes(payload)
        a = st.array()
        if not len(a):
            return
        cuts = np.concatenate([[0], np.searchsorted(a, self.edges), [len(a)]])
        with self._lock:
            self.total += len(a)
            for b in range(self.n_buckets):
                if cuts[b + 1] > cuts[b]:
                    self.buckets[b].append(a[cuts[b]:cuts[b + 1]])

    def finish(self) -> np.ndarray:
        """Join pending adds, then per-bucket concat + radix + dup.

        Thread count follows the Ray CPU budget: 8 sort threads on a
        2-cpu leg thrash (measured +0.2 s on the 2-vs-8 protocol's low
        leg), and the scaling-efficiency bar is only honest if neither
        leg is artificially slowed."""
        from concurrent.futures import ThreadPoolExecutor
        for f in self._futs:
            f.result()
        self._ex.shutdown()
        try:
            import ray
            cpus = (int(ray.cluster_resources().get("CPU", self.n_buckets))
                    if ray.is_initialized() else self.n_buckets)
        except Exception:
            cpus = self.n_buckets
        workers = max(1, min(self.n_buckets, cpus))

        def one(b: int) -> np.ndarray:
            parts = self.buckets[b]
            if not parts:
                return np.empty(0, dtype=np.int64)
            h = (np.concatenate(parts) if len(parts) > 1
                 else parts[0].copy())  # frombuffer views are read-only
            if len(h) < 2:
                return np.empty(0, dtype=np.int64)
            h.sort(kind="stable")  # int64 → radix
            return np.unique(h[:-1][h[1:] == h[:-1]])

        with ThreadPoolExecutor(max_workers=workers) as ex:
            chunks = list(ex.map(one, range(self.n_buckets)))
        return np.concatenate(chunks) if chunks else np.empty(0, np.int64)


def _dups_from_sorted_arrays(arrays: list, n_threads: int = 8) -> np.ndarray:
    """Duplicated values across per-partition SORTED hash arrays.

    Hash values are uniform over int64, so fixed range edges split the
    work evenly; each bucket concatenates its slices (located with
    searchsorted — the inputs are sorted) and radix-sorts independently
    in a thread pool (numpy sort releases the GIL), removing the serial
    driver sort that dominated the global phase (~1.2 s at 16M rows)."""
    arrays = [a for a in arrays if len(a)]
    if not arrays:
        return np.empty(0, dtype=np.int64)
    total = sum(len(a) for a in arrays)
    n_buckets = min(n_threads, max(1, total // 1_000_000))
    if n_buckets == 1:
        allh = np.concatenate(arrays)
        allh.sort(kind="stable")
        return np.unique(allh[:-1][allh[1:] == allh[:-1]])
    inner = _bucket_edges(n_buckets)
    # slice bounds per array: [0, searchsorted(inner edges), len] — the
    # last bucket is closed so int64-max values are included
    cuts = [np.concatenate([[0], np.searchsorted(a, inner), [len(a)]])
            for a in arrays]

    def bucket_dups(b: int) -> np.ndarray:
        parts = [a[c[b]:c[b + 1]] for a, c in zip(arrays, cuts)]
        h = np.concatenate([p for p in parts if len(p)]) \
            if any(len(p) for p in parts) else np.empty(0, np.int64)
        if len(h) < 2:
            return np.empty(0, dtype=np.int64)
        h.sort(kind="stable")
        return np.unique(h[:-1][h[1:] == h[:-1]])

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=n_buckets) as ex:
        chunks = list(ex.map(bucket_dups, range(n_buckets)))
    # the top edge value can never be double-counted: buckets partition
    # [min, max) and the final edge is pinned to int64 max
    return np.concatenate(chunks) if chunks else np.empty(0, np.int64)


@register_validator
class UniquenessValidator(Validator):
    id = "uniqueness"
    scans = True

    def scan_partition(self, tbl: pa.Table, partition_id: str,
                       ctx: ValidationContext, cache=None) -> ScanResult:
        if ctx.thresholds.get("uniqueness_strategy") == "bucketed":
            return ScanResult()  # separate bucketed pass does the work
        h = (cache.doc_id_hash if cache is not None
             else hash_string_column(tbl["doc_id"]))
        return ScanResult(state=PackedHashState.from_hashes(h))

    def run_global(self, ds: Dataset, ctx: ValidationContext, states=None):
        strategy = ctx.thresholds.get("uniqueness_strategy", "scan")
        pre = getattr(ctx, "precomputed_dup_hashes", None)
        if pre is not None:
            # drain-overlapped IncrementalDupDetector already ran
            dup_hashes = pre
        elif strategy == "scan" and states:
            dup_hashes = _dups_from_sorted_arrays(
                [st.array() for st in states.values()])
        else:
            from bigdime_ray.stages.shuffle import find_duplicate_hashes
            num_buckets = int(ctx.thresholds.get("uniqueness_buckets", 1))

            def hash_batch(batch: pa.Table) -> np.ndarray:
                return u64_to_i64(hash_string_column(batch["doc_id"]))

            dup_hashes = find_duplicate_hashes(
                ds.select_columns(["doc_id"]), hash_batch, num_buckets)

        n_dup_ids = len(dup_hashes)
        partitions = ctx.partitions
        if n_dup_ids == 0:
            responses = [ValidationResponse(self.id, p, ValidationResult.PASSED,
                                            "doc_id unique", {"dup_ids": 0})
                         for p in partitions]
            return None, responses
        dup_set = pa.array(dup_hashes[:MAX_REPORTED_DUP_IDS])
        max_rows = int(ctx.thresholds.get("max_collected_violations",
                                          MAX_REPORTED_DUP_IDS))

        # member fetch: prefer a fresh COLUMN-PRUNED read (doc_id +
        # hive-inferred partition_id only) over re-reading through ``ds``
        # — projection does not push through the attach stage, so ``ds``
        # would deserialize the ~500 B/row tokens payload a second time
        narrow = getattr(ctx, "narrow_reader", None)
        src_ds = narrow(["doc_id"]) if narrow is not None else ds
        narrow_cols = src_ds.select_columns(["doc_id", "partition_id"])

        # Exact member COUNTS come from bounded block-local partials —
        # one row per distinct (doc_id, partition) per block — NOT from
        # a row-level fetch: one id duplicated 10⁹ times contributes
        # #blocks partial rows to the driver, never 10⁹ member rows
        # (VERDICT r4 #3). Driver memory ≤ blocks × min(|dup_set|,
        # distinct hit ids per block).
        def member_counts(batch: pa.Table) -> pa.Table:
            h = pa.array(u64_to_i64(hash_string_column(batch["doc_id"])))
            hit = batch.filter(pc.is_in(h, value_set=dup_set))
            g = (hit.select(["doc_id", "partition_id"])
                 .group_by(["doc_id", "partition_id"])
                 .aggregate([([], "count_all")]))
            return g.rename_columns(["doc_id", "partition_id", "cnt"])

        counts_pdf = narrow_cols.map_batches(
            member_counts, batch_format="pyarrow").to_pandas()
        # drop hash-collision false positives: keep only doc_ids that
        # really occur more than once (exact: cnt partials sum globally)
        per_id = counts_pdf.groupby("doc_id")["cnt"].sum()
        real_ids = per_id.index[per_id.to_numpy() > 1]
        counts_pdf = counts_pdf[counts_pdf["doc_id"].isin(set(real_ids))]
        n_dup_ids = len(real_ids)
        part_sums = counts_pdf.groupby("partition_id")["cnt"].sum()
        dup_by_part = {p: int(c) for p, c in part_sums.items()}
        total_members = int(sum(dup_by_part.values()))

        # The violations TABLE is a bounded SAMPLE of member rows:
        # ``limit`` early-terminates the streaming fetch at ``max_rows``
        # (thresholds["max_collected_violations"]), so a single
        # billion-duplicated key can never materialize the driver; the
        # exact counts above are what the verdicts report.
        def members(batch: pa.Table) -> pa.Table:
            h = pa.array(u64_to_i64(hash_string_column(batch["doc_id"])))
            hit = batch.filter(pc.is_in(h, value_set=dup_set))
            n = hit.num_rows
            return pa.table({
                "partition_id": hit["partition_id"],
                "validator_id": pa.array(["uniqueness"] * n, type=pa.string()),
                "doc_id": hit["doc_id"],
                "reason": pa.array(["duplicate doc_id"] * n, type=pa.string()),
                "detail": pa.nulls(n, pa.string()),
            })

        viol_pdf = (narrow_cols.map_batches(members, batch_format="pyarrow")
                    .limit(max_rows).to_pandas())
        viol_pdf = viol_pdf[viol_pdf["doc_id"].isin(set(real_ids))]
        viol_tbl = pa.Table.from_pandas(viol_pdf, preserve_index=False)
        truncated = total_members > len(viol_pdf)
        responses = []
        for p in partitions:
            n_members = dup_by_part.get(p, 0)
            if n_members:
                responses.append(ValidationResponse(
                    self.id, p, ValidationResult.FAILED,
                    f"{n_members} rows share a duplicated doc_id "
                    f"({n_dup_ids} duplicated ids globally)",
                    {"dup_member_rows": int(n_members),
                     "dup_ids_global": int(n_dup_ids),
                     "members_truncated": bool(truncated)}))
            else:
                responses.append(ValidationResponse(
                    self.id, p, ValidationResult.PASSED, "doc_id unique",
                    {"dup_member_rows": 0, "dup_ids_global": int(n_dup_ids)}))
        return viol_tbl, responses
