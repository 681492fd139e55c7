"""Skew-aware shuffle helpers (SURVEY.md B-V8, §4 "Skew").

``BASELINE.json:6,14``: "explicit salt-based skew splitting on hot
`source` keys" / "partitioning / shuffle / skew handled explicitly".

Two complementary strategies, picked per call site:

1. ``block_preagg_counts`` — combine inside ``map_batches`` (one row per
   key per block) then a tiny ``groupby`` over partials. This is the
   default for mergeable aggregates: skew vanishes because at most
   ``num_blocks`` rows per key reach the shuffle. Strictly cheaper than
   salting when the aggregate is associative.
2. ``salted_aggregate`` — for aggregations that cannot be block-combined
   (or when key cardinality ≈ row count), split hot keys into ``salt_k``
   sub-keys with a deterministic hash salt (hash(doc_id) % k — stable
   across retries, no RNG), aggregate partials per (key, salt), strip the
   salt with a second, tiny aggregate. A metamorphic test asserts the
   salted result equals the unsalted one.

Hot keys are detected from a cheap sample (``ds.random_sample``), the
scale-safe analog of collecting exact counts first.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from bigdime_ray.functions.hashing import hash_string_column, mix64


def find_duplicate_hashes(ds: Dataset, hash_batch, num_buckets: int = 1
                          ) -> np.ndarray:
    """Global duplicate detection over a 64-bit key hash — the engine's
    uniqueness shuffle (SURVEY.md B-V6), exchange-optimized.

    Instead of a row-level ``groupby(key).count()`` (Ray's sort-shuffle
    costs ~10 s fixed overhead at 2M rows on one node), each block sorts
    its hashes and emits ONE packed binary cell per (block, bucket); the
    per-bucket merge is then a numpy sorted-concat. Bytes moved are
    identical (8 B/row) but the exchange is ~#blocks×#buckets cells
    instead of N rows — measured 25× faster at 2M rows.

    ``num_buckets=1`` merges on the driver (fine up to ~10⁸ rows ≈ 1 GB);
    at 10¹²-row scale pick ``num_buckets ≈ total_rows / 5·10⁷`` so each
    bucket-merge task handles ~400 MB. Returns the sorted array of
    duplicated hash values (int64 view).
    """

    def pack(batch: pa.Table) -> pa.Table:
        h = hash_batch(batch)  # int64 np array
        if num_buckets == 1:
            arr = np.sort(h)
            return pa.table({"bucket": pa.array([0], type=pa.int32()),
                             "packed": pa.array([arr.tobytes()],
                                                type=pa.binary())})
        buckets = (h.view(np.uint64) >> np.uint64(64 - 32)).astype(np.int64) \
            % num_buckets
        out_b, out_p = [], []
        for b in np.unique(buckets):
            arr = np.sort(h[buckets == b])
            out_b.append(int(b))
            out_p.append(arr.tobytes())
        return pa.table({"bucket": pa.array(out_b, type=pa.int32()),
                         "packed": pa.array(out_p, type=pa.binary())})

    packed = ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)

    def merge_cells(payloads) -> np.ndarray:
        allh = np.sort(np.concatenate(
            [np.frombuffer(p, dtype=np.int64) for p in payloads]))
        return np.unique(allh[:-1][allh[1:] == allh[:-1]])

    if num_buckets == 1:
        rows = packed.take_all()
        if not rows:
            return np.empty(0, dtype=np.int64)
        return merge_cells([r["packed"] for r in rows])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dups = merge_cells(list(df["packed"]))
        return pd.DataFrame({"dup": dups})

    out = (packed.groupby("bucket")
           .map_groups(per_bucket, batch_format="pandas").take_all())
    return np.sort(np.array([r["dup"] for r in out], dtype=np.int64))


def block_preagg_counts(ds: Dataset, keys: list[str],
                        ntok_col: Optional[str] = "n_tok") -> Dataset:
    """Per-``keys`` counts (+ n_tok sum/min/max) via block-local combine.

    Stage 1 (map_batches): pandas groupby inside each block → one partial
    row per key per block.  Stage 2: small shuffle over partials.
    Returns columns: keys + [cnt, ntok_sum, ntok_min, ntok_max].
    """

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native (Acero) block-local groupby — no pandas conversion
        sel = batch.select(keys + ([ntok_col] if ntok_col else []))
        if ntok_col:
            g = sel.group_by(keys).aggregate([
                ([], "count_all"), (ntok_col, "sum"),
                (ntok_col, "min"), (ntok_col, "max")])
            return g.rename_columns(keys + ["cnt", "ntok_sum", "ntok_min",
                                            "ntok_max"])
        g = sel.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("cnt", alias_name="cnt")]
    if ntok_col:
        aggs += [Sum("ntok_sum", alias_name="ntok_sum"),
                 Min("ntok_min", alias_name="ntok_min"),
                 Max("ntok_max", alias_name="ntok_max")]
    return partials.groupby(keys).aggregate(*aggs)


AUTO_EXCHANGE_ROWS_PER_BUCKET = 50_000_000  # ~800 MB of (key, cnt) cells

# One hash bucket of a grouped kernel materializes as ONE pandas frame in
# a single map_groups task (pipelines/stream.py family) — size so a full
# bucket of narrow event rows stays in the low-hundreds-of-MB range
# (4M rows × ~40-80 B/row), far below a worker heap.
GROUP_KERNEL_ROWS_PER_BUCKET = 4_000_000


def resolve_group_buckets(root: Dataset, num_buckets,
                          rows_per_bucket: int = GROUP_KERNEL_ROWS_PER_BUCKET,
                          floor: int | None = None) -> int:
    """Resolve ``num_buckets=None`` for the bucketed map_groups kernels
    from plan-time row counts (VERDICT r4 #2) — the same auto-dispatch
    discipline as ``_auto_buckets``, with a floor that preserves task
    parallelism at small scale: ``max(floor, ceil(rows /
    rows_per_bucket))``. The floor defaults to the cluster CPU count
    (min 16) so small inputs still fan out, while 10¹²-row inputs get
    rows-proportional buckets instead of a fixed constant (a fixed 64
    would put ~1.6×10¹⁰ rows in ONE pandas task).

    Same CAVEAT as ``_auto_buckets``: ``root.count()`` is metadata-cheap
    only on read-rooted datasets — pass the READ-ROOTED input (not a
    derived intermediate), or pin ``num_buckets`` explicitly.
    ``root=None`` skips the count and returns the parallelism floor —
    the resolution for kernels whose only input is derived (counting it
    would execute the upstream plan twice)."""
    if num_buckets is not None:
        return num_buckets
    if floor is None:
        try:
            import ray as _ray
            floor = max(16, int(_ray.cluster_resources().get("CPU", 16)))
        except Exception:
            floor = 16
    if root is None:
        return floor
    try:
        rows = root.count()
    except Exception:
        return floor
    return max(floor, -(-rows // rows_per_bucket))


def _auto_buckets(ds: Dataset, num_buckets, approx_rows: int | None = None
                  ) -> int:
    """Resolve num_buckets=None from the row count — same auto-dispatch
    discipline as the validators: the driver merge is used only while the
    merged cells fit comfortably.

    CAVEAT (ADVICE r2): ``ds.count()`` is metadata-cheap ONLY on
    read-rooted datasets (parquet footers). On a derived dataset
    (map_batches breaks Ray's metadata count) it executes the upstream
    plan, so auto-selection would run the pipeline twice — callers with a
    derived input must either pin ``num_buckets`` or pass
    ``approx_rows`` (e.g. from input file metadata)."""
    if num_buckets is not None:
        return num_buckets
    if approx_rows is None:
        try:
            approx_rows = ds.count()
        except Exception:
            return 1
    return max(1, -(-approx_rows // AUTO_EXCHANGE_ROWS_PER_BUCKET))


def duplicate_key_counts(ds: Dataset, key_col: str, min_count: int = 2,
                         num_buckets: int | None = None,
                         finalize=None) -> pa.Table:
    """Exact per-key counts ≥ ``min_count`` over an int64 key — the
    exchange-optimized replacement for ``groupby(key).count()``.

    Same packed-cell pattern as ``find_duplicate_hashes``: each block
    emits ONE cell per hash bucket holding (sorted distinct keys,
    counts) as packed int64 bytes, so the exchange moves 16 B per
    distinct key per block in #blocks × #buckets cells instead of N
    rows through a hash shuffle (measured ~7× faster at 600k rows —
    Ray's hash aggregate has a multi-second actor fixed cost).
    ``num_buckets=1`` merges on the driver; >1 is the scale path (each
    bucket's merge is an independent task over a bounded key range).
    Returns a pa.Table (key_col, cnt) with cnt ≥ min_count.

    ``finalize(keys, cnts) -> pd.DataFrame`` (optional) replaces the
    default (key, cnt) output PER MERGE — on the driver for
    num_buckets=1, INSIDE each bucket task otherwise. Because every
    bucket holds complete key groups, a finalize that reduces per-key
    counts further (e.g. a histogram of counts) shrinks what leaves
    each bucket from |keys in bucket| rows to the reduction's size —
    the Q13-shape lever (see ``frequency.count_histogram``). It must
    accept empty arrays and return a correctly-typed empty frame.
    """
    num_buckets = _auto_buckets(ds, num_buckets)

    def pack(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, counts = np.unique(k, return_counts=True)
        counts = counts.astype(np.int64)
        if len(uniq) == 0:
            # empty batch in the bucketed path: bounds=[0] would index an
            # empty bucket array (ADVICE r2) — emit an empty cell table
            return pa.table({"bucket": pa.array([], type=pa.int32()),
                             "keys": pa.array([], type=pa.binary()),
                             "cnts": pa.array([], type=pa.binary())})
        if num_buckets == 1:
            return pa.table({
                "bucket": pa.array([0], type=pa.int32()),
                "keys": pa.array([uniq.tobytes()], type=pa.binary()),
                "cnts": pa.array([counts.tobytes()], type=pa.binary())})
        b = (mix64(uniq.view(np.uint64)) % np.uint64(num_buckets)) \
            .astype(np.int32)
        order = np.argsort(b, kind="stable")
        bs, ks, cs = b[order], uniq[order], counts[order]
        bounds = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
        ends = np.r_[bounds[1:], len(bs)]
        return pa.table({
            "bucket": pa.array(bs[bounds], type=pa.int32()),
            "keys": pa.array([ks[s:e].tobytes()
                              for s, e in zip(bounds, ends)],
                             type=pa.binary()),
            "cnts": pa.array([cs[s:e].tobytes()
                              for s, e in zip(bounds, ends)],
                             type=pa.binary())})

    def merge_cells(key_bufs, cnt_bufs) -> tuple[np.ndarray, np.ndarray]:
        allk = np.concatenate([np.frombuffer(kb, dtype=np.int64)
                               for kb in key_bufs])
        allc = np.concatenate([np.frombuffer(cb, dtype=np.int64)
                               for cb in cnt_bufs])
        order = np.argsort(allk, kind="stable")
        k, c = allk[order], allc[order]
        bounds = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        sums = np.add.reduceat(c, bounds)
        keys = k[bounds]
        m = sums >= min_count
        return keys[m], sums[m]

    cells = ds.map_batches(pack, batch_format="pyarrow",
                           zero_copy_batch=True)
    _empty = np.empty(0, dtype=np.int64)

    def _default_fin(keys: np.ndarray, cnts: np.ndarray) -> pd.DataFrame:
        return pd.DataFrame({key_col: keys.astype(np.int64),
                             "cnt": cnts.astype(np.int64)})

    fin = finalize if finalize is not None else _default_fin
    if num_buckets == 1:
        rows = cells.take_all()
        if not rows:
            return pa.Table.from_pandas(fin(_empty, _empty.copy()),
                                        preserve_index=False)
        keys, cnts = merge_cells([r["keys"] for r in rows],
                                 [r["cnts"] for r in rows])
        return pa.Table.from_pandas(fin(keys, cnts), preserve_index=False)

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        keys, cnts = merge_cells(list(g["keys"]), list(g["cnts"]))
        return fin(keys, cnts)

    out = (cells.groupby("bucket")
           .map_groups(merge_group, batch_format="pandas").to_pandas())
    if len(out) == 0:
        return pa.Table.from_pandas(fin(_empty, _empty.copy()),
                                    preserve_index=False)
    return pa.Table.from_pandas(out, preserve_index=False)


_REDUCE_UFUNC = {"sum": np.add, "min": np.minimum, "max": np.maximum}
_REDUCE_IDENTITY = {"sum": 0,
                    "min": np.iinfo(np.int64).max,
                    "max": np.iinfo(np.int64).min}


def grouped_int_sums_exchange(ds: Dataset, extract, num_values: int,
                              num_buckets: int | None = None,
                              topk: tuple[int, int] | None = None,
                              ops: list[str] | None = None
                              ) -> tuple[np.ndarray, list[np.ndarray]]:
    """Generalized packed-cell aggregate: exact per-key SUMS of
    ``num_values`` int64 value columns over an int64 key.

    ``ops`` optionally overrides the reduction per value column with
    ``"sum"`` (default), ``"min"`` or ``"max"`` — all three are
    associative + commutative, so the same block-partial → cell-merge
    plumbing is exact for any mix (e.g. MIN(ts) funnel steps next to a
    COUNT). Identities: 0 / int64-max / int64-min; a key absent from a
    block simply contributes the identity, and callers can detect
    "never observed" for min/max by comparing against it.

    ``extract(batch) -> (keys int64[n], [v int64[n]] × num_values)``.
    Each block pre-aggregates with np.unique + add.at and emits ONE cell
    per bucket of packed arrays; merges are numpy sort+reduceat. Same
    exchange economics as ``duplicate_key_counts`` (16–32 B per distinct
    key per block, #blocks × #buckets cells instead of a row shuffle).
    Composite keys pack into one int64 (e.g. user_id·2²⁰ + hour index).
    Returns (keys, [sums] × num_values); num_buckets>1 is the scale path
    (auto-selected from the row count when not pinned).

    ``topk=(value_idx, k)`` prunes each merge to the k keys with the
    largest ``sums[value_idx]`` (ties → smaller key). Correct because
    every bucket holds COMPLETE key groups, so the global top-k is
    contained in the union of per-bucket top-k: the driver sees at most
    num_buckets × k rows instead of every distinct key (VERDICT r2 #8).
    Callers re-sort the returned ≤ num_buckets×k rows.
    """
    num_buckets = _auto_buckets(ds, num_buckets)
    if ops is None:
        ops = ["sum"] * num_values
    if len(ops) != num_values or any(o not in _REDUCE_UFUNC for o in ops):
        raise ValueError(f"ops must be {sorted(_REDUCE_UFUNC)} x {num_values}")
    if topk is not None and any(o != "sum" for o in ops):
        # the block prune keeps keys with the largest PARTIAL value; for
        # min/max a key's global extremum can live in a pruned cell, and
        # negating the max identity (int64 min) wraps silently
        raise ValueError("topk pruning is only valid when every op is "
                         f"'sum' (got ops={ops})")

    def _topk_prune(keys: np.ndarray, sums: list[np.ndarray]
                    ) -> tuple[np.ndarray, list[np.ndarray]]:
        if topk is None or len(keys) <= topk[1]:
            return keys, sums
        vi, k = topk
        sel = np.lexsort((keys, -sums[vi]))[:k]
        return keys[sel], [s[sel] for s in sums]

    vcols = [f"v{i}" for i in range(num_values)]

    def pack(batch: pa.Table) -> pa.Table:
        keys, values = extract(batch)
        uniq, inv = np.unique(keys, return_inverse=True)
        if len(uniq) == 0:
            # empty batch: same bounds=[0] hazard as duplicate_key_counts
            cols = {"bucket": pa.array([], type=pa.int32()),
                    "keys": pa.array([], type=pa.binary())}
            for c in vcols:
                cols[c] = pa.array([], type=pa.binary())
            return pa.table(cols)
        partials = []
        for v, op in zip(values, ops):
            acc = np.full(len(uniq), _REDUCE_IDENTITY[op], dtype=np.int64)
            _REDUCE_UFUNC[op].at(acc, inv, np.asarray(v, dtype=np.int64))
            partials.append(acc)
        if num_buckets == 1:
            cols = {"bucket": pa.array([0], type=pa.int32()),
                    "keys": pa.array([uniq.tobytes()], type=pa.binary())}
            for c, acc in zip(vcols, partials):
                cols[c] = pa.array([acc.tobytes()], type=pa.binary())
            return pa.table(cols)
        b = (mix64(uniq.view(np.uint64)) % np.uint64(num_buckets)) \
            .astype(np.int32)
        order = np.argsort(b, kind="stable")
        bs = b[order]
        bounds = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
        ends = np.r_[bounds[1:], len(bs)]
        cols = {"bucket": pa.array(bs[bounds], type=pa.int32()),
                "keys": pa.array([uniq[order][s:e].tobytes()
                                  for s, e in zip(bounds, ends)],
                                 type=pa.binary())}
        for c, acc in zip(vcols, partials):
            cols[c] = pa.array([acc[order][s:e].tobytes()
                                for s, e in zip(bounds, ends)],
                               type=pa.binary())
        return pa.table(cols)

    def merge_cells(rows: list[dict]) -> tuple[np.ndarray, list[np.ndarray]]:
        allk = np.concatenate([np.frombuffer(r["keys"], dtype=np.int64)
                               for r in rows])
        order = np.argsort(allk, kind="stable")
        k = allk[order]
        bounds = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        sums = []
        for c, op in zip(vcols, ops):
            allv = np.concatenate([np.frombuffer(r[c], dtype=np.int64)
                                   for r in rows])[order]
            # bounds are run starts of a sorted non-empty array, so every
            # reduceat segment is non-empty (no identity-fill hazard).
            sums.append(_REDUCE_UFUNC[op].reduceat(allv, bounds))
        return k[bounds], sums

    cells = ds.map_batches(pack, batch_format="pyarrow",
                           zero_copy_batch=True)
    if num_buckets == 1:
        rows = cells.take_all()
        if not rows:
            e = np.empty(0, dtype=np.int64)
            return e, [e.copy() for _ in range(num_values)]
        return _topk_prune(*merge_cells(rows))

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        keys, sums = _topk_prune(*merge_cells(g.to_dict("records")))
        out = {"k": keys}
        for c, s in zip(vcols, sums):
            out[c] = s
        return pd.DataFrame(out)

    out = (cells.groupby("bucket")
           .map_groups(merge_group, batch_format="pandas").to_pandas())
    if len(out) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, [e.copy() for _ in range(num_values)]
    return _topk_prune(out["k"].to_numpy().astype(np.int64),
                       [out[c].to_numpy().astype(np.int64) for c in vcols])


def ensure_schema(schema: pa.Schema):
    """map_batches fn factory: rebuild blocks so EMPTY blocks keep the
    stage schema. Ray's hash shuffle (groupby/join) emits zero-column
    empty blocks for empty hash partitions; a downstream union or join
    then sees mismatched schemas ("RefBundle ... different schema"
    warnings, or pyarrow 'No match for FieldRef' join errors). Applying
    this after a shuffle pins the schema; the non-empty path is a
    zero-copy column select."""
    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return schema.empty_table()
        return b.select(schema.names)
    return fn


def add_hash_bucket(ds: Dataset, key: str, num_buckets: int = 64,
                    col: str = "__bucket") -> Dataset:
    """Append a hash-bucket column over ``key`` — a groupby over the
    bucket gives ``num_buckets`` vectorizable chunks that each hold
    COMPLETE key groups, instead of one pandas group per key (~0.2 ms
    fixed overhead each — the dominant cost at 10⁵+ groups)."""
    from bigdime_ray.functions.hashing import column_hashes

    def add(b: pa.Table) -> pa.Table:
        kh = column_hashes(b[key])
        return b.append_column(
            col, pa.array((kh % np.uint64(num_buckets)).astype(np.int32)))

    return ds.map_batches(add, batch_format="pyarrow",
                          zero_copy_batch=True)


def default_join_partitions(cap: int = 16) -> int:
    """Partition count for Dataset.join sized to the cluster (capped —
    oversized hash-join pools deadlock small CPU counts)."""
    import ray as _ray
    return max(2, min(cap, int(_ray.cluster_resources().get("CPU", 4))))


def drop_empty_blocks(ds: Dataset) -> Dataset:
    """Physically remove empty blocks from a (materialized) Dataset.

    Ray's hash shuffle (groupby/union) emits ZERO-COLUMN empty blocks
    for empty hash partitions, and map operators bypass empty blocks —
    so ``ensure_schema`` cannot normalize them — while ``Dataset.join``
    chokes on them (pyarrow: "No match ... for FieldRef" on the side
    holding the schemaless empty). Row counts come from the executed
    plan's block METADATA (the driver sees only ints, never block data
    — and no per-block RPC either; a remote count task runs only for
    bundles whose metadata lacks num_rows). Safe at any scale. Use on
    any groupby output that feeds a join."""
    import ray as _ray
    import ray.data as _rd

    refs, unknown = [], []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            n = getattr(meta, "num_rows", None)
            if n is None:
                unknown.append(len(refs))
            refs.append([ref, n])
    if unknown:
        @_ray.remote(num_cpus=0)
        def _nrows(t) -> int:
            return t.num_rows

        counts = _ray.get([_nrows.remote(refs[i][0]) for i in unknown])
        for i, n in zip(unknown, counts):
            refs[i][1] = n
    keep = [r for r, n in refs if n]
    if not keep:  # all-empty: keep one block so the schema survives
        keep = [refs[0][0]] if refs else []
    return _rd.from_arrow_refs(keep)


def detect_hot_keys(ds: Dataset, key: str, sample_frac: float = 0.01,
                    hot_share: float = 0.05, target_rows_per_group: int = 1_000_000,
                    seed: int = 7) -> dict[str, int]:
    """Estimate hot keys from a sample; return {key_value: salt_k}.

    A key is hot if its sampled share exceeds ``hot_share``; its salt
    factor is ceil(estimated_rows / target_rows_per_group), ≥ 2.
    """
    sample = ds.select_columns([key]).random_sample(sample_frac, seed=seed)
    counts = sample.groupby(key).aggregate(Count(alias_name="cnt")).to_pandas()
    total = counts["cnt"].sum()
    if total == 0:
        return {}
    est_total_rows = total / sample_frac
    hot = counts[counts["cnt"] / total > hot_share]
    est_rows = hot["cnt"].to_numpy() / total * est_total_rows
    salt = np.maximum(2, np.ceil(est_rows / target_rows_per_group)
                      .astype(np.int64))
    return dict(zip(hot[key].tolist(), (int(k) for k in salt)))


def add_salt(batch: pa.Table, key: str, hot_keys: dict[str, int],
             salt_source: str = "doc_id") -> pa.Table:
    """Append a deterministic ``__salt`` column: hash(salt_source) % k for
    hot keys, 0 otherwise. Deterministic → safe under Ray task retries."""
    n = batch.num_rows
    salts = np.zeros(n, dtype=np.int32)
    if hot_keys:
        key_np = batch[key].to_numpy(zero_copy_only=False)
        h = hash_string_column(batch[salt_source])
        for kv, k_factor in hot_keys.items():
            mask = key_np == kv
            if mask.any():
                salts[mask] = (h[mask] % np.uint64(k_factor)).astype(np.int32)
    return batch.append_column("__salt", pa.array(salts))


def salted_aggregate(ds: Dataset, key: str, value_col: str,
                     hot_keys: dict[str, int],
                     salt_source: str = "doc_id") -> Dataset:
    """Two-stage salted aggregate: count + sum/min/max of ``value_col``.

    Stage 1 groups by (key, __salt) — hot keys split across salt_k
    reducers; stage 2 strips the salt with a tiny re-aggregate. Results
    are provably identical to the unsalted groupby (metamorphic test in
    tests/test_shuffle.py).
    """
    salted = ds.map_batches(lambda b: add_salt(b, key, hot_keys, salt_source),
                            batch_format="pyarrow")
    key_type = salted.schema().base_schema.field(key).type
    val_type = salted.schema().base_schema.field(value_col).type
    stage1 = salted.groupby([key, "__salt"]).aggregate(
        Count(alias_name="cnt"),
        Sum(value_col, alias_name="vsum"),
        Min(value_col, alias_name="vmin"),
        Max(value_col, alias_name="vmax"))
    # pin the schema on the shuffle's empty blocks (Ray emits zero-column
    # empties for empty hash partitions → "RefBundle ... different
    # schema" warnings downstream)
    stage1 = stage1.map_batches(ensure_schema(pa.schema(
        [(key, key_type), ("__salt", pa.int32()), ("cnt", pa.int64()),
         ("vsum", val_type), ("vmin", val_type), ("vmax", val_type)])),
        batch_format="pyarrow")
    return stage1.groupby(key).aggregate(
        Sum("cnt", alias_name="cnt"),
        Sum("vsum", alias_name="vsum"),
        Min("vmin", alias_name="vmin"),
        Max("vmax", alias_name="vmax"))
