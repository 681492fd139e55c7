"""Frequency / cardinality operators over huge key columns.

- ``heavy_hitters`` — EXACT keys with count ≥ threshold, found
  sketch-first: pass 1 builds mergeable Misra-Gries states per block
  (candidate superset guaranteed while capacity ≥ n/threshold), pass 2
  recounts ONLY the candidates exactly with a broadcast semi-join. Total
  exchange: one MG state per block + one (candidate, count) cell per
  block — never a row-level shuffle. This is also the engine's hot-key
  detector (feeds ``stages.shuffle.salted_aggregate``).
- ``distinct_count`` — exact COUNT(DISTINCT key) via the packed-cell
  exchange (per-block sorted distinct keys, driver/bucket numpy merge).
- ``approx_distinct_count`` — HyperLogLog (mergeable, ~1.6% at p=12):
  the 10¹²-row path where even distinct keys don't fit anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from bigdime_ray.functions.hashing import mix64
from bigdime_ray.state.sketches import (HyperLogLogState, MisraGriesState,
                                        PartialState, merge_states)


def _states_from_blocks(ds: Dataset, build) -> list:
    def pack(batch: pa.Table) -> pa.Table:
        st = build(batch)
        return pa.table({"payload": pa.array([st.to_bytes()],
                                             type=pa.binary())})

    rows = ds.map_batches(pack, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    return [PartialState.from_bytes(r["payload"]) for r in rows]


def heavy_hitters(ds: Dataset, key_col: str, threshold: int,
                  capacity: int = 4096) -> pa.Table:
    """Exact keys with total count ≥ ``threshold`` (int64 keys).

    Correctness: Misra-Gries never drops a key whose true count exceeds
    n/capacity, so with capacity ≥ n/threshold the candidate set is a
    superset of the answer; the exact recount removes false positives.
    The guarantee is ENFORCED, not assumed: the sketch tracks n, and if
    the requested capacity turns out too small for this input the sketch
    pass reruns once with capacity = 1.2·n/threshold (one extra read —
    never a silently incomplete "exact" answer). Returns (key_col, cnt),
    cnt exact.
    """
    keyed = ds.select_columns([key_col])
    while True:
        cap = capacity

        def build(b: pa.Table) -> MisraGriesState:
            return MisraGriesState.from_keys(
                b[key_col].to_numpy(zero_copy_only=False), cap)

        states = _states_from_blocks(keyed, build)
        merged = merge_states(states)
        needed = -(-merged.total // max(threshold, 1))  # ceil(n/T)
        if capacity >= needed:
            break
        capacity = int(needed * 1.2) + 1
    cand = np.sort(merged.keys)
    if len(cand) == 0:
        return pa.table({key_col: pa.array([], type=pa.int64()),
                         "cnt": pa.array([], type=pa.int64())})
    cand_set = pa.array(cand)

    def recount(batch: pa.Table) -> pa.Table:
        k = batch[key_col]
        hit = pc.is_in(k, value_set=cand_set)
        kv = k.filter(hit).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(cand, kv)
        cts = np.bincount(idx, minlength=len(cand)).astype(np.int64)
        return pa.table({"cts": pa.array([cts.tobytes()],
                                         type=pa.binary())})

    rows = (ds.select_columns([key_col])
            .map_batches(recount, batch_format="pyarrow",
                         zero_copy_batch=True).take_all())
    total = np.zeros(len(cand), dtype=np.int64)
    for r in rows:
        total += np.frombuffer(r["cts"], dtype=np.int64)
    m = total >= threshold
    return pa.table({key_col: pa.array(cand[m]),
                     "cnt": pa.array(total[m])})


def distinct_count(ds: Dataset, key_col: str,
                   num_buckets: int | None = None) -> int:
    """Exact COUNT(DISTINCT key) — per-block sorted distinct values as
    packed cells; the merge auto-dispatches (VERDICT r2 #3): below
    ``AUTO_EXCHANGE_ROWS_PER_BUCKET`` rows a single driver numpy merge,
    above it per-hash-bucket merge tasks that each count their own
    bounded key range and return ONE int (the driver sums ints, never
    holds the distinct keys). Buckets partition by key hash, so no key
    is double-counted across buckets. ``num_buckets=None`` auto-selects
    from the (read-rooted) row count; pin it on derived inputs."""
    from bigdime_ray.functions.hashing import mix64 as _mix64
    from bigdime_ray.stages.shuffle import _auto_buckets

    num_buckets = _auto_buckets(ds, num_buckets)

    def pack(batch: pa.Table) -> pa.Table:
        u = np.unique(batch[key_col].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        if num_buckets == 1:
            return pa.table({"bucket": pa.array([0], type=pa.int32()),
                             "keys": pa.array([u.tobytes()],
                                              type=pa.binary())})
        if len(u) == 0:
            return pa.table({"bucket": pa.array([], type=pa.int32()),
                             "keys": pa.array([], type=pa.binary())})
        b = (_mix64(u.view(np.uint64)) % np.uint64(num_buckets)) \
            .astype(np.int32)
        order = np.argsort(b, kind="stable")
        bs, ks = b[order], u[order]
        bounds = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
        ends = np.r_[bounds[1:], len(bs)]
        return pa.table({
            "bucket": pa.array(bs[bounds], type=pa.int32()),
            "keys": pa.array([ks[s:e].tobytes()
                              for s, e in zip(bounds, ends)],
                             type=pa.binary())})

    def count_distinct(bufs) -> int:
        allk = np.concatenate([np.frombuffer(b, dtype=np.int64)
                               for b in bufs])
        if len(allk) == 0:
            return 0
        allk.sort(kind="stable")
        return int(1 + (allk[1:] != allk[:-1]).sum())

    cells = (ds.select_columns([key_col])
             .map_batches(pack, batch_format="pyarrow",
                          zero_copy_batch=True))
    if num_buckets == 1:
        rows = cells.take_all()
        if not rows:
            return 0
        return count_distinct([r["keys"] for r in rows])

    import pandas as pd

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [count_distinct(list(g["keys"]))]})

    out = (cells.groupby("bucket")
           .map_groups(per_bucket, batch_format="pandas").take_all())
    return int(sum(r["n"] for r in out))


def approx_distinct_count(ds: Dataset, key_col: str, p: int = 12) -> float:
    """HyperLogLog estimate of COUNT(DISTINCT key) (~1.04/√2^p rel err)."""
    states = _states_from_blocks(
        ds.select_columns([key_col]),
        lambda b: HyperLogLogState.from_hashes(
            mix64(b[key_col].to_numpy(zero_copy_only=False)
                  .astype(np.int64).view(np.uint64)), p))
    return merge_states(states).estimate()


def grouped_distinct_count(ds: Dataset, group_col: str, key_col: str,
                           num_buckets: int | None = None) -> pa.Table:
    """Per-group exact COUNT(DISTINCT key) — e.g. distinct users per
    event type. Returns a small (group, n_distinct) Arrow table.

    Shape: block-local vectorized (group, key) pair dedupe (Arrow
    group_by) → packed key cells per (block, bucket, group), where the
    bucket partitions the KEY hash space so every (group, key) pair
    lands in exactly ONE bucket → per-bucket tasks count each group's
    distinct keys over a bounded key range → the driver sums partials
    that are ≤ |groups| × num_buckets rows BY CONSTRUCTION (the
    cap_violations bound argument), never the keys themselves.

    Scale assumption: moderate group cardinality (cells scale with
    blocks × buckets × groups). For millions of groups, pack the group
    INTO the cell key (one int64 of mix64(group) ^ key) and use
    ``distinct_count``'s single-column exchange per group-hash instead.
    """
    from bigdime_ray.functions.hashing import mix64 as _mix64
    from bigdime_ray.stages.shuffle import _auto_buckets

    num_buckets = _auto_buckets(ds, num_buckets)
    empty = pa.table({"bucket": pa.array([], type=pa.int32()),
                      group_col: pa.array([], type=pa.string()),
                      "keys": pa.array([], type=pa.binary())})

    def pack(batch: pa.Table) -> pa.Table:
        pairs = (batch.select([group_col, key_col])
                 .group_by([group_col, key_col]).aggregate([]))
        if pairs.num_rows == 0:
            return empty
        enc = pairs[group_col].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = pairs[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (_mix64(k.view(np.uint64)) % np.uint64(num_buckets)) \
            .astype(np.int64)
        order = np.lexsort((k, b, codes))
        cs, bs, ks = codes[order], b[order], k[order]
        bounds = np.nonzero(np.r_[True, (cs[1:] != cs[:-1])
                                  | (bs[1:] != bs[:-1])])[0]
        ends = np.r_[bounds[1:], len(ks)]
        groups = enc.dictionary.take(pa.array(cs[bounds]))
        return pa.table({
            "bucket": pa.array(bs[bounds].astype(np.int32)),
            group_col: pa.array(groups, type=pa.string()),
            "keys": pa.array([ks[s:e].tobytes()
                              for s, e in zip(bounds, ends)],
                             type=pa.binary())})

    import pandas as pd

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_g, out_n = [], []
        for grp, sub in g.groupby(group_col, sort=False):
            allk = np.concatenate([np.frombuffer(b, dtype=np.int64)
                                   for b in sub["keys"]])
            allk.sort(kind="stable")
            out_g.append(grp)
            out_n.append(int(1 + (allk[1:] != allk[:-1]).sum())
                         if len(allk) else 0)
        return pd.DataFrame({group_col: out_g, "n": out_n})

    cells = ds.map_batches(pack, batch_format="pyarrow",
                           zero_copy_batch=True)
    partials = (cells.groupby("bucket")
                .map_groups(per_bucket, batch_format="pandas").take_all())
    agg: dict[str, int] = {}
    for r in partials:
        agg[r[group_col]] = agg.get(r[group_col], 0) + int(r["n"])
    names = sorted(agg)
    return pa.table({group_col: pa.array(names, type=pa.string()),
                     "n_distinct": pa.array([agg[x] for x in names],
                                            type=pa.int64())})


def pivot_counts(ds: Dataset, key_col: str, pivot_col: str,
                 values: list[str], prefix: str = "n_") -> Dataset:
    """Wide-format count features: one row per key with a count column
    per pivot value — ``SUM(CASE WHEN pivot = v THEN 1 END)`` per key
    (the classic per-user event-type feature table).

    Block-local pre-aggregation does ALL the counting (np.unique keys +
    one ``np.add.at`` into an n_keys × n_values matrix per block), so
    the single shuffle carries ≤ #blocks × keys-per-block partial rows
    of pure int64 — then a groupby-sum per column. Values outside
    ``values`` are ignored (match the CASE list explicitly)."""
    from ray.data.aggregate import Sum

    cols = [f"{prefix}{v}" for v in values]
    value_set = pa.array(values)

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        code = (pc.fill_null(pc.index_in(batch[pivot_col],
                                         value_set=value_set), -1)
                .to_numpy(zero_copy_only=False).astype(np.int64))
        m = code >= 0
        k, code = k[m], code[m]
        uk, inv = np.unique(k, return_inverse=True)
        mat = np.zeros((len(uk), len(values)), dtype=np.int64)
        np.add.at(mat, (inv, code), 1)
        out = {key_col: pa.array(uk)}
        for j, c in enumerate(cols):
            out[c] = pa.array(mat[:, j])
        return pa.table(out)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(key_col)
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))


def pivot_sums(ds: Dataset, key_col: str, pivot_col: str,
               value_col: str, values: list[str], scale: int = 1,
               prefix: str = "s_") -> Dataset:
    """Wide-format SUM pivot — ``SUM(CASE WHEN pivot = v THEN value
    END)`` per key, one int64 column per pivot value (the value-weighted
    sibling of ``pivot_counts``).

    ``scale`` fixed-point-encodes the value column PER ROW before any
    addition (floor(v·scale+0.5)), so every cell is an order-independent
    integer sum — the repo-wide oracle discipline. Block-local
    np.add.at into an n_keys × n_values matrix does all the work; the
    single shuffle carries ≤ #blocks × keys-per-block partial rows."""
    from ray.data.aggregate import Sum

    cols = [f"{prefix}{v}" for v in values]
    value_set = pa.array(values)

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        code = (pc.fill_null(pc.index_in(batch[pivot_col],
                                         value_set=value_set), -1)
                .to_numpy(zero_copy_only=False).astype(np.int64))
        v = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        vs = np.floor(v * scale + 0.5).astype(np.int64)
        m = code >= 0
        k, code, vs = k[m], code[m], vs[m]
        uk, inv = np.unique(k, return_inverse=True)
        mat = np.zeros((len(uk), len(values)), dtype=np.int64)
        np.add.at(mat, (inv, code), vs)
        out = {key_col: pa.array(uk)}
        for j, c in enumerate(cols):
            out[c] = pa.array(mat[:, j])
        return pa.table(out)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(key_col)
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))


def grouped_quantiles(ds: Dataset, key: str, value_col: str,
                      qs: list[float], method: str = "exact",
                      num_buckets: int = 64,
                      compression: float = 200.0) -> Dataset:
    """Per-group quantiles of ``value_col`` (SQL ``quantile_cont`` /
    ``PERCENTILE_CONT``), multiple probabilities in one pass
    (SURVEY §7.3 #3: multi-column grouped quantiles).

    - ``method="exact"``: co-located hash buckets of whole key groups,
      ONE lexsort per bucket, then every group's order statistics are
      two gathers + a linear interpolation — vectorized across all
      groups, no per-key loop. Interpolation rule is ``h = (n-1)·q``
      with linear blend ``a + frac·(b-a)``, matching DuckDB/Postgres
      ``quantile_cont`` exactly.
    - ``method="disc"``: SQL ``quantile_disc`` / ``PERCENTILE_DISC`` —
      the smallest value whose cumulative distribution ≥ q, i.e. the
      order statistic at index ``ceil(q·n) − 1`` (verified against
      DuckDB). No interpolation, so the INPUT dtype passes through
      unchanged — int64 in, int64 out, hash-exact with no fixed-point
      scaling tricks. Same bucketed one-lexsort kernel as exact.
    - ``method="tdigest"``: the huge-cardinality/huge-group path —
      per-block mergeable t-digests per key (8 B/centroid instead of
      8 B/row through the shuffle), merged per key, then the digest's
      interpolated quantile. Error is O(q(1-q)/compression)
      (``state.sketches.TDigestState``); equivalence vs exact is pinned
      in tests with that ε.

    Output: one row per key with columns ``q<percent>`` (e.g. q25,
    q50, q75), float64.
    """
    names = [f"q{int(round(q * 100))}" for q in qs]

    if method == "tdigest":
        from bigdime_ray.state.sketches import TDigestState

        def partials(batch: pa.Table) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False)
            v = batch[value_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            order = np.argsort(k, kind="stable")
            k, v = k[order], v[order]
            starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
            ends = np.r_[starts[1:], len(k)]
            payloads = [TDigestState.from_values(
                v[s:e], compression=compression).to_bytes()
                for s, e in zip(starts, ends)]
            return pa.table({key: pa.array(k[starts]),
                             "payload": pa.array(payloads,
                                                 type=pa.binary())})

        def merge_quantiles(g) -> "pd.DataFrame":
            import pandas as pd
            sts = [TDigestState.from_bytes(b) for b in g["payload"]]
            digest = TDigestState.merge_many(sts)
            vals = digest.quantile(np.asarray(qs, dtype=np.float64))
            out = {key: [g[key].iloc[0]]}
            for name, val in zip(names, vals):
                out[name] = [float(val)]
            return pd.DataFrame(out)

        return (ds.map_batches(partials, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby(key).map_groups(merge_quantiles,
                                         batch_format="pandas"))

    import pandas as pd
    discrete = method == "disc"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        v = g[value_col].to_numpy()
        if not discrete:
            v = v.astype(np.float64)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        n = len(k)
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        sizes = np.diff(np.r_[starts, n])
        out = {key: k[starts]}
        for name, q in zip(names, qs):
            if discrete:
                idx = np.maximum(
                    np.ceil(sizes * float(q)).astype(np.int64) - 1, 0)
                out[name] = v[starts + idx]
                continue
            h = (sizes - 1) * float(q)
            lo = np.floor(h).astype(np.int64)
            frac = h - lo
            a = v[starts + lo]
            b = v[starts + np.minimum(lo + 1, sizes - 1)]
            out[name] = a + frac * (b - a)
        return pd.DataFrame(out)

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, num_buckets).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def group_share(ds: Dataset, key: str, value_col: str,
                share_col: str = "share_ppm",
                ppm: int = 1_000_000) -> Dataset:
    """Per-row share of its group's total — the RATIO_TO_REPORT /
    ``v * ppm // SUM(v) OVER (PARTITION BY key)`` window shape, as
    EXACT int64 floor division (default parts-per-million), so the
    result hash-matches any engine's integer division bit-for-bit.

    ``value_col`` must be non-negative int64 (fixed-point upstream)
    with ``v · ppm < 2⁶³`` (v < ~9·10¹² at ppm=10⁶ — raise/re-scale
    upstream otherwise). Scale shape: group totals come from ONE
    block-pre-aggregated groupby bounded by |groups| rows, are pulled
    once and broadcast (``ray.put``); the fact rows stream through a
    stateless map and never shuffle. Broadcast bound: |groups| fits a
    worker (~10⁸); beyond that switch to a co-partitioned join on the
    totals. Appends ``share_col`` to the input rows."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        uniq = pc.unique(k)
        code = pc.index_in(k, uniq).to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, code, v)
        return pa.table({key: uniq, "s": pa.array(s)})

    totals = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(key).aggregate(Sum("s", alias_name="s"))
              .to_pandas())
    tkeys = pa.array(totals[key])
    tsums = totals["s"].to_numpy().astype(np.int64)
    ref = _ray.put((tkeys, tsums))

    def add_share(batch: pa.Table) -> pa.Table:
        tk, tv = _ray.get(ref)
        idx_arr = pc.index_in(batch[key], value_set=tk)
        if idx_arr.null_count:  # index_in null ⇒ key missing
            raise AssertionError("group key missing from totals")
        idx = idx_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        share = v * ppm // tv[idx]
        return batch.append_column(share_col, pa.array(share))

    return ds.map_batches(add_share, batch_format="pyarrow",
                          zero_copy_batch=True)


def grouped_mad(ds: Dataset, key: str, value_col: str,
                num_buckets: int = 64) -> Dataset:
    """Per-group median absolute deviation (SQL ``mad(x)``), exact.

    ``value_col`` must already be int64 (fixed-point upstream). The
    result is emitted as ``mad4`` = 4·MAD, an exact INTEGER: the
    median of n ints interpolates to a half-unit (denominator 2), so
    |2v − 2·median| is an int whose own median has denominator 2 —
    doubling twice clears both. That makes the statistic
    order-independent and oracle-hash-exact (the SQL mirror is
    ``CAST(FLOOR(4*mad(v)+0.5) AS BIGINT)``; DuckDB's mad uses the
    same interpolated median, verified).

    Same bucketed shape as ``grouped_quantiles(method="exact")``:
    whole key groups co-locate via the hash exchange, then TWO
    lexsorts per bucket (values, then per-group deviations) and four
    gathers produce every group's MAD — no per-key loop. Output:
    (key, mad4)."""
    import pandas as pd

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        v = g[value_col].to_numpy().astype(np.int64)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        n = len(k)
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        sizes = np.diff(np.r_[starts, n])
        lo = (sizes - 1) // 2
        hi = sizes // 2
        m2 = v[starts + lo] + v[starts + hi]        # 2·median, exact int
        inv = np.repeat(np.arange(len(starts)), sizes)
        d = np.abs(2 * v - m2[inv])                 # |2v − 2·median|
        d = d[np.lexsort((d, inv))]                 # re-sort within groups
        mad4 = d[starts + lo] + d[starts + hi]      # 2·median(d) = 4·MAD
        return pd.DataFrame({key: k[starts], "mad4": mad4})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, num_buckets).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def grouped_iqr_outliers(ds: Dataset, key: str,
                         value_col: str) -> Dataset:
    """Tukey-fence outlier counts per group — rows outside
    ``[q1 − 1.5·IQR, q3 + 1.5·IQR]``, the standard robust
    data-quality screen. ``value_col`` must be int64 (fixed-point
    upstream).

    Exactness: quartiles of ints are dyadic rationals with
    denominator 4, so both fences have denominator 8 and the test
    runs in pure integers — ``8v < 2·q1₄ − 3·IQR₄`` (low) /
    ``8v > 2·q3₄ + 3·IQR₄`` (high), where ``q₄ = 4·quantile`` (an
    exact int: dyadic fractions are float64-exact) and
    ``IQR₄ = q3₄ − q1₄``. Bit-identical in any engine; caller
    contract |8v| < 2⁶³.

    Two passes: quartiles via ``grouped_quantiles(method="exact")``
    (bounded by |groups|, pulled once, broadcast via ``ray.put``),
    then one counting scan with block partials — the fact rows never
    shuffle. Output: (key, n_low, n_high, n_outliers)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    q = grouped_quantiles(ds, key, value_col, [0.25, 0.75]).to_pandas()
    q14 = np.floor(4 * q["q25"].to_numpy() + 0.5).astype(np.int64)
    q34 = np.floor(4 * q["q75"].to_numpy() + 0.5).astype(np.int64)
    iqr4 = q34 - q14
    low8 = 2 * q14 - 3 * iqr4
    high8 = 2 * q34 + 3 * iqr4
    karr = pa.array(q[key])
    ref = _ray.put((karr, low8, high8))

    def partial(batch: pa.Table) -> pa.Table:
        keys, lo, hi = _ray.get(ref)
        idx_arr = pc.index_in(batch[key], value_set=keys)
        if idx_arr.null_count:
            raise AssertionError("group key missing from quartiles")
        idx = idx_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        v8 = 8 * batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = len(keys)
        nl = np.zeros(g, dtype=np.int64)
        nh = np.zeros(g, dtype=np.int64)
        np.add.at(nl, idx, (v8 < lo[idx]).astype(np.int64))
        np.add.at(nh, idx, (v8 > hi[idx]).astype(np.int64))
        return pa.table({key: keys, "n_low": pa.array(nl),
                         "n_high": pa.array(nh)})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(key).aggregate(Sum("n_low", alias_name="n_low"),
                                   Sum("n_high", alias_name="n_high")))

    def total(batch: pa.Table) -> pa.Table:
        s = pc.add(batch["n_low"], batch["n_high"])
        return batch.append_column("n_outliers", s)

    return agg.map_batches(total, batch_format="pyarrow",
                           zero_copy_batch=True)


def grouped_moments(ds: Dataset, key: str, value_col: str) -> Dataset:
    """Per-group COUNT / SUM / SUM-of-squares of an integer column —
    the exact building blocks of mean, variance and stddev
    (``var_samp = (n·ss − s²) / (n·(n−1))``), kept in int64 end to end
    so the grouped statistics are order-independent and oracle-exact
    (float streaming variance differs in the last ulp between engines).

    Block-local partials: one ``pc.index_in`` coding + three
    ``np.add.at`` scatters per batch, so ≤ groups × blocks rows reach
    the small groupby-sum exchange. Caller contract: value² × rows per
    group must stay below 2⁶³ (raise/scale upstream otherwise — at
    n_chars-like magnitudes that is ~10¹² rows per group)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        uniq = pc.unique(k)
        code = pc.index_in(k, uniq).to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = len(uniq)
        n = np.bincount(code, minlength=g).astype(np.int64)
        s = np.zeros(g, dtype=np.int64)
        np.add.at(s, code, v)
        ss = np.zeros(g, dtype=np.int64)
        np.add.at(ss, code, v * v)
        return pa.table({key: uniq, "n": pa.array(n),
                         "s": pa.array(s), "ss": pa.array(ss)})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(key)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="s"),
                       Sum("ss", alias_name="ss")))


def grouped_comoments(ds: Dataset, key: str, x_col: str,
                      y_col: str) -> Dataset:
    """Per-group bivariate moment sums — the exact int64 building blocks
    of covariance, correlation and OLS slope:

        cov_samp  = (n·sxy − sx·sy) / (n·(n−1))
        corr      = (n·sxy − sx·sy) /
                    sqrt((n·sxx − sx²)·(n·syy − sy²))
        ols_slope = (n·sxy − sx·sy) / (n·sxx − sx²)

    Same discipline as ``grouped_moments``: x and y must already be
    integers (fixed-point-encode floats upstream), every sum is int64
    and therefore order-independent / oracle-hash-exact. Output columns:
    (key, n, sx, sy, sxx, syy, sxy). Caller contract:
    max(x², y², |x·y|) × rows per group < 2⁶³."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        uniq = pc.unique(k)
        code = pc.index_in(k, uniq).to_numpy(zero_copy_only=False)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = len(uniq)
        n = np.bincount(code, minlength=g).astype(np.int64)
        cols = {"n": n}
        for name, v in (("sx", x), ("sy", y), ("sxx", x * x),
                        ("syy", y * y), ("sxy", x * y)):
            acc = np.zeros(g, dtype=np.int64)
            np.add.at(acc, code, v)
            cols[name] = acc
        out = {key: uniq}
        out.update({c: pa.array(v) for c, v in cols.items()})
        return pa.table(out)

    names = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(key)
            .aggregate(*[Sum(c, alias_name=c) for c in names]))


def grouped_string_agg(ds: Dataset, key: str, value_col: str,
                       order_col: str, sep: str = ",",
                       num_buckets: int = 64) -> Dataset:
    """SQL ``string_agg(value, sep ORDER BY order_col)`` per group —
    deterministic because the concatenation order is the explicit
    ``order_col`` sort, never physical row order (an unordered
    string_agg is not reproducible across engines or runs).

    Whole key groups co-locate via the hash-bucket exchange; the kernel
    sorts once per bucket by (key, order_col) and joins each segment's
    strings. The per-group join is Python-level string work (inherent
    to the operator — the output IS one Python string per group), but
    everything before it is one vectorized sort, and only (key, value,
    order) columns travel. Scale contract: one group's concatenated
    output must fit a task — cap or shard upstream for pathological
    groups, as with any collect-list. Output: (key, agg)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"]).sort_values([key, order_col],
                                                     kind="stable")
        out = (g.groupby(key, sort=True)[value_col]
               .agg(lambda s: sep.join(s.astype(str))))
        return out.rename("agg").reset_index()

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, num_buckets).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def rollup_aggregate(ds: Dataset, keys: list[str], value_col: str,
                     all_label: str = "(all)") -> pa.Table:
    """SQL ``GROUP BY ROLLUP(k1, k2, …)``: count + sum at every
    hierarchical grain (k1,k2,…), (k1,…), …, () — one row set with the
    rolled-up key columns set to ``all_label`` (distinguishable from
    real values by contract; the SQL mirror is
    ``COALESCE(k, all_label)`` + ROLLUP).

    Scale shape: the DATA is touched exactly once — a single Ray
    groupby at the FINEST grain (block pre-aggregation applies as
    usual); every coarser grain re-aggregates the finest RESULT, whose
    cardinality is ≤ ∏|kᵢ| regardless of input size. The driver-side
    derivation is therefore bounded by key cardinality, not data size
    (the distinct_count(num_buckets=1) driver-merge contract); for
    ~10⁹-group finest grains run the coarser grains as further small
    Ray groupbys instead. ``value_col`` must already be int64
    (fixed-point upstream) so every subtotal is order-independent.
    Returns an Arrow table (k1, …, kn, n, s)."""
    sets = [keys[:depth] for depth in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, value_col, sets, all_label)


def cube_aggregate(ds: Dataset, keys: list[str], value_col: str,
                   all_label: str = "(all)") -> pa.Table:
    """SQL ``GROUP BY CUBE(k1, …, kn)`` — count + sum at EVERY subset
    of the keys (2ⁿ grouping sets). Same one-data-pass shape as
    ``rollup_aggregate``: one Ray groupby at the finest grain, every
    coarser set derived from that ≤ ∏|kᵢ|-row result."""
    from itertools import combinations
    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_aggregate(ds, keys, value_col, sets, all_label)


def grouping_sets_aggregate(ds: Dataset, keys: list[str],
                            value_col: str, sets: list[list[str]],
                            all_label: str = "(all)") -> pa.Table:
    """SQL ``GROUP BY GROUPING SETS(…)`` — the general form behind
    ROLLUP and CUBE. Each entry of ``sets`` is a subset of ``keys``
    (order within a set is irrelevant); rolled-up key columns carry
    ``all_label``.

    Scale shape (shared by rollup/cube): the DATA is touched exactly
    once — a single Ray groupby at the finest grain ``keys`` (block
    pre-aggregation applies as usual); every requested set
    re-aggregates that finest RESULT, whose cardinality is ≤ ∏|kᵢ|
    regardless of input size, on the driver. For ~10⁹-group finest
    grains run each set as a further small Ray groupby instead.
    ``value_col`` must already be int64 (fixed-point upstream) so
    every subtotal is order-independent."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum
    known = set(keys)
    for s in sets:
        if not set(s) <= known:
            raise ValueError(f"grouping set {s} not a subset of {keys}")
    finest = (ds.groupby(keys)
              .aggregate(Count(alias_name="n"),
                         Sum(value_col, alias_name="s"))
              .to_pandas())
    frames = []
    for s in sets:
        kept = [k for k in keys if k in set(s)]
        if len(kept) == len(keys):
            g = finest.copy()
        elif kept:
            g = finest.groupby(kept, as_index=False)[["n", "s"]].sum()
        else:
            g = finest[["n", "s"]].sum().to_frame().T
        for dropped in (k for k in keys if k not in set(s)):
            g[dropped] = all_label
        frames.append(g[keys + ["n", "s"]])
    out = pd.concat(frames, ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    out["s"] = out["s"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def grouped_collect_list(ds: Dataset, key: str, value_col: str,
                         order_col: str,
                         num_buckets: int = 64) -> Dataset:
    """SQL ``list(value ORDER BY order_col)`` per group — the typed
    sibling of ``grouped_string_agg``: one ``list<T>`` row per key,
    elements in explicit ``order_col`` order (deterministic under any
    physical row order; ties broken by value for total determinism).

    Fully vectorized: per co-located hash bucket, ONE lexsort, then the
    list column is built zero-copy from (offsets, sorted values) via
    ``pa.ListArray.from_arrays`` — no per-group Python loop, unlike the
    string join (whose output is inherently a Python string). Scale
    contract: one group's list must fit a task (same as any
    collect-list). Output: (key, vals:list<T>)."""

    def kernel(g) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        k = g[key].to_numpy(zero_copy_only=False)
        v = g[value_col].combine_chunks() \
            if isinstance(g[value_col], pa.ChunkedArray) else g[value_col]
        o = g[order_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((v.to_numpy(zero_copy_only=False), o, k))
        k = k[order]
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        offsets = np.r_[starts, len(k)].astype(np.int32)
        vals = pa.ListArray.from_arrays(
            pa.array(offsets), v.take(pa.array(order)))
        return pa.table({key: pa.array(k[starts]), "vals": vals})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, num_buckets).groupby("__bucket")
            .map_groups(kernel, batch_format="pyarrow"))


def count_histogram(ds: Dataset, key_col: str,
                    num_buckets: int | None = None,
                    total_keys: int | None = None) -> pa.Table:
    """TPC-H Q13 shape: the DISTRIBUTION of per-key occurrence counts —
    one output row per distinct count value c with the number of keys
    occurring exactly c times. ``total_keys`` (the dimension-table
    cardinality, metadata-cheap on a parquet read) adds the zero-count
    row: keys in the dimension that never occur in ``ds`` (requires the
    fact keys ⊆ dimension keys — the engine's referential validator is
    the guard for that assumption).

    Scale shape: rides ``duplicate_key_counts``'s packed-cell exchange
    with a per-bucket ``finalize`` that histograms the counts INSIDE
    each bucket task (complete key groups per bucket make per-key
    counts final there), so the driver merges ≤ buckets × |distinct
    count values| tiny rows — never |keys| rows. Returns (cnt,
    num_keys) sorted by cnt."""
    import pandas as pd
    from bigdime_ray.stages.shuffle import duplicate_key_counts

    def hist(keys: np.ndarray, cnts: np.ndarray) -> pd.DataFrame:
        u, n = np.unique(cnts, return_counts=True)
        return pd.DataFrame({"cnt": u.astype(np.int64),
                             "num_keys": n.astype(np.int64)})

    part = duplicate_key_counts(ds, key_col, min_count=1,
                                num_buckets=num_buckets, finalize=hist)
    oc = part["cnt"].to_numpy()
    nk = part["num_keys"].to_numpy()
    u, inv = np.unique(oc, return_inverse=True)
    acc = np.zeros(len(u), dtype=np.int64)
    np.add.at(acc, inv, nk)
    if total_keys is not None:
        zero = int(total_keys) - int(acc.sum())
        if zero < 0:
            raise ValueError(
                f"fact has {int(acc.sum())} distinct keys but total_keys="
                f"{total_keys}: fact keys are not a subset of the dimension")
        if zero > 0:
            u = np.r_[np.int64(0), u]
            acc = np.r_[np.int64(zero), acc]
    return pa.table({"cnt": pa.array(u.astype(np.int64)),
                     "num_keys": pa.array(acc)})


def grouped_mode(ds: Dataset, key: str, value_col: str) -> pa.Table:
    """Per-key MODE: the most frequent value, ties broken toward the
    SMALLEST value (deterministic across engines — an unspecified-tie
    mode is not reproducible). Returns (key, mode, cnt).

    The data is touched once: a Ray groupby on (key, value) with Count
    (block pre-aggregation applies as usual), so only ≤ |key × value|
    pair-count rows leave the shuffle. The argmax runs on the driver
    over that pair table — bounded by PAIR CARDINALITY, not row count
    (the rollup_aggregate contract); for unbounded value domains run
    ``heavy_hitters`` per key instead."""
    import pandas as pd
    from ray.data.aggregate import Count
    pairs = (ds.groupby([key, value_col])
             .aggregate(Count(alias_name="cnt")).to_pandas())
    pairs = pairs.sort_values([key, value_col], kind="stable")
    pairs = pairs.sort_values([key, "cnt"], kind="stable",
                              ascending=[True, False])
    first = pairs.groupby(key, as_index=False, sort=True).first()
    first = first.rename(columns={value_col: "mode"})
    first["cnt"] = first["cnt"].astype(np.int64)
    return pa.Table.from_pandas(first[[key, "mode", "cnt"]],
                                preserve_index=False)


def grouped_approx_distinct(ds: Dataset, group_col: str, key_col: str,
                            p: int = 8,
                            num_buckets: int | None = None) -> pa.Table:
    """Per-group APPROXIMATE COUNT(DISTINCT key) via grouped
    HyperLogLog — the 10¹²-scale sibling of ``grouped_distinct_count``
    for when exact per-group key ranges are too wide: each group costs
    a FIXED 2^p bytes (p=8 → 256 B, ~6.5 % relative error) no matter
    how many distinct keys it holds, and register merges are exact
    elementwise maxima, so the estimate is PARTITION-INVARIANT
    (identical result for any block split — pinned by test).

    Block partial: one (n_groups × 2^p) uint8 register matrix via a
    single ``np.maximum.at`` scatter (``state/sketches.py::
    hll_index_rank`` supplies index+rank vectorized). The exchange
    moves one 2^p-byte cell per (block, group) — group-hash bucketed;
    per-bucket merges are ``np.maximum.reduceat`` over row-stacked
    registers. Returns (group, approx_distinct int64)."""
    from bigdime_ray.functions.hashing import column_hashes, mix64
    from bigdime_ray.stages.shuffle import _auto_buckets
    from bigdime_ray.state.sketches import (hll_estimate_rows,
                                            hll_index_rank)

    num_buckets = _auto_buckets(ds, num_buckets)
    m = 1 << p

    def pack(batch: pa.Table) -> pa.Table:
        # null group values are DROPPED (documented: merge_group sorts
        # group values, and None/NaN neither sort nor merge sanely;
        # SQL's NULL group has no useful distinct-count semantics here)
        batch = batch.filter(pc.is_valid(batch[group_col]))
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        uniq = pc.unique(g)
        code = pc.index_in(g, uniq).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = column_hashes(batch[key_col])
        idx, rank = hll_index_rank(h, p)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (code, idx), rank)
        gh = column_hashes(uniq).view(np.uint64)
        b = (mix64(gh) % np.uint64(max(num_buckets, 1))).astype(np.int32)
        return pa.table({
            "bucket": pa.array(b),
            "g": uniq,
            "regs": pa.array([regs[i].tobytes()
                              for i in range(len(uniq))],
                             type=pa.binary())})

    cells = ds.map_batches(pack, batch_format="pyarrow",
                           zero_copy_batch=True)

    def merge_group(df):
        import pandas as pd
        gvals = df["g"].to_numpy()
        regs = np.frombuffer(b"".join(df["regs"]),
                             dtype=np.uint8).reshape(len(df), m)
        order = np.argsort(gvals, kind="stable")
        gvals, regs = gvals[order], regs[order]
        bounds = np.nonzero(np.r_[True, gvals[1:] != gvals[:-1]])[0]
        merged = np.maximum.reduceat(regs, bounds, axis=0)
        est = hll_estimate_rows(merged)
        return pd.DataFrame({
            "g": gvals[bounds],
            "approx_distinct": np.floor(est + 0.5).astype(np.int64)})

    out = (cells.groupby("bucket")
           .map_groups(lambda df: merge_group(df.drop(columns=["bucket"])),
                       batch_format="pandas").to_pandas())
    if len(out) == 0 or "g" not in out.columns:
        # empty Datasets lose their schema through to_pandas()
        return pa.table({
            group_col: pa.array([], type=ds.schema()
                                .field(group_col).type),
            "approx_distinct": pa.array([], type=pa.int64())})
    out = out.sort_values("g").reset_index(drop=True)
    return pa.table({group_col: pa.array(out["g"]),
                     "approx_distinct": pa.array(
                         out["approx_distinct"].to_numpy()
                         .astype(np.int64))})
