"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time windows/watermarks (it's a batch engine); the
reference's streaming side (Kafka source, channel) is likewise out of
scope per ``BASELINE.json:15`` (batch table input). These operators
implement the standard stream *shapes* the engine's users need over an
``events``-style table, with the documented ordering assumption: events
are grouped per key and sorted by ``ts`` *within the group* (the
``groupby(key).map_groups`` stage enforces the sort itself, so the input
needs no global order).

- ``tumbling_window``  — fixed-size windows via vectorized ts truncation
  + grouped aggregate (no map_groups; pure shuffle-agg)
- ``running_aggregate`` — per-key ordered cumulative sum (window-function
  shape; ``SUM(...) OVER (PARTITION BY key ORDER BY ts)``)
- ``session_windows``  — gap-based sessionization per key
- ``asof_join_grouped`` — per-key as-of join (each left row matched to
  the latest right row with ts ≤ left ts): ONE co-partitioning shuffle
  of the two tagged narrow projections, then a vectorized searchsorted
  inside each group. Partitioning assumption: a single key's rows fit a
  task (salt the key upstream if a key is pathologically hot).
- ``asof_join_packed`` / ``asof_join_packed_tagged`` — the int64-key
  fast path: packed binary cells through the shuffle instead of rows
  (#blocks × #buckets cells); the tagged variant does it from ONE scan
  when both sides live in the same table. Optional ``tolerance_us``
  bounds the match window (attribution semantics).
- ``interval_overlap_count`` — range-join aggregate: per-event count of
  covering [lo, hi] intervals of the same key, exact under arbitrary
  overlap via two merged-lexsort ranks (#lo≤ts − #hi<ts), no pair
  enumeration and no per-key loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Sum


def _buckets(root: Dataset, num_buckets: int | None) -> int:
    """Resolve the kernel family's ``num_buckets=None`` default from
    plan-time row counts (VERDICT r4 #2): rows-proportional buckets with
    a parallelism floor — see ``stages.shuffle.resolve_group_buckets``.
    ``root`` must be the read-rooted input (count() is metadata-cheap
    there); callers with derived inputs pin ``num_buckets``."""
    from bigdime_ray.stages.shuffle import resolve_group_buckets
    return resolve_group_buckets(root, num_buckets)


def tumbling_window(ds: Dataset, key: str, ts_col: str, value_col: str,
                    unit: str = "hour") -> Dataset:
    """Per (key, window) count + sum. ``unit`` is an Arrow
    ``floor_temporal`` unit (minute/hour/day/...)."""

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=unit)
        return (batch.select([key, value_col])
                .append_column("window_start", w))

    return (ds.map_batches(add_window, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([key, "window_start"])
            .aggregate(Count(alias_name="cnt"),
                       Sum(value_col, alias_name="total")))


def _segment_starts(k: np.ndarray) -> np.ndarray:
    return np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]


def running_aggregate(ds: Dataset, key: str, ts_col: str, value_col: str,
                      order_tiebreak: str | None = None,
                      num_buckets: int | None = None) -> Dataset:
    """Per-key cumulative sum in ts order (deterministic tie-break by
    ``order_tiebreak``). One shuffle co-partitions hash BUCKETS of keys;
    inside a bucket the kernel is one lexsort + a vectorized segmented
    cumsum (global cumsum minus each segment's starting offset)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        keys = [g[ts_col].to_numpy()]
        if order_tiebreak:
            keys.insert(0, g[order_tiebreak].to_numpy())
        k = g[key].to_numpy()
        order = np.lexsort(tuple(keys) + (k,))
        g = g.iloc[order].reset_index(drop=True)
        v = g[value_col].to_numpy()
        cs = np.cumsum(v)
        starts = _segment_starts(g[key].to_numpy())
        offset = np.repeat(cs[starts] - v[starts],
                           np.diff(np.r_[starts, len(v)]))
        g["running_total"] = cs - offset
        return g

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def session_windows(ds: Dataset, key: str, ts_col: str,
                    gap_seconds: float, value_col: str | None = None,
                    num_buckets: int | None = None) -> Dataset:
    """Gap-based sessions per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``. Returns one row per
    session: key, session_id (0-based per key), n_events, session_start,
    session_end (+ value sum when ``value_col``). Bucketed vectorized
    kernel: lexsort by (key, ts), session breaks at key changes OR
    over-gap diffs, per-session aggregates via ``reduceat``."""
    gap_us = int(gap_seconds * 1_000_000)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        order = np.lexsort((ts, k))
        k, ts = k[order], ts[order]
        ti = ts.view(np.int64)
        new_key = np.r_[True, k[1:] != k[:-1]]
        brk = new_key | np.r_[False, (ti[1:] - ti[:-1]) > gap_us]
        starts = np.nonzero(brk)[0]
        ends = np.r_[starts[1:], len(k)]
        # 0-based session id per key: global cumulative break count
        # minus the count at the key's first row
        sid_all = np.cumsum(brk) - 1
        key_starts = np.nonzero(new_key)[0]
        base = sid_all[key_starts]
        per_row_base = np.repeat(base, np.diff(np.r_[key_starts, len(k)]))
        sid = sid_all - per_row_base
        out = {
            key: k[starts],
            "session_id": sid[starts].astype(np.int64),
            "n_events": (ends - starts).astype(np.int64),
            "session_start": ts[starts],
            "session_end": ts[ends - 1],
        }
        if value_col:
            v = g[value_col].to_numpy()[order]
            out["value_total"] = np.add.reduceat(v, starts)
        return pd.DataFrame(out)

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def hopping_window(ds: Dataset, key: str, ts_col: str, value_col: str,
                   size_seconds: int, hop_seconds: int) -> Dataset:
    """Overlapping (hopping) windows: each event lands in
    ``size/hop`` windows; rows are replicated vectorized per batch with
    their window starts, then aggregated with the same shuffle as the
    tumbling window. Requires size % hop == 0."""
    assert size_seconds % hop_seconds == 0, "size must be a multiple of hop"
    k = size_seconds // hop_seconds
    hop_us = hop_seconds * 1_000_000
    import numpy as np

    def explode(batch: pa.Table) -> pa.Table:
        t = (batch[ts_col].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").view(np.int64))
        last = (t // hop_us) * hop_us  # latest window containing the event
        n = len(t)
        offs = np.arange(k, dtype=np.int64) * hop_us
        starts = np.repeat(last, k) - np.tile(offs, n)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        return pa.table({
            key: batch[key].take(idx),
            "window_start": pa.array(starts.astype("datetime64[us]"),
                                     type=pa.timestamp("us")),
            value_col: batch[value_col].take(idx)})

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)
    return (exploded.groupby([key, "window_start"])
            .aggregate(Count(alias_name="cnt"),
                       Sum(value_col, alias_name="total")))


def asof_join_grouped(left: Dataset, right: Dataset, key: str, ts_col: str,
                      left_id: str, right_id: str,
                      out_col: str = "matched_id",
                      num_buckets: int | None = None) -> Dataset:
    """As-of join: for every left row, the right row of the SAME key
    with the greatest ts ≤ left.ts (SQL: ``ASOF LEFT JOIN ... ON
    l.key = r.key AND l.ts >= r.ts``). No match → null. Ties on right
    ts resolve to the max id (deterministic; mirror in a SQL oracle by
    pre-aggregating the right side per (key, ts)).

    Both sides project to (key, ts, id, side) tagged with a hash
    BUCKET; ONE shuffle co-partitions them into ``num_buckets`` groups
    (not one group per key — per-key map_groups paid ~0.2 ms of pandas
    overhead per key), and each bucket runs a fully vectorized
    multi-key kernel: lexsort by (key, ts, side) with rights before
    lefts at equal ts, then a positional ``maximum.accumulate``
    forward-fill of right-row indices; a filled index pointing at a
    different key's row means "no right row of MY key precedes me"
    (positions are monotone, so any in-key candidate would have won the
    cummax) → null. No-match is NaN directly (negative ids are legal;
    float64 caps exact ids at 2^53 — documented)."""
    from bigdime_ray.functions.hashing import column_hashes
    num_buckets = _buckets(left, num_buckets)

    def tag(id_col: str, side: int):
        def fn(b: pa.Table) -> pa.Table:
            kcol = b[key]
            kh = column_hashes(kcol)
            return pa.table({
                "bucket": pa.array((kh % np.uint64(num_buckets))
                                   .astype(np.int32)),
                "k": kcol, "ts": b[ts_col],
                "rid": pc.cast(b[id_col], pa.int64()),
                "side": pa.array(
                    np.full(b.num_rows, side, dtype=np.int8))})
        return fn

    u = (left.map_batches(tag(left_id, 0), batch_format="pyarrow",
                          zero_copy_batch=True)
         .union(right.map_batches(tag(right_id, 1), batch_format="pyarrow",
                                  zero_copy_batch=True)))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ks, tss, idl, matched = _asof_kernel(
            g["k"].to_numpy(), g["ts"].to_numpy(), g["rid"].to_numpy(),
            g["side"].to_numpy())
        return pd.DataFrame({"k": ks, "ts": tss, left_id: idl,
                             out_col: matched})

    return u.groupby("bucket").map_groups(join_bucket,
                                          batch_format="pandas")


def _asof_kernel(k: np.ndarray, ts: np.ndarray, ids: np.ndarray,
                 side: np.ndarray, tolerance: int | None = None
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized as-of core over one co-located group: rights before
    lefts at equal (k, ts), positional ``maximum.accumulate``
    forward-fill, cross-key fills nulled. ``tolerance`` (same unit as
    ts; µs for timestamps) bounds the match window: a right row older
    than ``left.ts - tolerance`` is no match (pandas ``merge_asof
    tolerance`` / attribution-window semantics). Returns (k, ts, id,
    matched float64) for the LEFT rows; no-match is NaN."""
    n = len(k)
    # rights before lefts at equal (k, ts); rights at equal ts sort
    # by id ascending so the cummax lands on the max id
    order = np.lexsort((ids, -side.astype(np.int8), ts, k))
    ks, tss, idss, sides = k[order], ts[order], ids[order], side[order]
    pos = np.arange(n, dtype=np.int64)
    src = np.where(sides == 1, pos, -1)
    filled = np.maximum.accumulate(src)
    lmask = sides == 0
    matched = np.full(int(lmask.sum()), np.nan, dtype=np.float64)
    fidx = filled[lmask]
    ok = fidx >= 0
    if ok.any():
        same_key = ks[fidx[ok]] == ks[lmask][ok]
        if tolerance is not None:
            # the cummax candidate is the LATEST prior right row, so if
            # it is outside the window no earlier one can be inside
            ts_np = np.asarray(tss).astype(np.int64, copy=False)
            lts = ts_np[lmask][ok]
            rts = ts_np[fidx[ok]]
            same_key = same_key & (lts - rts <= int(tolerance))
        take = np.nonzero(ok)[0][same_key]
        matched[take] = idss[fidx[ok][same_key]].astype(np.float64)
    return ks[lmask], tss[lmask], idss[lmask], matched


def asof_join_packed(left: Dataset, right: Dataset, key: str, ts_col: str,
                     left_id: str, right_id: str,
                     out_col: str = "matched_id",
                     num_buckets: int | None = None,
                     tolerance_us: int | None = None) -> Dataset:
    """Packed-cell as-of join — the int64-key fast path.

    Same semantics as ``asof_join_grouped``, different exchange: each
    block emits ONE binary cell per hash bucket holding its packed
    (k, ts, id) int64 arrays plus a side tag, so the shuffle moves
    #blocks × #buckets cells instead of every row through Ray's
    sort-shuffle (the ``duplicate_key_counts`` economics — measured
    ~2.5× end-to-end at 40k rows where fixed shuffle overhead
    dominates, and the gap widens with row count). Each bucket's merge
    concatenates its cells and runs the same ``_asof_kernel``.
    Requires integer key/ids and timestamp[us]-compatible ts;
    ``asof_join_grouped`` remains the generic-key path. Equivalence is
    pinned in tests/test_stream_topk.py.
    """
    from bigdime_ray.functions.hashing import mix64
    num_buckets = _buckets(left, num_buckets)

    empty_cells = pa.table({
        "bucket": pa.array([], type=pa.int32()),
        "k": pa.array([], type=pa.binary()),
        "ts": pa.array([], type=pa.binary()),
        "rid": pa.array([], type=pa.binary()),
        "side": pa.array([], type=pa.int8())})

    def pack(id_col: str, side: int):
        def fn(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(k) == 0:
                return empty_cells
            ts = (b[ts_col].to_numpy(zero_copy_only=False)
                  .astype("datetime64[us]").view(np.int64))
            rid = b[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            bkt = (mix64(k.view(np.uint64)) % np.uint64(num_buckets)) \
                .astype(np.int32)
            order = np.argsort(bkt, kind="stable")
            bs = bkt[order]
            ks, tss, rids = k[order], ts[order], rid[order]
            bounds = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
            ends = np.r_[bounds[1:], len(bs)]
            return pa.table({
                "bucket": pa.array(bs[bounds], type=pa.int32()),
                "k": pa.array([ks[s:e].tobytes()
                               for s, e in zip(bounds, ends)],
                              type=pa.binary()),
                "ts": pa.array([tss[s:e].tobytes()
                                for s, e in zip(bounds, ends)],
                               type=pa.binary()),
                "rid": pa.array([rids[s:e].tobytes()
                                 for s, e in zip(bounds, ends)],
                                type=pa.binary()),
                "side": pa.array(
                    np.full(len(bounds), side, dtype=np.int8))})
        return fn

    cells = (left.map_batches(pack(left_id, 0), batch_format="pyarrow",
                              zero_copy_batch=True)
             .union(right.map_batches(pack(right_id, 1),
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)))
    return _asof_merge_cells(cells, left_id, out_col, tolerance_us)


def asof_join_packed_tagged(ds: Dataset, key: str, ts_col: str,
                            id_col: str, side_col: str, left_value,
                            right_value, out_col: str = "matched_id",
                            num_buckets: int | None = None,
                            tolerance_us: int | None = None) -> Dataset:
    """``asof_join_packed`` over ONE input whose rows carry their side in
    ``side_col`` (e.g. an event_type column): a single scan + a single
    pack stage replace the two filtered reads — at 100 TB that halves
    bytes read when left and right live in the same table. Rows matching
    neither value are dropped in the pack (no pre-filter pass needed).
    """
    from bigdime_ray.functions.hashing import mix64
    num_buckets = _buckets(ds, num_buckets)

    def pack(b: pa.Table) -> pa.Table:
        sv = b[side_col]
        is_l = pc.equal(sv, left_value)
        is_r = pc.equal(sv, right_value)
        keep = pc.or_(is_l, is_r)
        b2 = b.filter(keep)
        if b2.num_rows == 0:
            return _ASOF_EMPTY_CELLS
        side_arr = np.where(
            pc.equal(b2[side_col], right_value).to_numpy(
                zero_copy_only=False), np.int8(1), np.int8(0))
        k = b2[key].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (b2[ts_col].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        rid = b2[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = (mix64(k.view(np.uint64)) % np.uint64(num_buckets)) \
            .astype(np.int32)
        # cells must be side-pure: sort by (bucket, side) and split on
        # either boundary
        order = np.lexsort((side_arr, bkt))
        bs, ss = bkt[order], side_arr[order]
        ks, tss, rids = k[order], ts[order], rid[order]
        brk = np.r_[True, (bs[1:] != bs[:-1]) | (ss[1:] != ss[:-1])]
        bounds = np.nonzero(brk)[0]
        ends = np.r_[bounds[1:], len(bs)]
        return pa.table({
            "bucket": pa.array(bs[bounds], type=pa.int32()),
            "k": pa.array([ks[s:e].tobytes()
                           for s, e in zip(bounds, ends)],
                          type=pa.binary()),
            "ts": pa.array([tss[s:e].tobytes()
                            for s, e in zip(bounds, ends)],
                           type=pa.binary()),
            "rid": pa.array([rids[s:e].tobytes()
                             for s, e in zip(bounds, ends)],
                            type=pa.binary()),
            "side": pa.array(ss[bounds], type=pa.int8())})

    cells = ds.map_batches(pack, batch_format="pyarrow",
                           zero_copy_batch=True)
    return _asof_merge_cells(cells, id_col, out_col, tolerance_us)


_ASOF_EMPTY_CELLS = pa.table({
    "bucket": pa.array([], type=pa.int32()),
    "k": pa.array([], type=pa.binary()),
    "ts": pa.array([], type=pa.binary()),
    "rid": pa.array([], type=pa.binary()),
    "side": pa.array([], type=pa.int8())})


def _asof_merge_cells(cells: Dataset, left_id: str,
                      out_col: str,
                      tolerance_us: int | None = None) -> Dataset:
    """Shared reduce leg: per-bucket concat of packed cells + the
    vectorized as-of kernel."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ks = [np.frombuffer(b, dtype=np.int64) for b in g["k"]]
        k = np.concatenate(ks)
        ts = np.concatenate([np.frombuffer(b, dtype=np.int64)
                             for b in g["ts"]])
        ids = np.concatenate([np.frombuffer(b, dtype=np.int64)
                              for b in g["rid"]])
        side = np.repeat(g["side"].to_numpy().astype(np.int8),
                         [len(a) for a in ks])
        kl, tsl, idl, matched = _asof_kernel(k, ts, ids, side,
                                             tolerance=tolerance_us)
        return pd.DataFrame({
            "k": kl, "ts": pd.Series(tsl.view("datetime64[us]")),
            left_id: idl, out_col: matched})

    return cells.groupby("bucket").map_groups(merge,
                                              batch_format="pandas")


def _rank_within_key(k_iv: np.ndarray, v_iv: np.ndarray,
                     k_ev: np.ndarray, v_ev: np.ndarray,
                     intervals_first_on_tie: bool) -> np.ndarray:
    """For every event (k, v): the number of interval values v_iv of the
    SAME key that precede it in the merged (k, value) order. With
    intervals winning ties → #(v_iv <= v); events winning → #(v_iv < v).
    One lexsort over the merged arrays — no per-key loop (the asof
    kernel's segment-base trick)."""
    n_iv, n_ev = len(k_iv), len(k_ev)
    k = np.concatenate([k_iv, k_ev])
    v = np.concatenate([v_iv, v_ev])
    is_ev = np.r_[np.zeros(n_iv, dtype=np.int8), np.ones(n_ev, dtype=np.int8)]
    tie = is_ev if intervals_first_on_tie else -is_ev
    order = np.lexsort((tie, v, k))
    ks, es = k[order], is_ev[order]
    c = np.cumsum(es == 0)  # intervals seen so far (inclusive)
    new_key = np.r_[True, ks[1:] != ks[:-1]]
    key_starts = np.nonzero(new_key)[0]
    base = c[key_starts] - (es[key_starts] == 0)
    per_row_base = np.repeat(base, np.diff(np.r_[key_starts, n_iv + n_ev]))
    ranks_sorted = c - per_row_base
    # map back to the original EVENT order
    out = np.empty(n_ev, dtype=np.int64)
    ev_pos = np.nonzero(es == 1)[0]
    out[order[ev_pos] - n_iv] = ranks_sorted[ev_pos]
    return out


def interval_overlap_count(events: Dataset, intervals: Dataset, key: str,
                           ts_col: str, lo_col: str, hi_col: str,
                           event_id: str, num_buckets: int | None = None) -> Dataset:
    """Range-join aggregate: for every event, the COUNT of intervals of
    the same key with ``lo <= ts <= hi`` (concurrency / active-session
    counting; SQL: LEFT JOIN ON k AND ts BETWEEN lo AND hi + COUNT).

    Handles arbitrarily overlapping intervals exactly without
    enumerating pairs: within each co-located bucket,
    ``count = #(lo <= ts) − #(hi < ts)`` per key, each side one
    vectorized merged-lexsort rank (``_rank_within_key``). The exchange
    is the same packed-cell pattern as ``asof_join_packed`` — binary
    cells per (block, bucket), never a row-level shuffle. Integer keys /
    ids; ts/lo/hi timestamp[us]-compatible.
    """
    from bigdime_ray.functions.hashing import mix64
    num_buckets = _buckets(events, num_buckets)

    empty_cells = pa.table({
        "bucket": pa.array([], type=pa.int32()),
        "k": pa.array([], type=pa.binary()),
        "a": pa.array([], type=pa.binary()),
        "b": pa.array([], type=pa.binary()),
        "side": pa.array([], type=pa.int8())})

    def _ts64(col) -> np.ndarray:
        return (col.to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").view(np.int64))

    def pack(side: int, a_col: str, b_col: str, b_is_ts: bool):
        def fn(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(k) == 0:
                return empty_cells
            a = _ts64(t[a_col])
            b = (_ts64(t[b_col]) if b_is_ts else
                 t[b_col].to_numpy(zero_copy_only=False).astype(np.int64))
            bkt = (mix64(k.view(np.uint64)) % np.uint64(num_buckets)) \
                .astype(np.int32)
            order = np.argsort(bkt, kind="stable")
            bs = bkt[order]
            ks, av, bv = k[order], a[order], b[order]
            bounds = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
            ends = np.r_[bounds[1:], len(bs)]
            return pa.table({
                "bucket": pa.array(bs[bounds], type=pa.int32()),
                "k": pa.array([ks[s:e].tobytes()
                               for s, e in zip(bounds, ends)],
                              type=pa.binary()),
                "a": pa.array([av[s:e].tobytes()
                               for s, e in zip(bounds, ends)],
                              type=pa.binary()),
                "b": pa.array([bv[s:e].tobytes()
                               for s, e in zip(bounds, ends)],
                              type=pa.binary()),
                "side": pa.array(np.full(len(bounds), side,
                                         dtype=np.int8))})
        return fn

    cells = (events.map_batches(pack(0, ts_col, event_id, False),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
             .union(intervals.map_batches(pack(1, lo_col, hi_col, True),
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        sides = g["side"].to_numpy().astype(np.int8)
        def cat(col, m):
            bufs = [np.frombuffer(b, dtype=np.int64)
                    for b, s in zip(g[col], sides) if s == m]
            return (np.concatenate(bufs) if bufs
                    else np.empty(0, dtype=np.int64))
        k_ev, ts_ev, id_ev = cat("k", 0), cat("a", 0), cat("b", 0)
        k_iv, lo_iv, hi_iv = cat("k", 1), cat("a", 1), cat("b", 1)
        n_lo = _rank_within_key(k_iv, lo_iv, k_ev, ts_ev, True)
        n_hi = _rank_within_key(k_iv, hi_iv, k_ev, ts_ev, False)
        return pd.DataFrame({
            key: k_ev, ts_col: pd.Series(ts_ev.view("datetime64[us]")),
            event_id: id_ev, "n_active": n_lo - n_hi})

    return cells.groupby("bucket").map_groups(merge,
                                              batch_format="pandas")


def lag_delta(ds: Dataset, key: str, ts_col: str, id_col: str,
              num_buckets: int | None = None) -> Dataset:
    """Per-key previous-event gap — the ``LAG(ts) OVER (PARTITION BY key
    ORDER BY ts, id)`` shape (inter-event time, a core feature for
    sessionization / bot detection / rate features).

    Returns the input rows plus ``delta_us`` (int64 µs since the key's
    previous event; -1 for the key's first event — encoded instead of
    null so the column stays a plain int64 through every engine).
    Bucketed vectorized kernel: one lexsort by (key, ts, id), one
    shifted diff, key-boundary rows reset — no per-key loop. The only
    shuffle co-partitions hash buckets of keys."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, ts.view(np.int64), k))
        k, ts, ids = k[order], ts[order], ids[order]
        n = len(k)
        delta = np.full(n, -1, dtype=np.int64)
        if n > 1:
            ti = ts.view(np.int64)
            delta[1:] = ti[1:] - ti[:-1]
            delta[np.r_[True, k[1:] != k[:-1]]] = -1
        elif n == 1:
            delta[0] = -1
        return pd.DataFrame({key: k, ts_col: ts, id_col: ids,
                             "delta_us": delta})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def sessionized_funnel(ds: Dataset, key: str, ts_col: str,
                       type_col: str, steps: list[str],
                       gap_seconds: float,
                       num_buckets: int | None = None) -> Dataset:
    """Ordered-event funnel WITHIN gap-based sessions: one row per
    (key, session) whose first occurrence of each step is strictly
    increasing step to step — the product-analytics conversion query
    with session scoping (the sessionless variant is one packed
    min-exchange; this composes the same min-per-step statistic with
    the session segmentation kernel).

    Session numbering matches ``session_windows`` (0-based per key,
    break when the gap to the previous event exceeds ``gap_seconds``).
    Per-step minima come from one masked ``np.minimum.reduceat`` per
    step over the session segments — no per-session loop. Returns
    (key, session_id, <step>_ts…) for completing sessions only.
    The one shuffle co-partitions key hash buckets; a key's rows must
    fit a task (salt upstream if pathological)."""
    gap_us = int(gap_seconds * 1_000_000)
    IDENT = np.iinfo(np.int64).max

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        et = g[type_col].to_numpy()
        order = np.lexsort((ts, k))
        k, ts, et = k[order], ts[order], et[order]
        n = len(k)
        out_cols = {key: k[:0], "session_id": ts[:0]}
        for s in steps:
            out_cols[f"{s}_ts"] = ts[:0].view("datetime64[us]")
        if n == 0:
            return pd.DataFrame(out_cols)
        new_key = np.r_[True, k[1:] != k[:-1]]
        brk = new_key | np.r_[False, (ts[1:] - ts[:-1]) > gap_us]
        starts = np.nonzero(brk)[0]
        sid_all = np.cumsum(brk) - 1
        key_starts = np.nonzero(new_key)[0]
        base = np.repeat(sid_all[key_starts],
                         np.diff(np.r_[key_starts, n]))
        sid = sid_all - base
        mins = []
        for s in steps:
            tm = np.where(et == s, ts, IDENT)
            mins.append(np.minimum.reduceat(tm, starts))
        ok = mins[-1] < IDENT
        for a, b in zip(mins[:-1], mins[1:]):
            ok &= a < b
        return pd.DataFrame({
            key: k[starts][ok],
            "session_id": sid[starts][ok].astype(np.int64),
            **{f"{s}_ts": m[ok].view("datetime64[us]")
               for s, m in zip(steps, mins)}})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def time_weighted_sum(ds: Dataset, key: str, ts_col: str, id_col: str,
                      value_col: str, scale: int = 10_000,
                      num_buckets: int | None = None) -> Dataset:
    """Per-key TIME-WEIGHTED aggregate — Σ value·Δt over the key's
    (ts, id)-ordered events, each value held until the NEXT event
    (the financial TWAP / telemetry duty-cycle shape).

    Returns one row per key with ≥ 2 events: ``n`` (event count),
    ``dur_us`` (last−first µs), ``num_s`` (Σ fixed-point value ×
    holding-µs — exact int64, order-independent) and ``twa_micro`` =
    num_s·100 // dur_us (the time-weighted average ×10⁶ when
    scale=10⁴, as one integer floor division). Keys with fewer than 2
    events or zero duration (all events at one timestamp) emit nothing
    (SQL parity: HAVING COUNT(*) ≥ 2 AND MAX(t) > MIN(t)).
    Bucketed vectorized kernel: one lexsort by (key, ts, id), one
    shifted diff, per-key segment sums via ``np.add.reduceat`` — no
    per-key loop; the only shuffle co-partitions key hash buckets.
    ``scale`` must divide 10⁶ (the twa_micro multiplier is 10⁶/scale
    as an exact integer; any other scale would silently truncate —
    review finding)."""
    if 1_000_000 % scale:
        raise ValueError(f"scale={scale} must divide 1_000_000 for an "
                         "exact twa_micro")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        ids = g[id_col].to_numpy()
        v = np.floor(g[value_col].to_numpy(dtype=np.float64)
                     * scale + 0.5).astype(np.int64)
        order = np.lexsort((ids, ts, k))
        k, ts, v = k[order], ts[order], v[order]
        n = len(k)
        empty = pd.DataFrame({key: k[:0], "n": ts[:0], "dur_us": ts[:0],
                              "num_s": ts[:0], "twa_micro": ts[:0]})
        if n < 2:
            return empty
        starts = np.r_[True, k[1:] != k[:-1]]
        bounds = np.nonzero(starts)[0]
        ends = np.r_[bounds[1:], n]
        seg_n = ends - bounds
        keep = (seg_n >= 2) & (ts[ends - 1] > ts[bounds])
        if not keep.any():
            return empty
        # holding time of each event = gap to the next event in-key
        # (the last event of a key holds nothing)
        gap = np.zeros(n, dtype=np.int64)
        gap[:-1] = ts[1:] - ts[:-1]
        gap[ends - 1] = 0
        contrib = v * gap
        # reduce over non-empty rows only (every segment non-empty here)
        num = np.add.reduceat(contrib, bounds)
        dur = ts[ends - 1] - ts[bounds]
        kk, nn, du, nu = k[bounds][keep], seg_n[keep], dur[keep], \
            num[keep]
        # num_s can exceed int64/100 (µs gaps are huge), so nu·100//du
        # must be split: q·100 + (r·100)//du — exact, overflow-free
        # (r < du ≤ span µs, so r·100 stays well under 2⁶³)
        mul = 1_000_000 // scale
        q, r = np.divmod(nu, du)
        twa = q * mul + (r * mul) // du
        return pd.DataFrame({key: kk, "n": nn.astype(np.int64),
                             "dur_us": du, "num_s": nu,
                             "twa_micro": twa})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def gap_fill_windows(agg: Dataset, key: str, widx_col: str,
                     value_cols: list[str], fill: int = 0,
                     num_buckets: int | None = None) -> Dataset:
    """Densify a windowed aggregate: for each key, emit EVERY window
    index in [key's min, key's max], filling absent windows with
    ``fill`` — training pipelines need gapless per-entity time series
    (a model can't learn \"no events this hour\" from a missing row).

    Input is an already-aggregated (key, window_idx, values…) dataset
    — one row per present (key, window); duplicates raise. Bucketed
    vectorized kernel: whole key groups co-locate, one lexsort by
    (key, widx), then each key's dense range materializes via
    repeat/cumsum arange arithmetic and the sparse values scatter into
    it — no per-key loop, no shuffle beyond the one bucket exchange.
    Scale contract: a key's dense span must fit a task (span is
    bounded by the window calendar — e.g. 10 years of hours is 87 600
    rows/key); total output is Σ spans, so budget blocks accordingly.
    Output: (key, widx, values…) with int64 values."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        w = g[widx_col].to_numpy().astype(np.int64)
        order = np.lexsort((w, k))
        k, w = k[order], w[order]
        n = len(k)
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        sizes = np.diff(np.r_[starts, n])
        # duplicate (key, window) rows would scatter-collide silently
        same_key = np.zeros(n, dtype=bool)
        same_key[1:] = k[1:] == k[:-1]
        if (same_key & np.r_[False, w[1:] == w[:-1]]).any():
            raise ValueError("gap_fill_windows input must hold one "
                             "row per (key, window)")
        lo = w[starts]
        hi = w[starts + sizes - 1]
        span = hi - lo + 1
        total = int(span.sum())
        span_starts = np.r_[0, np.cumsum(span)[:-1]]
        dense_k = np.repeat(k[starts], span)
        dense_w = (np.repeat(lo, span)
                   + np.arange(total, dtype=np.int64)
                   - np.repeat(span_starts, span))
        inv = np.repeat(np.arange(len(starts)), sizes)
        pos = span_starts[inv] + (w - lo[inv])
        out = {key: dense_k, widx_col: dense_w}
        for c in value_cols:
            v = g[c].to_numpy()[order].astype(np.int64)
            dense = np.full(total, fill, dtype=np.int64)
            dense[pos] = v
            out[c] = dense
        return pd.DataFrame(out)

    from bigdime_ray.stages.shuffle import add_hash_bucket
    # input is DERIVED (an aggregate): counting it would re-execute the
    # upstream plan, so auto resolves to the parallelism floor — pin
    # num_buckets when the (key × window) aggregate is itself huge
    return (add_hash_bucket(agg, key, _buckets(None, num_buckets))
            .groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def grouped_lag_lead(ds: Dataset, key: str, ts_col: str, id_col: str,
                     value_col: str, default: int = -1,
                     scale: int | None = None,
                     num_buckets: int | None = None) -> Dataset:
    """``LAG(v)`` and ``LEAD(v) OVER (PARTITION BY key ORDER BY ts,
    id)`` in ONE kernel pass — the previous/next event's value per key
    (rate-of-change and next-action features).

    ``default`` encodes the missing neighbor at each key's boundary
    (SQL ``LAG(v, 1, default)``), keeping both outputs plain null-free
    int64 across engines. ``scale`` fixed-point-encodes a float value
    column per row first (floor(v·scale+0.5)); values are SELECTED,
    never summed, so the encoding is exact. Bucketed vectorized
    kernel: one lexsort by (key, ts, id), two shifted copies,
    key-boundary rows reset. Returns (key, ts, id, lag_v, lead_v)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        ids = g[id_col].to_numpy()
        v = np.asarray(g[value_col].to_numpy())
        if scale is not None:
            v = np.floor(v.astype(np.float64) * scale + 0.5) \
                .astype(np.int64)
        else:
            v = v.astype(np.int64)
        order = np.lexsort((ids, ts.view(np.int64), k))
        k, ts, ids, v = k[order], ts[order], ids[order], v[order]
        n = len(k)
        lag = np.full(n, default, dtype=np.int64)
        lead = np.full(n, default, dtype=np.int64)
        if n > 1:
            lag[1:] = v[:-1]
            lead[:-1] = v[1:]
            boundary = k[1:] != k[:-1]
            lag[np.r_[True, boundary]] = default
            lead[np.r_[boundary, True]] = default
        return pd.DataFrame({key: k, ts_col: ts, id_col: ids,
                             "lag_v": lag, "lead_v": lead})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def rolling_window_sum(ds: Dataset, key: str, ts_col: str, value_col: str,
                       id_col: str, window_us: int,
                       scale: int | None = None,
                       num_buckets: int | None = None) -> Dataset:
    """Trailing-window aggregate: for every event, SUM(value) over the
    key's events with ts in ``[ts - window, ts]`` — SQL ``SUM(v) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW)``, peers at the current ts included on both sides.

    Exact and loop-free under arbitrary tie/window structure: within
    each co-located hash bucket the rows are lexsorted by (key, ts)
    once; the window's END index is the tie-run boundary of (key, ts);
    its START index is the merged-lexsort rank of ``ts - window`` among
    the key's timestamps (``_rank_within_key`` — the interval-overlap
    kernel); the sum is two gathers into one segmented prefix-sum array.
    ``scale`` fixed-point-encodes a float value column per row BEFORE
    the prefix sum (floor(v*scale+0.5) int64) so the windowed sums are
    integer-exact and order-independent — the repo-wide oracle
    discipline. Returns (key, ts, id, window_total)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        v = g[value_col].to_numpy()
        ids = g[id_col].to_numpy()
        ti = ts.view(np.int64)
        order = np.lexsort((ti, k))
        k, ti, v, ids = k[order], ti[order], v[order], ids[order]
        n = len(k)
        if scale is not None:
            v = np.floor(np.asarray(v, dtype=np.float64) * scale + 0.5) \
                .astype(np.int64)
        # prefix with a leading 0: sum of sorted rows [a, b) = cs0[b]-cs0[a]
        cs0 = np.zeros(n + 1, dtype=v.dtype)
        np.cumsum(v, out=cs0[1:])
        new_key = np.r_[True, k[1:] != k[:-1]]
        key_starts = np.nonzero(new_key)[0]
        seg_start = np.repeat(key_starts,
                              np.diff(np.r_[key_starts, n]))
        # window end: one past the last peer of this (key, ts) tie-run
        new_run = new_key | np.r_[True, ti[1:] != ti[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_ends = np.r_[np.nonzero(new_run)[0][1:], n]
        hi = run_ends[run_id]
        # window start: #(ts' < ts - window) within the key, as a rank
        lo_rank = _rank_within_key(k, ti, k, ti - int(window_us),
                                   intervals_first_on_tie=False)
        lo = seg_start + lo_rank
        out = {key: k, ts_col: pd.Series(ti.view("datetime64[us]")),
               id_col: ids, "window_total": cs0[hi] - cs0[lo]}
        return pd.DataFrame(out)

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def ntile(ds: Dataset, key: str, order_col: str, tiebreak: str,
          n_tiles: int, out_col: str = "tile",
          num_buckets: int | None = None) -> Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY order, tiebreak)``
    — quantile binning per group (curriculum bucketing / difficulty
    tiers over a corpus). 1-based tiles; when the group size n is not
    divisible by ``n_tiles`` the first ``n % n_tiles`` tiles get the
    extra row, exactly the SQL rule.

    Bucketed vectorized kernel: one lexsort per bucket, per-segment
    ranks via the segment-base trick, then the closed-form tile index —
    no per-key loop."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        v = g[order_col].to_numpy()
        tb = g[tiebreak].to_numpy()
        order = np.lexsort((tb, v, k))
        g = g.iloc[order].reset_index(drop=True)
        k = k[order]
        n = len(k)
        new_key = np.r_[True, k[1:] != k[:-1]]
        key_starts = np.nonzero(new_key)[0]
        sizes = np.diff(np.r_[key_starts, n])
        r = np.arange(n, dtype=np.int64) - np.repeat(key_starts, sizes)
        gsz = np.repeat(sizes, sizes)
        base = gsz // n_tiles          # small-tile size
        rem = gsz % n_tiles            # first `rem` tiles get base+1
        big_span = rem * (base + 1)    # rows covered by the big tiles
        in_big = r < big_span
        # guard base==0 (fewer rows than tiles): every tile is "big"
        safe_base = np.maximum(base, 1)
        tile = np.where(in_big, r // (base + 1),
                        rem + (r - big_span) // safe_base)
        g[out_col] = tile.astype(np.int64) + 1
        return g

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def grouped_rank(ds: Dataset, key: str, order_col: str, id_col: str,
                 descending: bool = False,
                 num_buckets: int | None = None) -> Dataset:
    """SQL ``RANK()`` and ``DENSE_RANK() OVER (PARTITION BY key ORDER BY
    order_col [DESC])`` in one pass. Ties share a rank (the SQL
    semantics), so the output is deterministic regardless of physical
    row order — no tiebreak column is needed for well-definedness,
    ``id_col`` only labels the output rows.

    Kernel (per co-located hash bucket): ONE lexsort over (key, ±v),
    then both ranks fall out of the tie-run starts vectorized across
    all groups — ``rank = last_run_start − segment_start + 1`` via a
    running ``maximum.accumulate`` of run-start indices (run starts
    include segment starts, so the accumulate never leaks across keys),
    ``dense_rank = runs-so-far-in-segment`` via a global cumsum of run
    starts re-based at each segment start. The same run boundaries give
    SQL ``PERCENT_RANK()`` = (rank−1)/(n−1) and ``CUME_DIST()`` =
    run_end/n for free; both are a SINGLE float64 division of exact
    integers, so their fixed-point encodings (``×10⁶``, columns
    ``pr_s`` / ``cd_s``) are bit-identical across engines. Output:
    (key, id, order_col, rank, dense_rank, pr_s, cd_s)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        v = g[order_col].to_numpy()
        ids = g[id_col].to_numpy()
        sv = -v if descending else v
        order = np.lexsort((sv, k))
        k, v, ids, sv = k[order], v[order], ids[order], sv[order]
        n = len(k)
        key_change = np.r_[True, k[1:] != k[:-1]]
        run_start = key_change | np.r_[False, sv[1:] != sv[:-1]]
        seg_starts = np.nonzero(key_change)[0]
        seg_sizes = np.diff(np.r_[seg_starts, n])
        seg_start = np.repeat(seg_starts, seg_sizes)
        seg_n = np.repeat(seg_sizes, seg_sizes)
        idx = np.arange(n, dtype=np.int64)
        last_run = np.maximum.accumulate(np.where(run_start, idx, -1))
        rank = last_run - seg_start + 1
        runs = np.cumsum(run_start)
        dense = runs - runs[seg_start] + 1
        # end (exclusive) of each tie run, broadcast back to its rows:
        # rows of one run share run id; run ends = next run's start
        starts = np.nonzero(run_start)[0]
        ends = np.r_[starts[1:], n]
        run_end = ends[runs - 1]
        # CUME_DIST counts rows ≤ current in the sort order, i.e. up to
        # the END of the current tie run, within the key segment
        cd = (run_end - seg_start).astype(np.float64) / seg_n
        pr = np.where(seg_n > 1,
                      (rank - 1).astype(np.float64)
                      / np.maximum(seg_n - 1, 1), 0.0)
        return pd.DataFrame({
            key: k, id_col: ids, order_col: v,
            "rank": rank, "dense_rank": dense,
            "pr_s": np.floor(pr * 1_000_000 + 0.5).astype(np.int64),
            "cd_s": np.floor(cd * 1_000_000 + 0.5).astype(np.int64)})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def rolling_rows_sum(ds: Dataset, key: str, ts_col: str, value_col: str,
                     id_col: str, preceding: int,
                     scale: int | None = None,
                     num_buckets: int | None = None) -> Dataset:
    """Row-count-frame trailing sum: SQL ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts, id ROWS BETWEEN <preceding> PRECEDING AND CURRENT
    ROW)`` — the row-frame sibling of ``rolling_window_sum`` (RANGE
    frames; SURVEY §7.3 #3). ROWS frames are order-sensitive under ties,
    so the frame is defined over the deterministic total order
    ``(ts, id)`` — id must be unique within a key for the result to be
    well-defined, exactly as in SQL.

    Kernel: one lexsort per co-located hash bucket, a single prefix-sum
    array, and the frame is two gathers: ``lo = max(segment_start,
    i - preceding)``, ``total = cs0[i+1] - cs0[lo]``. ``scale``
    fixed-point-encodes floats per row BEFORE the prefix sum (integer
    sums are order-independent — the repo-wide oracle discipline).
    Returns (key, ts, id, rows_total)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        v = g[value_col].to_numpy()
        ids = g[id_col].to_numpy()
        ti = ts.view(np.int64)
        order = np.lexsort((ids, ti, k))
        k, ti, v, ids = k[order], ti[order], v[order], ids[order]
        n = len(k)
        if scale is not None:
            v = np.floor(np.asarray(v, dtype=np.float64) * scale + 0.5) \
                .astype(np.int64)
        cs0 = np.zeros(n + 1, dtype=v.dtype)
        np.cumsum(v, out=cs0[1:])
        key_starts = _segment_starts(k)
        seg_start = np.repeat(key_starts,
                              np.diff(np.r_[key_starts, n]))
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(seg_start, idx - preceding)
        return pd.DataFrame({
            key: k, ts_col: pd.Series(ti.view("datetime64[us]")),
            id_col: ids, "rows_total": cs0[idx + 1] - cs0[lo]})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def rolling_rows_extremum(ds: Dataset, key: str, ts_col: str,
                          value_col: str, id_col: str, preceding: int,
                          op: str = "max", scale: int | None = None,
                          num_buckets: int | None = None) -> Dataset:
    """Row-count-frame trailing MIN/MAX: SQL ``MAX(v) OVER (PARTITION BY
    key ORDER BY ts, id ROWS BETWEEN <preceding> PRECEDING AND CURRENT
    ROW)`` — the extremum sibling of ``rolling_rows_sum`` (same
    deterministic (ts, id) total order, same fixed-point ``scale``).

    Kernel: one lexsort per co-located hash bucket, then the frame
    reduces as ``preceding+1`` segment-guarded shifted gathers folded
    with ``np.maximum``/``np.minimum`` — O(n·(w+1)) fully vectorized,
    sized for SMALL row frames (w ≲ 64, the SQL-window norm; a frame
    that wide in rows should be a RANGE window or a monotonic-deque
    kernel instead). The shift-fold cannot leak across keys: a shifted
    index below the row's segment start contributes the op identity,
    and shift 0 (the row itself) is always in frame, so no identity
    survives to the output. Returns (key, ts, id, rows_ext)."""
    if op not in ("max", "min"):
        raise ValueError(f"op must be 'max' or 'min', got {op!r}")
    if preceding < 0:
        raise ValueError("preceding must be >= 0")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        v = g[value_col].to_numpy()
        ids = g[id_col].to_numpy()
        ti = ts.view(np.int64)
        order = np.lexsort((ids, ti, k))
        k, ti, v, ids = k[order], ti[order], v[order], ids[order]
        n = len(k)
        if scale is not None:
            v = np.floor(np.asarray(v, dtype=np.float64) * scale + 0.5) \
                .astype(np.int64)
        else:
            v = np.asarray(v, dtype=np.int64)
        key_starts = _segment_starts(k)
        seg_start = np.repeat(key_starts,
                              np.diff(np.r_[key_starts, n]))
        idx = np.arange(n, dtype=np.int64)
        info = np.iinfo(np.int64)
        ident = info.min if op == "max" else info.max
        fold = np.maximum if op == "max" else np.minimum
        ext = v.copy()                       # shift 0: always in frame
        for s in range(1, preceding + 1):
            src = idx - s
            cand = np.where(src >= seg_start,
                            v[np.maximum(src, 0)], ident)
            ext = fold(ext, cand)
        return pd.DataFrame({
            key: k, ts_col: pd.Series(ti.view("datetime64[us]")),
            id_col: ids, "rows_ext": ext})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(ds, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def grouped_first_last(ds: Dataset, key: str, ts_col: str, id_col: str,
                       value_col: str, scale: int | None = None,
                       num_buckets: int | None = None) -> Dataset:
    """FIRST_VALUE / LAST_VALUE per partition: one row per key with the
    value at the key's first and last event under the explicit total
    order (ts, id) — SQL ``FIRST(v ORDER BY ts, id)`` / ``LAST(...)``.

    Scale shape: a block-local partial keeps only each key's block-wise
    first and last candidate rows (≤ 2 × |keys in block|), so the
    exchange moves ≤ 2·keys·blocks narrow 4-column rows instead of the
    input; the bucketed kernel lexsorts once per co-located bucket and
    gathers segment endpoints. ``scale`` fixed-point-encodes the float
    value per row (floor(v·scale+0.5) int64) — exact here because
    values are SELECTED, never summed. Returns (key, first_v, last_v)."""

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        v = np.asarray(batch[value_col].to_numpy(zero_copy_only=False))
        if scale is not None:
            v = np.floor(v.astype(np.float64) * scale + 0.5) \
                .astype(np.int64)
        order = np.lexsort((ids, ts, k))
        ks = k[order]
        starts = np.nonzero(np.r_[True, ks[1:] != ks[:-1]])[0]
        ends = np.r_[starts[1:], len(ks)] - 1 if len(ks) else starts
        sel = order[np.unique(np.r_[starts, ends])].astype(np.int64)
        # key column via Arrow take so string/dict key types survive
        # empty and non-numeric inputs
        kcol = batch[key].combine_chunks() \
            if isinstance(batch[key], pa.ChunkedArray) else batch[key]
        return pa.table({key: kcol.take(pa.array(sel)),
                         "__ts": pa.array(ts[sel]),
                         "__id": pa.array(ids[sel].astype(np.int64)),
                         "__v": pa.array(v[sel])})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        k = g[key].to_numpy()
        ts = g["__ts"].to_numpy()
        ids = g["__id"].to_numpy()
        v = g["__v"].to_numpy()
        order = np.lexsort((ids, ts, k))
        k, v = k[order], v[order]
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        ends = np.r_[starts[1:], len(k)] - 1
        return pd.DataFrame({key: k[starts], "first_v": v[starts],
                             "last_v": v[ends]})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    cand = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    return (add_hash_bucket(cand, key, _buckets(ds, num_buckets)).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))
