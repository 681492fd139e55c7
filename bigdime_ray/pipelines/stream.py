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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Sum


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


def running_aggregate(ds: Dataset, key: str, ts_col: str, value_col: str,
                      order_tiebreak: str | None = None) -> Dataset:
    """Per-key cumulative sum in ts order (deterministic tie-break by
    ``order_tiebreak``). One shuffle on ``key``; the sort happens inside
    each group."""
    sort_cols = [ts_col] + ([order_tiebreak] if order_tiebreak else [])

    def cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols)
        g["running_total"] = g[value_col].cumsum()
        return g

    return ds.groupby(key).map_groups(cumsum, batch_format="pandas")


def session_windows(ds: Dataset, key: str, ts_col: str,
                    gap_seconds: float, value_col: str | None = None
                    ) -> Dataset:
    """Gap-based sessions per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``. Returns one row per
    session: key, session_id (0-based per key), n_events, session_start,
    session_end (+ value sum when ``value_col``)."""

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col]
        gaps = ts.diff().dt.total_seconds().fillna(0.0)
        session = (gaps > gap_seconds).cumsum()
        agg = {ts_col: ["min", "max", "size"]}
        out = g.assign(__s=session).groupby("__s").agg(
            session_start=(ts_col, "min"), session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
            **({"value_total": (value_col, "sum")} if value_col else {}))
        out = out.reset_index().rename(columns={"__s": "session_id"})
        out[key] = g[key].iloc[0]
        cols = [key, "session_id", "n_events", "session_start", "session_end"]
        if value_col:
            cols.append("value_total")
        return out[cols]

    return ds.groupby(key).map_groups(sessionize, batch_format="pandas")


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
                      out_col: str = "matched_id") -> Dataset:
    """As-of join: for every left row, the right row of the SAME key
    with the greatest ts ≤ left.ts (SQL: ``ASOF LEFT JOIN ... ON
    l.key = r.key AND l.ts >= r.ts``). No match → null.

    Both sides project to (key, ts, id, side) and union — ONE hash
    shuffle co-partitions them; each group does a numpy sort +
    searchsorted (no per-row Python). Ties on right ts resolve to the
    max id (deterministic; mirror this in any SQL oracle by
    pre-aggregating the right side per (key, ts))."""

    def tag(id_col: str, side: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "k": b[key], "ts": b[ts_col],
                "rid": pc.cast(b[id_col], pa.int64()),
                "side": pa.array(
                    np.full(b.num_rows, side, dtype=np.int8))})
        return fn

    u = (left.map_batches(tag(left_id, 0), batch_format="pyarrow",
                          zero_copy_batch=True)
         .union(right.map_batches(tag(right_id, 1), batch_format="pyarrow",
                                  zero_copy_batch=True)))

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g["side"].to_numpy() == 0
        lt = g["ts"].to_numpy()[lmask]
        lid = g["rid"].to_numpy()[lmask]
        rt = g["ts"].to_numpy()[~lmask]
        rid = g["rid"].to_numpy()[~lmask]
        if len(lt) == 0:
            return pd.DataFrame({"k": [], "ts": [], left_id: [],
                                 out_col: []})
        # no-match is represented directly as NaN (never a sentinel id —
        # negative right-side ids are legal); float64 output caps exact
        # ids at 2^53, documented limitation of the nullable encoding
        matched = np.full(len(lt), np.nan, dtype=np.float64)
        if len(rt):
            # dedupe right ts ties to max id: sort by (ts, id), keep the
            # LAST of each ts run — searchsorted lands on it
            ro = np.lexsort((rid, rt))
            rt, rid = rt[ro], rid[ro]
            keep = np.r_[rt[1:] != rt[:-1], True]
            rt, rid = rt[keep], rid[keep]
            idx = np.searchsorted(rt, lt, side="right") - 1
            hit = idx >= 0
            matched[hit] = rid[idx[hit]].astype(np.float64)
        return pd.DataFrame({
            "k": g["k"].to_numpy()[lmask], "ts": lt, left_id: lid,
            out_col: matched})

    return u.groupby("k").map_groups(join_group, batch_format="pandas")
