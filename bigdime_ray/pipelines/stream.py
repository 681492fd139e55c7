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
