"""Z-order (Morton) clustering — multi-column data layout for pruning.

A sorted layout prunes row groups on ONE column; real query mixes
filter on several. Interleaving the bits of quantized column values
into one Morton key and sorting by it gives every participating column
locality ~2^(bits/d), so parquet min/max row-group stats prune
multi-dimensional range queries — the lakehouse Z-ORDER BY. Layout
only: correctness never depends on it, so the quantization can be a
lossy linear map. The sort is Ray's distributed range-partitioned
exchange; everything else is one cheap min/max pass + a vectorized
bit-interleave per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max, Min

ZKEY = "__zkey"


def _to_f64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    v = arr.to_numpy(zero_copy_only=False)
    if np.issubdtype(v.dtype, np.datetime64):
        v = v.astype("datetime64[us]").view(np.int64)
    return v.astype(np.float64)


def zorder_key(cols: list[np.ndarray], lows: list[float],
               highs: list[float], bits: int) -> np.ndarray:
    """Interleave ``bits`` quantized bits per column into one int64
    Morton key (column j owns bit positions j, j+d, j+2d, …)."""
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} cols × {bits} bits exceeds int64")
    scale = (1 << bits) - 1
    out = np.zeros(len(cols[0]), dtype=np.uint64)
    for j, (v, lo, hi) in enumerate(zip(cols, lows, highs)):
        span = (hi - lo) or 1.0
        # nulls/NaN quantize to the low edge — clip keeps NaN and a
        # NaN→uint64 cast is undefined (review finding); layout-only,
        # so pinning them to one end is always safe
        v = np.where(np.isnan(v), lo, v)
        q = np.clip(((v - lo) / span) * scale, 0, scale) \
            .astype(np.uint64)
        for b in range(bits):
            out |= ((q >> np.uint64(b)) & np.uint64(1)) \
                << np.uint64(b * d + j)
    return out.view(np.int64)


def zorder_sort(ds: Dataset, cols: list[str], bits: int = 16) -> Dataset:
    """Cluster a dataset by the Morton key of ``cols``: one min/max
    aggregate pass (broadcast as plain Python floats — they ride the
    closure, ≤ 2·d scalars), one vectorized key map, one distributed
    sort. Write the result with modest row-group sizes and parquet
    min/max stats prune EVERY ``cols`` member in downstream range
    scans. The key column is dropped from the output."""
    aggs = []
    for c in cols:
        aggs.append(Min(c, alias_name=f"lo_{c}"))
        aggs.append(Max(c, alias_name=f"hi_{c}"))
    stats = ds.aggregate(*aggs)

    def as_f(x):
        if x is None:  # all-null column → constant key contribution
            return 0.0
        if hasattr(x, "timestamp"):
            # Ray's Min/Max returns a NAIVE datetime; .timestamp()
            # would read it in LOCAL time while _to_f64 uses the UTC
            # epoch — pin to UTC so lo/hi match the value axis
            import datetime as _dt
            return x.replace(tzinfo=_dt.timezone.utc).timestamp() * 1e6
        return float(x)

    lows = [as_f(stats[f"lo_{c}"]) for c in cols]
    highs = [as_f(stats[f"hi_{c}"]) for c in cols]

    def add_key(batch: pa.Table) -> pa.Table:
        arrs = [_to_f64(batch[c]) for c in cols]
        return batch.append_column(
            ZKEY, pa.array(zorder_key(arrs, lows, highs, bits)))

    return (ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
            .sort(ZKEY).drop_columns([ZKEY]))
