"""Nested / list-column operators (SQL UNNEST family).

The embeddings table's ``list<float>`` column is the model case: every
per-dimension statistic (norms, per-dim drift, quantization scans)
starts by exploding the list into (parent, ordinal, value) rows. The
explode is a pure stateless map — zero shuffle; downstream aggregates
then use the normal block-pre-agg + small-groupby discipline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def unnest_column(ds: Dataset, list_col: str, value_col: str = "val",
                  ordinal_col: str | None = "ord",
                  keep_cols: list[str] | None = None) -> Dataset:
    """SQL ``UNNEST(list_col) WITH ORDINALITY``: one output row per
    list element, carrying the element (``value_col``), its 0-based
    position (``ordinal_col``, omit with None) and any ``keep_cols``
    gathered from the parent row.

    Fully vectorized per block: ``pc.list_flatten`` pulls the child
    values zero-copy (slicing-safe, unlike raw ``.values``),
    ``pc.list_value_length`` + ``np.repeat`` build the parent-row
    gather index, and the ordinal is one subtraction against the
    repeated run starts. Null / empty lists contribute no rows —
    DuckDB's UNNEST semantics. Stateless map, zero shuffle; output
    blocks are ~|list| × input blocks, so downsize ``batch_size``
    upstream for very long lists."""
    keep = keep_cols or []

    def explode(batch: pa.Table) -> pa.Table:
        col = batch[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        lens = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        out = {}
        for c in keep:
            out[c] = pc.take(batch[c], pa.array(parent))
        if ordinal_col is not None:
            starts = np.r_[0, np.cumsum(lens)[:-1]]
            out[ordinal_col] = pa.array(
                np.arange(len(parent), dtype=np.int64)
                - np.repeat(starts, lens))
        out[value_col] = flat
        return pa.table(out)

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)
