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


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_col: str = "metric", value_col: str = "value"):
    """UNPIVOT / melt: wide → long reshape, one output row per (input
    row × value column) — the inverse of pivot_counts/pivot_sums and
    the standard prep for per-metric grouped analytics over a wide
    feature table. Pure map (zero shuffle): each block emits one
    id-projected slice per value column tagged with the column name,
    concatenated zero-copy. All ``value_cols`` must share one Arrow
    type (cast upstream — silent promotion would surprise the oracle
    discipline); output row order is column-major per block, which is
    irrelevant to every downstream aggregate and to the row-order-
    insensitive driver compare."""
    def melt(batch: pa.Table) -> pa.Table:
        types = {str(batch[c].type) for c in value_cols}
        if len(types) > 1:
            raise TypeError(f"value_cols mix types {sorted(types)}; "
                            "cast them to one type first")
        parts = []
        for c in value_cols:
            cols = {i: batch[i] for i in id_cols}
            cols[var_col] = pa.array([c] * batch.num_rows,
                                     type=pa.string())
            cols[value_col] = batch[c]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow",
                          zero_copy_batch=True)
