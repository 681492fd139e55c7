"""Grouped top-k (SURVEY.md B-T1 — violation sampling, and a general
operator: first-k rows per group by sort key).

Two-level: a block-local prune inside ``map_batches`` first keeps at most
k rows per group per block (Arrow-native sort + cumcount), so the global
``groupby().map_groups`` shuffle only ever sees ≤ #blocks × k rows per
group — deterministic, and the shuffle is bounded regardless of group
skew. Oracle shape: ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY s) <= k``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _topk_table(tbl: pa.Table, group_cols: list[str], sort_cols: list[str],
                k: int, descending: bool = False) -> pa.Table:
    if tbl.num_rows == 0:
        return tbl
    sdir = "descending" if descending else "ascending"
    order = [(c, "ascending") for c in group_cols] + \
        [(c, sdir) for c in sort_cols]
    tbl = tbl.sort_by(order)
    df_keys = tbl.select(group_cols).to_pandas()
    codes = (pd.MultiIndex.from_frame(df_keys).factorize()[0]
             if len(group_cols) > 1
             else df_keys[group_cols[0]].factorize()[0])
    # cumcount per contiguous group over the sorted table, vectorized
    pos = np.arange(len(codes), dtype=np.int64)
    group_start = np.zeros(len(codes), dtype=np.int64)
    change = np.nonzero(np.diff(codes) != 0)[0] + 1
    group_start[change] = change
    np.maximum.accumulate(group_start, out=group_start)
    rank = pos - group_start
    return tbl.filter(pa.array(rank < k))


def grouped_topk(ds: Dataset, group_cols: list[str], sort_cols: list[str],
                 k: int, num_buckets: int = 64,
                 descending: bool = False) -> Dataset:
    """Deterministic first-k rows per group ordered by ``sort_cols``
    (``descending=True`` flips the sort direction — k=1 descending is
    the keep-latest / keep-newest-version dedup reducer).

    Final merge runs per hash BUCKET of the leading group column (a
    bucket holds complete groups since all of a group's rows share it),
    re-applying the same vectorized Arrow sort + rank kernel — not one
    pandas group per group key (0.2 ms × 10⁵ groups dominated the op)."""

    def prune(batch: pa.Table) -> pa.Table:
        return _topk_table(batch, group_cols, sort_cols, k, descending)

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True)
    from bigdime_ray.stages.shuffle import add_hash_bucket
    bucketed = add_hash_bucket(pruned, group_cols[0], num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        tbl = pa.Table.from_pandas(df.drop(columns=["__bucket"]),
                                   preserve_index=False)
        return _topk_table(tbl, group_cols, sort_cols, k,
                           descending).to_pandas()

    return bucketed.groupby("__bucket").map_groups(final,
                                                   batch_format="pandas")


def cap_violations(violations: pa.Table, k: int) -> pa.Table:
    """B-T1: keep the deterministic first-k violation rows per
    (partition_id, validator_id), ordered by doc_id.

    Driver-sized BY CONSTRUCTION: the input is the scan union's
    violation rows, already capped per block upstream
    (``ctx.violation_cap_per_block``), so this table is at most
    blocks × validators × cap rows regardless of input size — the
    ``to_pandas`` here never sees raw data volume."""
    if violations.num_rows == 0:
        return violations
    df = violations.to_pandas()
    df = (df.sort_values(["partition_id", "validator_id", "doc_id"],
                         na_position="last")
          .groupby(["partition_id", "validator_id"], sort=False)
          .head(k).reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False,
                                schema=violations.schema)
