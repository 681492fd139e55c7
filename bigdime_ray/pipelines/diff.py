"""Snapshot comparison — the CDC (change-data-capture) shape.

``snapshot_diff`` classifies every key across two keyed snapshots as
``added`` / ``removed`` / ``changed`` / ``same`` — the audit a 100 TB
ingest pipeline runs between consecutive loads ("what did this delivery
actually change?"). It is the user-facing generalization of the
row-equality audit (validators/row_equality.py): same
packed-cell-exchange economics, but emitting a per-key verdict instead
of a pass/fail count.

Design: both sides are tagged and UNIONed, then ride ONE
``grouped_int_sums_exchange`` as four per-key int64 sums — presence and
value per side. Because each snapshot holds at most one row per key
(validated — presence sums > 1 raise), the "sum" of each side's value
IS the value, so changed-detection compares exact integers, never
hashes: no collision can misclassify a changed row as same. Exchange
cost: 40 B per distinct key per block, no row-level shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

STATUSES = ("added", "removed", "changed", "same")


def snapshot_diff(old: Dataset, new: Dataset, key: str, value_col: str,
                  num_buckets: int | None = None) -> pa.Table:
    """Per-key diff of two snapshots keyed by int64 ``key`` with int64
    ``value_col`` content (fixed-point-encode floats upstream; pack or
    hash multi-column contents into one int64 upstream — a packed hash
    reintroduces the documented 2⁻⁶⁴ collision caveat, a single value
    column does not).

    Returns an Arrow table (key, status) covering every key present in
    either snapshot. The driver holds one row per distinct key — the
    ``duplicate_key_counts`` driver-merge contract; pass ``num_buckets``
    to force the bucketed merge path at ~10⁹+ keys (auto-selected from
    the row count otherwise)."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            v = b[value_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({"k": pa.array(k), "v": pa.array(v),
                             "side": pa.array(
                                 np.full(len(k), side, dtype=np.int64))})
        return fn

    tagged = (old.map_batches(tag(0), batch_format="pyarrow",
                              zero_copy_batch=True)
              .union(new.map_batches(tag(1), batch_format="pyarrow",
                                     zero_copy_batch=True)))

    def extract(batch: pa.Table):
        k = batch["k"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        side = batch["side"].to_numpy(zero_copy_only=False)
        a = (side == 0).astype(np.int64)
        b = (side == 1).astype(np.int64)
        return k, [a, b, v * a, v * b]

    keys, (ap, bp, av, bv) = grouped_int_sums_exchange(
        tagged, extract, 4, num_buckets=num_buckets)
    if len(keys) and (max(ap.max(), bp.max()) > 1):
        raise ValueError(
            "snapshot_diff requires at most one row per key per "
            "snapshot; run exact_dedup / uniqueness first")
    status = np.where(ap == 0, 0,                     # added
                      np.where(bp == 0, 1,            # removed
                               np.where(av != bv, 2,  # changed
                                        3)))          # same
    order = np.argsort(keys)
    return pa.table({key: pa.array(keys[order]),
                     "status": pa.DictionaryArray.from_arrays(
                         pa.array(status[order], type=pa.int8()),
                         pa.array(list(STATUSES))).cast(pa.string())})
