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


def upsert_snapshot(old: Dataset, changes: Dataset, key: str,
                    delete_col: str | None = None,
                    num_partitions: int = 16) -> Dataset:
    """MERGE / upsert: apply a change set to a snapshot — rows in
    ``changes`` replace same-key rows of ``old``, new keys insert, and
    (when ``delete_col`` names an int/bool column) delete-flagged
    change rows remove the key entirely. The CDC-apply dual of
    ``snapshot_diff``.

    Exactly one exchange does all the work: the surviving-old side is
    ``key_anti_join(old, changes)`` (Ray-native left_anti, right side
    projected to 8 B/row keys), unioned with the non-delete change
    rows — neither side ever materializes, and the union is zero-copy
    concatenation of streams. Snapshot semantics assume unique keys
    per side (same contract ``snapshot_diff`` enforces; here it is
    documented, not scanned, because validating would cost a second
    pass over ``changes`` — run ``duplicate_keys`` upstream when the
    feed is untrusted). Column schemas of ``old`` and the non-delete
    ``changes`` projection must match. ``delete_col`` must be a valid
    Python identifier that is not a keyword (it is spliced into a Ray
    filter expression)."""
    from bigdime_ray.pipelines.join import key_anti_join
    from bigdime_ray.stages.shuffle import drop_empty_blocks

    if delete_col is not None:
        import keyword
        if not delete_col.isidentifier() or keyword.iskeyword(delete_col):
            raise ValueError(
                f"delete_col must be a plain (non-keyword) identifier, "
                f"got {delete_col!r} — it is spliced into a filter "
                f"expression")
    survivors = key_anti_join(old, changes, key, key,
                              num_partitions=num_partitions)
    if delete_col is not None:
        upserts = changes.filter(expr=f"{delete_col} == 0") \
            .drop_columns([delete_col])
    else:
        upserts = changes
    # anti-join output came through a hash shuffle → normalize its
    # empty blocks before the union sees mismatched schemas
    return drop_empty_blocks(survivors).union(upserts)
