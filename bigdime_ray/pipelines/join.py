"""Distributed join helpers beyond the int-keyed ``Dataset.join``.

``string_key_join`` — large-large hash join on STRING keys
(SURVEY §7.3 #3: the existing co-partitioned join paths are int-keyed).
Shipping raw strings through a hash exchange pays variable-width
serialization plus string equality probes on every row; instead both
sides get an int64 xxhash of the key (8 B/row through the shuffle), the
join runs on the hash, and real string equality is verified AFTER the
join so a 64-bit collision can never surface a wrong pair — the same
verify-after-candidates discipline as the LSH dedup pipelines
(``pipelines/dedup.py``).

Partitioning: one co-partitioning exchange per side, sized by
``num_partitions``; at 10¹²-row scale raise it so a partition's build
side fits a task (the hash keys are uniform, so no salting is needed
regardless of hot STRING values — the hot key hashes spread only if the
VALUES differ; a single mega-hot identical key must be salted upstream,
documented caveat shared with every hash join).

The hashed exchange itself is inner-only, deliberately: under an outer
join a 64-bit hash collision would need the falsely-matched left row to
be REINSTATED as a null-match row after verification (not just
dropped), which requires an anti-join pass over that side. The outer
variants (``string_key_left_join``, ``string_key_full_outer_join``)
therefore COMPOSE the verified inner join with broadcast anti branches
instead of widening the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from bigdime_ray.functions.hashing import hash_string_column, u64_to_i64

_JKL, _JKR = "__jk_l", "__jk_r"


def string_key_join(left: Dataset, right: Dataset, left_key: str,
                    right_key: str, num_partitions: int = 16) -> Dataset:
    """Inner join ``left ⋈ right`` on string columns ``left_key`` ==
    ``right_key`` (names must differ so post-join verification can see
    both sides). Output carries all columns of both sides.

    Caller contract (repo-wide empty-block hazard, CLAUDE.md): a side
    that can contain EMPTY blocks — it came through a groupby/union
    hash shuffle, or a filter that can empty whole blocks — must pass
    through ``stages.shuffle.drop_empty_blocks`` first. Empty blocks
    bypass map operators, so they'd reach the join without the hash
    column and crash it ("No match for FieldRef __jk_l")."""
    if left_key == right_key:
        raise ValueError(
            "left_key and right_key must have distinct names "
            "(rename one side) so collision verification can compare "
            "both strings after the join")

    def hasher(col: str, out: str):
        def add(batch: pa.Table) -> pa.Table:
            h = u64_to_i64(hash_string_column(batch[col]))
            return batch.append_column(out, pa.array(h))
        return add

    lh = left.map_batches(hasher(left_key, _JKL), batch_format="pyarrow",
                          zero_copy_batch=True)
    rh = right.map_batches(hasher(right_key, _JKR), batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = lh.join(rh, join_type="inner", num_partitions=num_partitions,
                     on=(_JKL,), right_on=(_JKR,))

    def verify(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch[left_key], batch[right_key])
        out = batch.filter(keep)
        return out.drop_columns([c for c in (_JKL, _JKR)
                                 if c in out.schema.names])

    return joined.map_batches(verify, batch_format="pyarrow",
                              zero_copy_batch=True)


def broadcast_join(left: Dataset, right_small: Dataset, left_key: str,
                   right_key: str, how: str = "inner") -> Dataset:
    """Dimension-table join: the SMALL right side is pulled once,
    sorted by key and shipped via ``ray.put``; every left batch then
    gathers the right columns through one ``np.searchsorted`` — NO
    shuffle of either side, the canonical fact×dim shape at 100 TB
    (generalizes the inline LUT in ``_q_revenue_by_region``).

    Requirements: right keys UNIQUE (validated — a duplicate dim key
    silently multiplying fact rows is the classic join bug) and the
    right table fits a broadcast (~10⁸ rows; use ``Dataset.join`` /
    ``string_key_join`` beyond that). ``how="inner"`` drops unmatched
    left rows; ``how="left"`` keeps them with nulls in the right
    columns. Output: left columns + right columns (minus the right
    key, which duplicates the left key)."""
    import ray as _ray

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    rtabs = [t for t in _ray.get(right_small.to_arrow_refs())
             if t.num_rows > 0]
    rtab = (pa.concat_tables(rtabs).combine_chunks() if rtabs
            else None)
    if rtab is None:
        raise ValueError("broadcast_join: right side is empty")
    rk = rtab[right_key].to_numpy(zero_copy_only=False)
    order = np.argsort(rk, kind="stable")
    rk = rk[order]
    if len(rk) > 1 and (rk[1:] == rk[:-1]).any():
        raise ValueError("broadcast_join requires unique right keys")
    rtab = rtab.take(pa.array(order)).drop_columns([right_key])
    ref = _ray.put((rk, rtab))
    rnames = rtab.schema.names

    def gather(batch: pa.Table) -> pa.Table:
        keys, dim = _ray.get(ref)
        lk = batch[left_key].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, lk)
        idx_c = np.minimum(idx, len(keys) - 1)
        hit = keys[idx_c] == lk
        if how == "inner":
            batch = batch.filter(pa.array(hit))
            take = pa.array(idx_c[hit])
            for nm in rnames:
                batch = batch.append_column(nm, dim[nm].take(take))
            return batch
        take = pa.array(np.where(hit, idx_c, 0))
        valid = pa.array(hit)
        for nm in rnames:
            col = dim[nm].take(take).combine_chunks()
            batch = batch.append_column(
                nm, pc.if_else(valid, col, pa.nulls(len(batch),
                                                    type=col.type)))
        return batch

    return left.map_batches(gather, batch_format="pyarrow",
                            zero_copy_batch=True)


def key_anti_join(left: Dataset, right: Dataset, left_key: str,
                  right_key: str, num_partitions: int = 16) -> Dataset:
    """Large-large ANTI join (SQL ``NOT EXISTS`` / anti-semi shape) on
    exact-typed keys: rows of ``left`` whose key appears nowhere in
    ``right``. Unlike the broadcast anti
    (``__ray_entry__._q_customers_without_orders``), NEITHER side must
    fit in memory — Ray's native ``join_type="left_anti"`` hash
    exchange co-partitions both sides, and the right side is first
    PROJECTED to its key column alone so only 8 B/row (int keys) moves
    through the shuffle. Exact keys (no hashing), so no post-join
    verification is needed, and outer/anti semantics are
    collision-free — this is why the function requires exact-typed
    keys and the string-key family above does not offer anti.
    Output: the left rows, unchanged schema."""
    rk = right.select_columns([right_key])
    return left.join(rk, join_type="left_anti",
                     num_partitions=num_partitions,
                     on=(left_key,), right_on=(right_key,))


def key_semi_join(left: Dataset, right: Dataset, left_key: str,
                  right_key: str, num_partitions: int = 16) -> Dataset:
    """Large-large SEMI join (SQL ``EXISTS``): rows of ``left`` whose
    key appears in ``right`` — the dual of ``key_anti_join``, same
    narrow-projection discipline via ``join_type="left_semi"``. Use
    the broadcast ``is_in`` path instead when the right key set fits a
    broadcast (~10⁸ keys) — it avoids shuffling the LEFT side too."""
    rk = right.select_columns([right_key])
    return left.join(rk, join_type="left_semi",
                     num_partitions=num_partitions,
                     on=(left_key,), right_on=(right_key,))


def string_key_left_join(left: Dataset, right: Dataset, left_key: str,
                         right_key: str,
                         num_partitions: int = 16) -> Dataset:
    """LEFT OUTER join on string keys, composed as
    ``verified inner ⊎ (broadcast anti rows + null right columns)``.

    This sidesteps the outer-join collision problem documented above:
    a left row whose key hash-collides with an unrelated right key is
    dropped by the inner join's string verification, and — because its
    REAL key is absent from the right key set — re-enters through the
    anti branch with nulls, exactly the SQL result. The anti branch
    broadcasts the right side's distinct keys (`ray.put`-style Arrow
    value set), so this composition assumes the RIGHT key set fits a
    broadcast (~10⁸ keys); beyond that, run the anti branch as a second
    hash-join pass instead. Output schema: left columns + right columns
    (null where unmatched), same as the inner join's."""
    inner = string_key_join(left, right, left_key, right_key,
                            num_partitions)
    cols = left.schema().names + right.schema().names
    unmatched = _anti_with_nulls(left, left_key,
                                 _distinct_keys(right, right_key),
                                 right.schema(), cols)
    return inner.map_batches(lambda b: b.select(cols),
                             batch_format="pyarrow",
                             zero_copy_batch=True).union(unmatched)


def _distinct_keys(side: Dataset, key: str) -> pa.Array:
    """Collect a side's distinct key values for a broadcast anti branch
    (assumes the key set fits the driver/object store, ~10⁸ keys)."""
    import ray as _ray

    # groupby-derived sides can carry zero-column empty blocks
    # (stages/shuffle.py::drop_empty_blocks doc) — drop before concat
    tabs = [t for t in _ray.get(side.select_columns([key]).to_arrow_refs())
            if t.num_rows > 0]
    return pc.unique(pa.concat_tables(tabs)[key].combine_chunks()) \
        if tabs else pa.array([], type=pa.string())


def _arrow_types(sch) -> list[pa.DataType]:
    """ray.data.Schema.types yields numpy dtypes for pandas-backed
    datasets; normalize to Arrow (object dtype ≈ string — the pandas
    block representation doesn't distinguish)."""
    types = []
    for t in sch.types:
        if isinstance(t, pa.DataType):
            types.append(t)
        else:
            try:
                types.append(pa.from_numpy_dtype(t))
            except (pa.ArrowNotImplementedError, TypeError):
                types.append(pa.string())
    return types


def _anti_with_nulls(side: Dataset, side_key: str, other_keys: pa.Array,
                     other_schema, cols: list[str]) -> Dataset:
    """Rows of ``side`` whose key is absent from ``other_keys``, padded
    with nulls for every column of the other side and projected to the
    unified ``cols`` order — the outer-join unmatched branch."""
    names = other_schema.names
    types = _arrow_types(other_schema)

    def anti(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.invert(
            pc.is_in(batch[side_key], value_set=other_keys)))
        for nm, tp in zip(names, types):
            out = out.append_column(nm, pa.nulls(out.num_rows, type=tp))
        return out.select(cols)

    return side.map_batches(anti, batch_format="pyarrow",
                            zero_copy_batch=True)


def string_key_full_outer_join(left: Dataset, right: Dataset,
                               left_key: str, right_key: str,
                               num_partitions: int = 16) -> Dataset:
    """FULL OUTER join on string keys:
    ``verified inner ⊎ left-anti (null right cols) ⊎ right-anti (null
    left cols)`` — the symmetric completion of ``string_key_left_join``.

    Collision-safe for the same reason: a hash-collided pair is dropped
    by the inner join's string verification and each row re-enters
    through its side's anti branch with nulls, exactly the SQL result.
    BOTH distinct key sets are broadcast (each ≲10⁸ keys); beyond that
    run the anti branches as hash-join passes. Output schema: left
    columns + right columns, nulls where unmatched."""
    inner = string_key_join(left, right, left_key, right_key,
                            num_partitions)
    cols = left.schema().names + right.schema().names
    left_um = _anti_with_nulls(left, left_key,
                               _distinct_keys(right, right_key),
                               right.schema(), cols)
    right_um = _anti_with_nulls(right, right_key,
                                _distinct_keys(left, left_key),
                                left.schema(), cols)
    return (inner.map_batches(lambda b: b.select(cols),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
            .union(left_um).union(right_um))
