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

Inner joins only, deliberately: under an outer join a 64-bit hash
collision would need the falsely-matched left row to be REINSTATED as
a null-match row after verification (not just dropped), which requires
a second anti-join pass over the left side. Compose the existing
broadcast anti-join (`__ray_entry__._q_customers_without_orders`
pattern) with this inner join when outer semantics are needed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from bigdime_ray.functions.hashing import hash_string_column, u64_to_i64

_JKL, _JKR = "__jk_l", "__jk_r"


def string_key_join(left: Dataset, right: Dataset, left_key: str,
                    right_key: str, num_partitions: int = 16) -> Dataset:
    """Inner join ``left ⋈ right`` on string columns ``left_key`` ==
    ``right_key`` (names must differ so post-join verification can see
    both sides). Output carries all columns of both sides."""
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
    import ray as _ray

    inner = string_key_join(left, right, left_key, right_key,
                            num_partitions)
    # groupby-derived right sides can carry zero-column empty blocks
    # (stages/shuffle.py::drop_empty_blocks doc) — drop before concat
    rtabs = [t for t in _ray.get(
        right.select_columns([right_key]).to_arrow_refs())
        if t.num_rows > 0]
    rkeys = pc.unique(pa.concat_tables(rtabs)[right_key]
                      .combine_chunks()) if rtabs \
        else pa.array([], type=pa.string())
    rsch = right.schema()
    # ray.data.Schema.types yields numpy dtypes for pandas-backed
    # datasets; normalize to Arrow (object dtype ≈ string — the pandas
    # block representation doesn't distinguish)
    rtypes = []
    for t in rsch.types:
        if isinstance(t, pa.DataType):
            rtypes.append(t)
        else:
            try:
                rtypes.append(pa.from_numpy_dtype(t))
            except (pa.ArrowNotImplementedError, TypeError):
                rtypes.append(pa.string())
    cols = left.schema().names + rsch.names

    def anti(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.invert(
            pc.is_in(batch[left_key], value_set=rkeys)))
        for nm, tp in zip(rsch.names, rtypes):
            out = out.append_column(nm, pa.nulls(out.num_rows, type=tp))
        return out.select(cols)

    unmatched = left.map_batches(anti, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return inner.map_batches(lambda b: b.select(cols),
                             batch_format="pyarrow",
                             zero_copy_batch=True).union(unmatched)
