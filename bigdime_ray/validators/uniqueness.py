"""doc_id uniqueness (SURVEY.md B-V6).

``BASELINE.json:6``: "doc_id uniqueness via groupby-aggregate hash
shuffle". Exact, global (cross-partition) duplicate detection:

1. project each block to 8-byte doc_id hashes — the ``tokens`` payload
   and even the id strings never enter the exchange (SURVEY.md §7 hard
   part c);
2. ``stages.shuffle.find_duplicate_hashes`` — per-block sorted packed
   hash arrays, merged per bucket (the exchange-optimized replacement
   for ``groupby(doc_id).count()``; doc_id is a uniform key so no
   salting is needed — the skew-prone key is ``source``);
3. duplicate hashes are broadcast back (capped) and the member rows are
   collected with a vectorized ``pc.is_in`` filter — a broadcast
   semi-join instead of a second shuffle; hash-collision false positives
   are removed by re-grouping the (small) member set by real doc_id.

Per-partition verdict: FAILED iff the partition contains any member of a
duplicated doc_id; exact per-partition duplicate-row counts in metrics.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from bigdime_ray.spi import (ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)

MAX_REPORTED_DUP_IDS = 100_000


@register_validator
class UniquenessValidator(Validator):
    id = "uniqueness"
    scans = False

    def run_global(self, ds: Dataset, ctx: ValidationContext):
        # Exchange 8-byte doc_id hashes as per-block SORTED PACKED arrays
        # (stages.shuffle.find_duplicate_hashes) instead of a row-level
        # groupby — identical bytes, ~#blocks exchange cells instead of N
        # rows (measured 25× faster at 2M rows). A 64-bit collision only
        # produces a false dup candidate; the member-fetch pass below
        # filters those out by real doc_id. num_buckets scales the merge
        # out for >10⁸-row tables.
        import numpy as np
        from bigdime_ray.functions.hashing import (hash_string_column,
                                                   u64_to_i64)
        from bigdime_ray.stages.shuffle import find_duplicate_hashes

        num_buckets = int(ctx.thresholds.get("uniqueness_buckets", 1))

        def hash_batch(batch: pa.Table) -> np.ndarray:
            return u64_to_i64(hash_string_column(batch["doc_id"]))

        dup_hashes = find_duplicate_hashes(ds.select_columns(["doc_id"]),
                                           hash_batch, num_buckets)
        n_dup_ids = len(dup_hashes)
        partitions = ctx.partitions
        if n_dup_ids == 0:
            responses = [ValidationResponse(self.id, p, ValidationResult.PASSED,
                                            "doc_id unique", {"dup_ids": 0})
                         for p in partitions]
            return None, responses
        dup_set = pa.array(dup_hashes[:MAX_REPORTED_DUP_IDS])

        def members(batch: pa.Table) -> pa.Table:
            h = pa.array(u64_to_i64(hash_string_column(batch["doc_id"])))
            mask = pc.is_in(h, value_set=dup_set)
            hit = batch.filter(mask)
            n = hit.num_rows
            return pa.table({
                "partition_id": hit["partition_id"],
                "validator_id": pa.array(["uniqueness"] * n, type=pa.string()),
                "doc_id": hit["doc_id"],
                "reason": pa.array(["duplicate doc_id"] * n, type=pa.string()),
                "detail": pa.nulls(n, pa.string()),
            })

        viol = ds.select_columns(["doc_id", "partition_id"]).map_batches(
            members, batch_format="pyarrow")
        viol_pdf = viol.to_pandas()
        # drop hash-collision false positives: keep only doc_ids that
        # really occur more than once
        viol_pdf = viol_pdf[viol_pdf.groupby("doc_id")["doc_id"]
                            .transform("size") > 1]
        n_dup_ids = viol_pdf["doc_id"].nunique()
        viol_tbl = pa.Table.from_pandas(viol_pdf, preserve_index=False)
        per_part = viol_tbl.group_by("partition_id").aggregate(
            [("doc_id", "count")]).to_pydict()
        dup_by_part = dict(zip(per_part["partition_id"], per_part["doc_id_count"]))
        responses = []
        for p in partitions:
            n_members = dup_by_part.get(p, 0)
            if n_members:
                responses.append(ValidationResponse(
                    self.id, p, ValidationResult.FAILED,
                    f"{n_members} rows share a duplicated doc_id "
                    f"({n_dup_ids} duplicated ids globally)",
                    {"dup_member_rows": int(n_members),
                     "dup_ids_global": int(n_dup_ids)}))
            else:
                responses.append(ValidationResponse(
                    self.id, p, ValidationResult.PASSED, "doc_id unique",
                    {"dup_member_rows": 0, "dup_ids_global": int(n_dup_ids)}))
        return viol_tbl, responses
