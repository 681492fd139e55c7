"""doc_id uniqueness (SURVEY.md B-V6).

``BASELINE.json:6``: "doc_id uniqueness via groupby-aggregate hash
shuffle". Exact, global (cross-partition) duplicate detection:

1. project to the narrow ``(doc_id, partition_id)`` columns — the
   ``tokens`` payload never enters the shuffle (SURVEY.md §7 hard part c);
2. ``groupby("doc_id").aggregate(Count)`` — the one hash shuffle; doc_id
   is a uniform key so no salting is needed (the skew-prone key is
   ``source``, handled in stages/shuffle.py);
3. duplicate ids are broadcast back (capped) and the member rows are
   collected with a vectorized ``pc.is_in`` filter over the projection —
   a broadcast semi-join instead of a second shuffle or per-group
   ``map_groups`` (millions of tiny groups would serialize).

Per-partition verdict: FAILED iff the partition contains any member of a
duplicated doc_id; exact per-partition duplicate-row counts in metrics.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

from bigdime_ray.spi import (ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)

MAX_REPORTED_DUP_IDS = 100_000


@register_validator
class UniquenessValidator(Validator):
    id = "uniqueness"
    scans = False

    def run_global(self, ds: Dataset, ctx: ValidationContext):
        proj = ds.select_columns(["doc_id", "partition_id"])
        counts = proj.groupby("doc_id").aggregate(Count(alias_name="cnt"))
        dups = counts.filter(expr="cnt > 1")
        # duplicate-id set is expected small; cap the broadcast defensively
        dup_rows = dups.limit(MAX_REPORTED_DUP_IDS).to_pandas()
        n_dup_ids = len(dup_rows)
        partitions = ctx.partitions
        if n_dup_ids == 0:
            responses = [ValidationResponse(self.id, p, ValidationResult.PASSED,
                                            "doc_id unique", {"dup_ids": 0})
                         for p in partitions]
            return None, responses
        dup_set = pa.array(dup_rows["doc_id"].tolist(), type=pa.string())

        def members(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch["doc_id"], value_set=dup_set)
            hit = batch.filter(mask)
            n = hit.num_rows
            return pa.table({
                "partition_id": hit["partition_id"],
                "validator_id": pa.array(["uniqueness"] * n, type=pa.string()),
                "doc_id": hit["doc_id"],
                "reason": pa.array(["duplicate doc_id"] * n, type=pa.string()),
                "detail": pa.nulls(n, pa.string()),
            })

        viol = proj.map_batches(members, batch_format="pyarrow")
        viol_tbl = pa.Table.from_pandas(viol.to_pandas(),
                                        preserve_index=False)
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
