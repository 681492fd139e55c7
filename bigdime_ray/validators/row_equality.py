"""Row-level equality audit vs the reference ingest (SURVEY.md B-V11).

``BASELINE.json:15``: "per-row invariant vs the reference: token-array
equality". Compares the current table against the reference ingest
(FIXTURES F5) per doc_id WITHOUT ever shuffling the ``tokens`` payload
(SURVEY.md §7 hard part c):

1. both sides are projected in map_batches to
   ``(doc_id, h = content_hash(tokens), side flags)`` — 64-bit order-
   sensitive polynomial hash of the token array (collision probability
   ~2^-64 per pair; documented approximation);
2. union of the two narrow projections → one hash shuffle
   ``groupby(doc_id)`` with Min/Max over h and Sum over the side flags —
   a co-partitioned compare expressed as a pure mergeable aggregate
   (cheaper than a join: no pairwise matching, and rows missing on
   either side fall out of the same aggregate);
3. mismatch iff (cur_n, ref_n) != (1, 1) or min(h) != max(h); reasons:
   ``tokens_mismatch`` / ``missing_in_current`` / ``missing_in_reference``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

from bigdime_ray.functions.hashing import hash_int_list_column, u64_to_i64
from bigdime_ray.sources.tokens import read_tokens
from bigdime_ray.spi import (ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)

MAX_REPORTED = 100_000


def _project(side_cur: int):
    def fn(batch: pa.Table) -> pa.Table:
        h = u64_to_i64(hash_int_list_column(batch["tokens"]))
        n = batch.num_rows
        part = (batch["partition_id"] if "partition_id" in batch.column_names
                else pa.array([""] * n, type=pa.string()))
        if side_cur == 0:
            part = pa.array([""] * n, type=pa.string())
        return pa.table({
            "doc_id": batch["doc_id"],
            "h": pa.array(h),
            "cur": pa.array(np.full(n, side_cur, dtype=np.int64)),
            "ref": pa.array(np.full(n, 1 - side_cur, dtype=np.int64)),
            "part": part,
        })
    return fn


@register_validator
class RowEqualityValidator(Validator):
    id = "row_equality"
    requires = ("reference_path",)
    scans = False

    def run_global(self, ds: Dataset, ctx: ValidationContext):
        # restrict the reference side to the partitions in scope for THIS
        # run — on resume, skipped VALIDATED partitions must not show up
        # as "missing_in_current"
        ref = read_tokens(ctx.reference_path,
                          partitions=ctx.partitions or None)
        cur_p = ds.map_batches(_project(1), batch_format="pyarrow",
                               zero_copy_batch=True)
        ref_p = ref.map_batches(_project(0), batch_format="pyarrow",
                                zero_copy_batch=True)
        agg = cur_p.union(ref_p).groupby("doc_id").aggregate(
            Sum("cur", alias_name="cur_n"), Sum("ref", alias_name="ref_n"),
            Min("h", alias_name="h_min"), Max("h", alias_name="h_max"),
            Max("part", alias_name="part"))
        bad = agg.filter(
            expr="cur_n != 1 or ref_n != 1 or h_min != h_max")
        bad_pdf = bad.limit(MAX_REPORTED).to_pandas()

        reasons = np.where(
            bad_pdf["cur_n"] == 0, "missing_in_current",
            np.where(bad_pdf["ref_n"] == 0, "missing_in_reference",
                     np.where((bad_pdf["cur_n"] > 1) | (bad_pdf["ref_n"] > 1),
                              "ambiguous_duplicate", "tokens_mismatch")))
        n = len(bad_pdf)
        viol = pa.table({
            "partition_id": pa.array(bad_pdf["part"].fillna("").tolist(),
                                     type=pa.string()),
            "validator_id": pa.array(["row_equality"] * n, type=pa.string()),
            "doc_id": pa.array(bad_pdf["doc_id"].tolist(), type=pa.string()),
            "reason": pa.array(reasons.tolist(), type=pa.string()),
            "detail": pa.nulls(n, pa.string()),
        })
        per_part: dict[str, int] = {}
        for p in viol["partition_id"].to_pylist():
            per_part[p] = per_part.get(p, 0) + 1
        responses = []
        for p in ctx.partitions:
            n_bad = per_part.get(p, 0)
            if n_bad:
                responses.append(ValidationResponse(
                    self.id, p, ValidationResult.FAILED,
                    f"{n_bad} rows differ from reference ingest",
                    {"mismatch_rows": n_bad}))
            else:
                responses.append(ValidationResponse(
                    self.id, p, ValidationResult.PASSED,
                    "token arrays equal to reference ingest",
                    {"mismatch_rows": 0}))
        # rows missing in current have no partition attribution
        n_missing_cur = int((bad_pdf["cur_n"] == 0).sum())
        if n_missing_cur:
            responses.append(ValidationResponse(
                self.id, GLOBAL_MISSING, ValidationResult.FAILED,
                f"{n_missing_cur} reference rows missing from current table",
                {"missing_in_current": n_missing_cur}))
        return viol, responses


GLOBAL_MISSING = "__missing__"
