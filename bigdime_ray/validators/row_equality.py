"""Row-level equality audit vs the reference ingest (SURVEY.md B-V11).

``BASELINE.json:15``: "per-row invariant vs the reference: token-array
equality". Compares the current table against the reference ingest
(FIXTURES F5) per doc_id WITHOUT ever shuffling the ``tokens`` payload
(SURVEY.md §7 hard part c):

Two strategies (``ctx.thresholds["roweq_strategy"]``):

- **"packed" (default):** each block on each side emits ONE cell of
  sorted-by-doc-hash ``(hd, ht)`` uint64 pair arrays (hd = doc_id hash,
  ht = order-sensitive token-array hash; ~2⁻⁶⁴ collision odds per pair).
  The compare is then a vectorized numpy sorted-merge on the driver:
  per-side duplicate detection, two ``searchsorted`` membership passes
  for missing rows, and an aligned equality compare for matches —
  16 B/row total, no Ray shuffle at all. Affected doc_ids are fetched
  afterwards by a broadcast semi-join only when discrepancies exist
  (clean data → zero extra passes).
- **"groupby":** the >10⁹-row path — union of the two narrow
  projections → one hash shuffle ``groupby(doc_id)`` with Min/Max over
  h and Sum over side flags; mismatch iff (cur_n, ref_n) ≠ (1, 1) or
  min(h) ≠ max(h). Same verdicts (equality-tested in test_golden).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
        if ctx.thresholds.get("roweq_strategy", "packed") == "packed":
            return self._run_packed(ds, ref, ctx)
        return self._run_groupby(ds, ref, ctx)

    # ------------------------------------------------------- packed

    def _run_packed(self, ds: Dataset, ref: Dataset, ctx: ValidationContext):
        from bigdime_ray.functions.hashing import hash_string_column

        def pack(batch: pa.Table) -> pa.Table:
            hd = hash_string_column(batch["doc_id"]).view(np.int64)
            ht = hash_int_list_column(batch["tokens"]).view(np.int64)
            order = np.argsort(hd)
            return pa.table({
                "hd": pa.array([hd[order].tobytes()], type=pa.binary()),
                "ht": pa.array([ht[order].tobytes()], type=pa.binary())})

        def unpack(cells):
            if not cells:
                e = np.empty(0, dtype=np.int64)
                return e, e
            hd = np.concatenate([np.frombuffer(c["hd"], dtype=np.int64)
                                 for c in cells])
            ht = np.concatenate([np.frombuffer(c["ht"], dtype=np.int64)
                                 for c in cells])
            o = np.argsort(hd, kind="stable")
            return hd[o], ht[o]

        kw = dict(batch_format="pyarrow", zero_copy_batch=True)
        hd_c, ht_c = unpack(ds.map_batches(pack, **kw).take_all())
        hd_r, ht_r = unpack(ref.map_batches(pack, **kw).take_all())

        def dups(hd):
            return np.unique(hd[:-1][hd[1:] == hd[:-1]]) if len(hd) > 1 \
                else np.empty(0, dtype=np.int64)

        ambiguous = np.union1d(dups(hd_c), dups(hd_r))
        u_c, i_c = np.unique(hd_c, return_index=True)
        u_r, i_r = np.unique(hd_r, return_index=True)
        htu_c, htu_r = ht_c[i_c], ht_r[i_r]

        def membership(a: np.ndarray, b: np.ndarray) -> np.ndarray:
            """bool mask: a[i] present in sorted-unique b."""
            if len(a) == 0 or len(b) == 0:
                return np.zeros(len(a), dtype=bool)
            pos = np.searchsorted(b, a)
            safe = np.minimum(pos, len(b) - 1)
            return (pos < len(b)) & (b[safe] == a)

        in_ref = membership(u_c, u_r)
        missing_in_ref = u_c[~in_ref]
        if in_ref.any():
            pos = np.searchsorted(u_r, u_c[in_ref])
            mismatch = u_c[in_ref][htu_c[in_ref] != htu_r[pos]]
        else:
            mismatch = np.empty(0, dtype=np.int64)
        in_cur = membership(u_r, u_c)
        missing_in_cur = u_r[~in_cur]
        # ambiguous hashes are reported as such, not double-counted
        mismatch = np.setdiff1d(mismatch, ambiguous)
        missing_in_ref = np.setdiff1d(missing_in_ref, ambiguous)
        missing_in_cur = np.setdiff1d(missing_in_cur, ambiguous)

        if not (len(mismatch) or len(missing_in_ref) or len(missing_in_cur)
                or len(ambiguous)):
            responses = [ValidationResponse(
                self.id, p, ValidationResult.PASSED,
                "token arrays equal to reference ingest",
                {"mismatch_rows": 0}) for p in ctx.partitions]
            return None, responses

        reason_by_h: dict[int, str] = {}
        for h in mismatch[:MAX_REPORTED]:
            reason_by_h[int(h)] = "tokens_mismatch"
        for h in missing_in_ref[:MAX_REPORTED]:
            reason_by_h[int(h)] = "missing_in_reference"
        for h in ambiguous[:MAX_REPORTED]:
            reason_by_h[int(h)] = "ambiguous_duplicate"
        cur_set = pa.array(np.fromiter(reason_by_h, dtype=np.int64,
                                       count=len(reason_by_h)))

        def fetch(batch: pa.Table) -> pa.Table:
            hd = pa.array(hash_string_column(batch["doc_id"]).view(np.int64))
            mask = pc.is_in(hd, value_set=cur_set)
            hit = batch.filter(mask)
            hs = hash_string_column(hit["doc_id"]).view(np.int64)
            reasons = [reason_by_h[int(h)] for h in hs]
            n = hit.num_rows
            return pa.table({
                "partition_id": hit["partition_id"],
                "validator_id": pa.array(["row_equality"] * n,
                                         type=pa.string()),
                "doc_id": hit["doc_id"],
                "reason": pa.array(reasons, type=pa.string()),
                "detail": pa.nulls(n, pa.string())})

        viol_cur = pa.Table.from_pylist(
            ds.select_columns(["doc_id", "partition_id"])
            .map_batches(fetch, **kw).take_all(),
            schema=pa.schema([("partition_id", pa.string()),
                              ("validator_id", pa.string()),
                              ("doc_id", pa.string()),
                              ("reason", pa.string()),
                              ("detail", pa.string())]))
        tables = [viol_cur]
        if len(missing_in_cur):
            mset = pa.array(missing_in_cur[:MAX_REPORTED])

            def fetch_ref(batch: pa.Table) -> pa.Table:
                hd = pa.array(hash_string_column(batch["doc_id"])
                              .view(np.int64))
                hit = batch.filter(pc.is_in(hd, value_set=mset))
                n = hit.num_rows
                return pa.table({
                    "partition_id": pa.array([""] * n, type=pa.string()),
                    "validator_id": pa.array(["row_equality"] * n,
                                             type=pa.string()),
                    "doc_id": hit["doc_id"],
                    "reason": pa.array(["missing_in_current"] * n,
                                       type=pa.string()),
                    "detail": pa.nulls(n, pa.string())})

            tables.append(pa.Table.from_pylist(
                ref.select_columns(["doc_id"]).map_batches(
                    fetch_ref, **kw).take_all(), schema=viol_cur.schema))
        viol = pa.concat_tables(tables)

        per_part: dict[str, int] = {}
        for p in viol["partition_id"].to_pylist():
            if p:
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
        if len(missing_in_cur):
            responses.append(ValidationResponse(
                self.id, GLOBAL_MISSING, ValidationResult.FAILED,
                f"{len(missing_in_cur)} reference rows missing from "
                "current table",
                {"missing_in_current": int(len(missing_in_cur))}))
        return viol, responses

    # ------------------------------------------------------ groupby

    def _run_groupby(self, ds: Dataset, ref: Dataset, ctx: ValidationContext):
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
