"""n_tok consistency check (SURVEY.md B-V4).

Row-level invariant ``n_tok == len(tokens)`` — the engine-native analog of
the reference's per-unit record integrity checks, generalized to content
level (SURVEY.md §2A note: the reference validates counts per file; the
target validates row-level constraints at scale). Fully vectorized:
``pc.list_value_length`` + ``pc.equal`` per zero-copy Arrow batch.
Violators become violation rows; the partition verdict is FAILED iff any
row violates (exact count carried in the mergeable state even when the
emitted rows are capped).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bigdime_ray.spi import (ScanResult, ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)
from bigdime_ray.state.sketches import CountState, PartialState


@register_validator
class NTokConsistencyValidator(Validator):
    id = "ntok_consistency"

    def scan_partition(self, tbl: pa.Table, partition_id: str,
                       ctx: ValidationContext, cache=None) -> ScanResult:
        actual = (cache.list_lengths if cache is not None
                  else pc.list_value_length(tbl["tokens"]))
        ok = pc.equal(tbl["n_tok"], actual)
        bad = pc.fill_null(pc.invert(ok), True)  # null n_tok or null tokens → violation
        n_bad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
        if n_bad == 0:
            return ScanResult(state=CountState(0))
        mask = bad.to_numpy(zero_copy_only=False)
        idx = np.nonzero(mask)[0][: ctx.violation_cap_per_block]
        doc_ids = tbl["doc_id"].take(pa.array(idx)).to_numpy(zero_copy_only=False)
        declared = tbl["n_tok"].take(pa.array(idx)).to_numpy(zero_copy_only=False)
        actual_np = actual.take(pa.array(idx)).to_numpy(zero_copy_only=False)
        details = [f"n_tok={d} len(tokens)={a}" for d, a in zip(declared, actual_np)]
        return ScanResult(state=CountState(int(n_bad)), viol_doc_ids=doc_ids,
                          viol_reason="n_tok != len(tokens)", viol_details=details)

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> ValidationResponse:
        n_bad = state.n if state is not None else 0
        if n_bad:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.FAILED,
                f"{n_bad} rows with n_tok != len(tokens)", {"violations": n_bad})
        return ValidationResponse(self.id, partition_id, ValidationResult.PASSED,
                                  "n_tok consistent", {"violations": 0})
