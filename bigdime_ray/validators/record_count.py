"""Record-count validation (SURVEY.md B-V1).

Reproduces BigDime's ``RecordCountValidator``
[ref: bigdime-data-validation/io.bigdime.validation.RecordCountValidator]
(``BASELINE.json:6`` "record-count validation"): source-side expected
count (ingest manifest, FIXTURES F3 — the analog of the reader-accumulated
header count) vs loaded count (per-partition COUNT(*) accumulated
block-locally in the scan pass, merged associatively). Mismatch → FAILED
with both numbers in the comment; partition absent from the manifest →
INCOMPLETE_SETUP (the reference's missing-header branch).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from bigdime_ray.spi import (ScanResult, ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)
from bigdime_ray.state.sketches import CountState, PartialState


@register_validator
class RecordCountValidator(Validator):
    id = "record_count"
    requires = ("manifest",)

    def scan_partition(self, tbl: pa.Table, partition_id: str,
                       ctx: ValidationContext, cache=None) -> ScanResult:
        return ScanResult(state=CountState(tbl.num_rows))

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> ValidationResponse:
        loaded = state.n if state is not None else 0
        entry = (ctx.manifest or {}).get(partition_id)
        if entry is None:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.INCOMPLETE_SETUP,
                "partition not present in ingest manifest")
        expected = entry["expected_rows"]
        if loaded != expected:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.FAILED,
                f"record count mismatch: expected {expected}, loaded {loaded}",
                {"expected_rows": expected, "loaded_rows": loaded})
        return ValidationResponse(
            self.id, partition_id, ValidationResult.PASSED,
            f"record count matched: {loaded}",
            {"expected_rows": expected, "loaded_rows": loaded})
