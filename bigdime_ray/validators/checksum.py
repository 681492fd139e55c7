"""Raw-vs-loaded checksum validation (SURVEY.md B-V2).

Reproduces BigDime's ``RawChecksumValidator``
[ref: bigdime-data-validation/io.bigdime.validation.RawChecksumValidator]
(``BASELINE.json:6`` "raw-vs-loaded checksum validation"). The reference
compares a raw-file checksum against WebHDFS GETFILECHECKSUM of the loaded
file; here the raw side is the ingest manifest's content checksum
(FIXTURES F3, computed at generation/ingest time) and the loaded side is
recomputed from the actual partition content as an order-insensitive
wrap-around uint64 sum of per-row content hashes (doc_id ‖ tokens) —
mergeable across blocks, insensitive to row order (parallel loads reorder
rows), sensitive to any content change.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from bigdime_ray.functions.hashing import (fold_checksum, i64_to_u64,
                                           row_content_hash)
from bigdime_ray.spi import (ScanResult, ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)
from bigdime_ray.state.sketches import ChecksumState, PartialState


@register_validator
class RawChecksumValidator(Validator):
    id = "raw_checksum"
    requires = ("manifest",)

    def scan_partition(self, tbl: pa.Table, partition_id: str,
                       ctx: ValidationContext, cache=None) -> ScanResult:
        hashes = (cache.row_hash if cache is not None
                  else row_content_hash(tbl["doc_id"], tbl["tokens"]))
        return ScanResult(state=ChecksumState(fold_checksum(hashes), len(hashes)))

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> ValidationResponse:
        entry = (ctx.manifest or {}).get(partition_id)
        if entry is None or "raw_checksum" not in entry:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.INCOMPLETE_SETUP,
                "no raw checksum for partition in ingest manifest")
        loaded = state.checksum if state is not None else 0
        raw = i64_to_u64(entry["raw_checksum"])
        if loaded != raw:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.FAILED,
                f"checksum mismatch: raw {raw:#018x}, loaded {loaded:#018x}",
                {"raw_checksum": raw, "loaded_checksum": loaded})
        return ValidationResponse(
            self.id, partition_id, ValidationResult.PASSED,
            f"checksum matched: {loaded:#018x}",
            {"raw_checksum": raw, "loaded_checksum": loaded})
