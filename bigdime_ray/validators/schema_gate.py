"""Schema conformance gate (SURVEY.md B-V3).

Reproduces BigDime's ColumnCount/ColumnOrder/ColumnType validators
[ref: bigdime-data-validation ColumnCountValidator, ColumnOrderValidator,
ColumnTypeValidator] — declared schema (metadata store analog:
``ValidationContext.declared_schema``) vs the actual per-partition parquet
footer schema. Pure metadata comparison: reads footers only, no data pass,
and runs BEFORE the scan so a bad-schema partition never reaches the
content validators (they report INCOMPLETE_SETUP for it instead).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pyarrow.parquet as pq

from bigdime_ray.schema import check_schema
from bigdime_ray.spi import (ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)


@register_validator
class SchemaGateValidator(Validator):
    id = "schema"
    requires = ("declared_schema",)
    scans = False

    def check_partition_files(self, partition_id: str, files: list[str],
                              ctx: ValidationContext) -> ValidationResponse:
        """Footer-only schema check of every file in one partition.

        Footer reads are metadata-only (KBs per file); parallelized with a
        thread pool here. At 100 TB scale this loop itself is fanned out —
        the pipeline shards partitions over Ray tasks when there are many.
        """
        if not files:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.NOT_READY,
                "partition has no data files")
        problems: list[str] = []
        if len(files) <= 2:  # pool spawn costs more than 1-2 footer reads
            schemas = [pq.read_schema(f) for f in files]
        else:
            with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
                schemas = list(ex.map(pq.read_schema, files))
        for f, sch in zip(files, schemas):
            rep = check_schema(sch, ctx.declared_schema)
            if not rep.ok:
                problems.append(f"{f}: " + "; ".join(rep.problems))
        if problems:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.FAILED,
                "schema mismatch: " + " | ".join(problems[:5]),
                {"bad_files": len(problems), "files": len(files)})
        return ValidationResponse(
            self.id, partition_id, ValidationResult.PASSED,
            f"schema conforms ({len(files)} files)", {"files": len(files)})
