"""Validator SPI — the engine's plugin API (SURVEY.md B-V0).

Reproduces the reference's validator contract
(``io.bigdime.core.validation.Validator`` → ``ValidationResponse`` with
``ValidationResult`` ∈ {PASSED, FAILED, NOT_READY, INCOMPLETE_SETUP} and an
``@Factory(id=...)`` registry — SURVEY.md §2A V0, ``BASELINE.json:6``
"per-handler ValidationResponse pass/fail") re-shaped for Ray Data's
execution model. A validator contributes up to three hooks:

1. ``check_setup(ctx)``   — side-input gate; a problem → INCOMPLETE_SETUP
   for every partition, no data pass (reference INCOMPLETE_SETUP branch).
2. ``scan_partition(tbl, partition_id, ctx) -> ScanResult`` — vectorized
   per-(block, partition) work inside the single shared ``map_batches``
   scan pass: row-level violations + a mergeable ``PartialState``.
3. ``finalize(partition_id, state, ctx) -> ValidationResponse`` — turn the
   merged per-partition state into the verdict.

Validators whose semantics need a shuffle (uniqueness, row-equality,
per-source skew stats) instead implement ``run_global(ds, ctx)`` and are
scheduled by the pipeline after the scan pass.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa

from bigdime_ray.state.sketches import PartialState


class ValidationResult(str, Enum):
    PASSED = "PASSED"
    FAILED = "FAILED"
    NOT_READY = "NOT_READY"
    INCOMPLETE_SETUP = "INCOMPLETE_SETUP"


@dataclass
class ValidationResponse:
    validator_id: str
    partition_id: str
    result: ValidationResult
    comment: str = ""
    metrics: dict = field(default_factory=dict)

    def to_row(self) -> dict:
        return {
            "partition_id": self.partition_id,
            "validator_id": self.validator_id,
            "result": self.result.value,
            "comment": self.comment,
            "metrics": json.dumps(self.metrics, default=str),
        }


@dataclass
class ScanResult:
    """Output of one validator over one (block, partition) slice."""

    state: Optional[PartialState] = None
    viol_doc_ids: Sequence = ()
    viol_reason: str = ""
    viol_details: Optional[Sequence] = None  # per-row detail strings (optional)


@dataclass
class ValidationContext:
    """Run-wide side inputs + thresholds, broadcast once (``ray.put``) to
    the scan actor pool — the reference's MetadataStore/profile lookups.
    """

    declared_schema: pa.Schema | None = None
    vocab: int = 32000
    catalog: Optional[frozenset] = None          # allowed `source` values (F2)
    catalog_bloom: Optional[Any] = None          # BloomFilter scale path
    catalog_max_n_tok: Optional[dict] = None
    manifest: Optional[dict] = None              # partition_id -> {expected_rows, raw_checksum} (F3)
    profile: Optional[Any] = None                # ReferenceProfile (F4)
    reference_path: Optional[str] = None         # reference ingest dir (F5)
    chi2_pvalue_min: float = 0.001
    ks_d_max: float = 0.15
    violation_cap_per_block: int = 1000
    thresholds: dict = field(default_factory=dict)
    partitions: list = field(default_factory=list)   # partition ids in this run
    #: exact input row count from parquet footers (plan-time, cheap) —
    #: drives the automatic scale-strategy dispatch
    estimated_rows: int = 0
    #: driver-side only (set after the broadcast ``ray.put``): global
    #: duplicate doc_id hashes precomputed by the drain-overlapped
    #: ``IncrementalDupDetector`` — uniqueness.run_global uses them
    #: instead of re-deriving from per-partition states
    precomputed_dup_hashes: Optional[Any] = None
    #: driver-side only: ``columns -> Dataset`` factory for a fresh
    #: column-pruned read of the run's input (projection does not push
    #: through map stages, so re-reading ``ds`` would deserialize the
    #: tokens payload again)
    narrow_reader: Optional[Any] = None


class Validator:
    """Base class. Subclasses set ``id`` and override the hooks they need."""

    id: str = "?"
    #: side inputs that must be present in the ctx, else INCOMPLETE_SETUP
    requires: tuple[str, ...] = ()
    #: True if this validator participates in the shared scan pass
    scans: bool = True
    #: finalize from another validator's merged state (e.g. drift checks
    #: reuse "column_stats") — None means use this validator's own state
    state_source: str | None = None

    def check_setup(self, ctx: ValidationContext) -> Optional[str]:
        for attr in self.requires:
            if getattr(ctx, attr, None) is None:
                return f"missing side input '{attr}'"
        return None

    def scan_partition(self, tbl: pa.Table, partition_id: str,
                       ctx: ValidationContext, cache=None) -> ScanResult:
        """``cache`` is a stages.scan.ScanCache sharing per-batch derived
        arrays (flattened tokens, lengths, hashes) across validators —
        use it; the scan pass is memory-bandwidth-bound."""
        return ScanResult()

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> Optional[ValidationResponse]:
        return None

    def finalize_global(self, states: dict,
                        ctx: ValidationContext) -> list:
        """Cross-partition finalize: ``states`` maps partition_id → merged
        state for this validator. Return extra ValidationResponses (e.g.
        a "__global__" row). Default: none."""
        return []

    # ---- shuffle-phase validators override this instead ----
    def run_global(self, ds, ctx: ValidationContext):
        """Return (violations: pa.Table | Dataset | None,
        responses: list[ValidationResponse])."""
        raise NotImplementedError


_REGISTRY: dict[str, type[Validator]] = {}


def register_validator(cls: type[Validator]) -> type[Validator]:
    """Class decorator — the ``@Factory(id=...)`` analog."""
    if not cls.id or cls.id == "?":
        raise ValueError(f"{cls.__name__} must set a unique `id`")
    _REGISTRY[cls.id] = cls
    return cls


def get_validator(vid: str) -> type[Validator]:
    import bigdime_ray.validators  # noqa: F401  (populate registry)
    if vid not in _REGISTRY:
        raise KeyError(f"unknown validator id '{vid}'; known: {sorted(_REGISTRY)}")
    return _REGISTRY[vid]


def registered_validators() -> dict[str, type[Validator]]:
    import bigdime_ray.validators  # noqa: F401
    return dict(_REGISTRY)


def violations_table(partition_id: str, validator_id: str, doc_ids,
                     reason: str, details=None) -> pa.Table:
    """Build a violation-rows Arrow table (schema.VIOLATION_SCHEMA)."""
    n = len(doc_ids)
    doc_arr = pa.array(np.asarray(doc_ids, dtype=object), type=pa.string())
    det = (pa.array(np.asarray(details, dtype=object), type=pa.string())
           if details is not None else pa.nulls(n, pa.string()))
    return pa.table({
        "partition_id": pa.array([partition_id] * n, type=pa.string()),
        "validator_id": pa.array([validator_id] * n, type=pa.string()),
        "doc_id": doc_arr,
        "reason": pa.array([reason] * n, type=pa.string()),
        "detail": det,
    })
