"""User-defined row-predicate validators (SURVEY.md B-V0 extension
surface).

The reference's validator SPI is explicitly user-extensible (a new Java
class + ``@Factory(id=...)`` registration + naming the id in the adaptor
JSON config). This module is the engine-native equivalent for the most
common extension — "every row must satisfy P" — without writing a class:
``make_expression_validator`` turns a vectorized predicate into a fully
registered validator that participates in the shared scan pass, emits
capped violation rows, carries an exact mergeable violation count, and
verdicts FAILED/PASSED per partition exactly like the built-ins. It is
also the documentation-by-example for hand-written plugins: the
generated class exercises every scan-pass hook a custom validator needs.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

from bigdime_ray.spi import (ScanResult, ValidationContext,
                             ValidationResponse, ValidationResult,
                             Validator, register_validator)
from bigdime_ray.state.sketches import CountState, PartialState


def make_expression_validator(
        vid: str,
        predicate: Callable[[pa.Table], "np.ndarray | pa.Array"],
        reason: str,
        requires: tuple = ()) -> type[Validator]:
    """Build + register a row-level constraint validator.

    ``predicate(tbl) -> boolean mask of VIOLATING rows`` must be
    vectorized over the zero-copy Arrow block (pyarrow.compute / numpy —
    the scan pass is memory-bandwidth-bound, a Python row loop here
    would dominate it). The returned class is registered under ``vid``
    and selectable in any run's ``suite`` list; violation rows carry
    ``reason``; the partition verdict is FAILED iff any row violates
    (exact count in the mergeable state even when emitted rows are
    capped — same contract as the built-ins)."""

    class _ExpressionValidator(Validator):
        id = vid

        def check_setup(self, ctx: ValidationContext) -> Optional[str]:
            for attr in requires:
                if getattr(ctx, attr, None) is None:
                    return f"missing side input '{attr}'"
            return None

        def scan_partition(self, tbl: pa.Table, partition_id: str,
                           ctx: ValidationContext, cache=None
                           ) -> ScanResult:
            mask = predicate(tbl)
            if isinstance(mask, (pa.Array, pa.ChunkedArray)):
                mask = mask.to_numpy(zero_copy_only=False)
            mask = np.asarray(mask, dtype=bool)
            if mask.shape != (tbl.num_rows,):
                raise ValueError(
                    f"predicate for '{vid}' returned shape "
                    f"{mask.shape}, expected ({tbl.num_rows},)")
            n_bad = int(mask.sum())
            if n_bad == 0:
                return ScanResult(state=CountState(0))
            idx = np.nonzero(mask)[0][: ctx.violation_cap_per_block]
            doc_ids = tbl["doc_id"].take(pa.array(idx)) \
                .to_numpy(zero_copy_only=False)
            return ScanResult(state=CountState(n_bad),
                              viol_doc_ids=doc_ids, viol_reason=reason)

        def finalize(self, partition_id: str,
                     state: Optional[PartialState],
                     ctx: ValidationContext) -> ValidationResponse:
            n_bad = state.n if state is not None else 0
            if n_bad:
                return ValidationResponse(
                    vid, partition_id, ValidationResult.FAILED,
                    f"{n_bad} rows violate: {reason}",
                    {"violations": n_bad})
            return ValidationResponse(
                vid, partition_id, ValidationResult.PASSED, reason,
                {"violations": 0})

    _ExpressionValidator.__name__ = f"ExpressionValidator_{vid}"
    return register_validator(_ExpressionValidator)
