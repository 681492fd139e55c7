"""Referential check: ``source`` → allowed catalog (SURVEY.md B-V7).

``BASELINE.json:6``: "source→allowed-catalog referential checks via
broadcast hash lookup in stateful actor-pool validators". The catalog
(FIXTURES F2) is broadcast once via ``ray.put`` as part of the
ValidationContext; the scan actor pool receives it in ``__init__`` and
this validator does a vectorized set-membership (``pc.is_in`` against a
cached Arrow value-set) per batch — a broadcast anti-join, no shuffle.
Also enforces the catalog's optional per-source ``max_n_tok`` bound.
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
class ReferentialValidator(Validator):
    id = "referential"
    requires = ()  # catalog OR catalog_bloom (checked in check_setup)

    def check_setup(self, ctx: ValidationContext):
        if ctx.catalog is None and ctx.catalog_bloom is None:
            return "missing side input 'catalog' (or 'catalog_bloom')"
        return None

    def __init__(self) -> None:
        self._value_set: Optional[pa.Array] = None  # built once per actor
        self._bounds_np: Optional[np.ndarray] = None  # aligned to _value_set

    def scan_partition(self, tbl: pa.Table, partition_id: str,
                       ctx: ValidationContext, cache=None) -> ScanResult:
        src = tbl["source"]
        if ctx.catalog is not None:
            if self._value_set is None:
                cat = sorted(ctx.catalog)
                self._value_set = pa.array(cat, type=pa.string())
                if ctx.catalog_max_n_tok:
                    self._bounds_np = np.array(
                        [ctx.catalog_max_n_tok.get(s, np.iinfo(np.int64).max)
                         for s in cat], dtype=np.int64)
            known = pc.is_in(src, value_set=self._value_set)
            bad = pc.fill_null(pc.invert(known), True)  # null src → violation
        else:
            # Bloom scale path: not-in-filter ⇒ definite violation;
            # in-filter may miss a violation at the filter's FP rate
            # (documented ε — functions/bloom.py)
            from bigdime_ray.functions.hashing import hash_string_column
            h = hash_string_column(src)
            known_np = ctx.catalog_bloom.contains_hashes(h)
            null_np = pc.is_null(src).to_numpy(zero_copy_only=False)
            bad = pa.array(~known_np | null_np)
        if self._bounds_np is not None:
            # per-source n_tok bound via index_in gather — no Python loop
            idx = (pc.fill_null(pc.index_in(src, value_set=self._value_set),
                                -1).to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            bounds = np.where(idx >= 0, self._bounds_np[np.maximum(idx, 0)],
                              np.iinfo(np.int64).max)
            ntok = (pc.fill_null(tbl["n_tok"], 0)
                    .to_numpy(zero_copy_only=False).astype(np.int64))
            over = ntok > bounds
            bad = pc.or_(bad, pa.array(over))
        n_bad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
        if n_bad == 0:
            return ScanResult(state=CountState(0))
        idx = np.nonzero(bad.to_numpy(zero_copy_only=False))[0]
        idx = idx[: ctx.violation_cap_per_block]
        doc_ids = tbl["doc_id"].take(pa.array(idx)).to_numpy(zero_copy_only=False)
        srcs = tbl["source"].take(pa.array(idx)).to_numpy(zero_copy_only=False)
        details = [f"source={s!r}" for s in srcs]
        return ScanResult(state=CountState(int(n_bad)), viol_doc_ids=doc_ids,
                          viol_reason="source not in catalog or over bound",
                          viol_details=details)

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> ValidationResponse:
        n_bad = state.n if state is not None else 0
        if n_bad:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.FAILED,
                f"{n_bad} rows violate source catalog constraints",
                {"violations": n_bad})
        return ValidationResponse(self.id, partition_id, ValidationResult.PASSED,
                                  "all sources in catalog", {"violations": 0})
