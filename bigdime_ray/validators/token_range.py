"""Token-range / token-null check (SURVEY.md B-V5).

Row-level invariant: every element of ``tokens`` is non-null and in
``[0, vocab)`` — the constraint-generalization of the reference's
column-type validation to list payloads. Operates on the flattened child
values array (zero-copy ``pc.list_flatten``); violating element positions
are mapped back to rows with a vectorized ``np.searchsorted`` over the
row-offset prefix sums — no Python loop over rows.
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
class TokenRangeValidator(Validator):
    id = "token_range"

    def scan_partition(self, tbl: pa.Table, partition_id: str,
                       ctx: ValidationContext, cache=None) -> ScanResult:
        if cache is not None and cache.vocab == ctx.vocab:
            # fused single-pass kernel: bad/null POSITIONS come from the
            # shared chunked pass — no extra traversal of the payload
            col, offsets = cache.tokens, cache.offsets
            f = cache.fused
            bad_pos, vals = f["bad_pos"], f["vals"]
            null_set = f["null_pos"]
            inner_null_at = (np.isin(bad_pos, null_set)
                             if len(null_set) else
                             np.zeros(len(bad_pos), dtype=bool))
        elif cache is not None:
            col, offsets, flat = cache.tokens, cache.offsets, cache.flat
            bad_pos, vals, inner_null_at = self._scan_flat(flat, ctx)
        else:
            col = tbl["tokens"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lengths = (pc.fill_null(pc.list_value_length(col), 0)
                       .to_numpy(zero_copy_only=False).astype(np.int64))
            offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            flat = pc.list_flatten(col)
            bad_pos, vals, inner_null_at = self._scan_flat(flat, ctx)
        null_rows = pc.is_null(col).to_numpy(zero_copy_only=False)
        if len(bad_pos) == 0 and not null_rows.any():
            return ScanResult(state=CountState(0))
        bad_row_idx = np.searchsorted(offsets, bad_pos, side="right") - 1
        bad_rows = np.unique(np.concatenate(
            [bad_row_idx, np.nonzero(null_rows)[0]]))
        capped = bad_rows[: ctx.violation_cap_per_block]
        doc_ids = tbl["doc_id"].take(pa.array(capped)).to_numpy(zero_copy_only=False)
        details = []
        for r in capped:
            if null_rows[r]:
                details.append("tokens is null")
            else:
                j = np.nonzero(bad_row_idx == r)[0][0]
                k = bad_pos[j]
                v = "null" if inner_null_at[j] else str(vals[k])
                details.append(f"token[{k - offsets[r]}]={v} outside [0,{ctx.vocab})")
        return ScanResult(state=CountState(int(len(bad_rows))),
                          viol_doc_ids=doc_ids,
                          viol_reason="token out of range or null",
                          viol_details=details)

    @staticmethod
    def _scan_flat(flat: pa.Array, ctx: ValidationContext):
        """Unfused fallback: full boolean pass over the flat values.
        Returns (bad_pos, vals, inner_null_at_bad_pos)."""
        if flat.null_count:
            inner_null = pc.is_null(flat).to_numpy(zero_copy_only=False)
            vals = pc.fill_null(flat, 0).to_numpy(zero_copy_only=False)
        else:
            inner_null = np.zeros(len(flat), dtype=bool)
            vals = flat.to_numpy(zero_copy_only=False)
        bad_elem = inner_null | (vals < 0) | (vals >= ctx.vocab)
        bad_pos = np.nonzero(bad_elem)[0]
        return bad_pos, vals, inner_null[bad_pos]

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> ValidationResponse:
        n_bad = state.n if state is not None else 0
        if n_bad:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.FAILED,
                f"{n_bad} rows with out-of-range or null tokens",
                {"violations": n_bad, "vocab": ctx.vocab})
        return ValidationResponse(self.id, partition_id, ValidationResult.PASSED,
                                  "all tokens in range", {"violations": 0})
