"""Per-column statistics profile (SURVEY.md B-S1).

``BASELINE.json:6``: "per-column statistics (min/max/null-rate/n_tok
histograms via streaming t-digest sketches) computed in map_batches over
zero-copy Arrow batches". One composite mergeable state per
(block, partition): ColumnStats for every column, a bounded-vocab token-id
histogram (sparse np.bincount over the flattened child values — zero-copy)
and a mergeable t-digest over n_tok (Arrow's ``tdigest`` kernel is
terminal, hence the hand-rolled ``TDigestState``). The merged per-partition
state is also the input to the drift validators and, over a blessed run,
becomes the reference profile (FIXTURES F4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bigdime_ray.spi import (ScanResult, ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)
from bigdime_ray.state.sketches import (ColumnStatsState, HistogramState,
                                        PartialState, TDigestState)


@dataclass
class ProfileState(PartialState):
    column_stats: dict = field(default_factory=dict)
    token_histogram: HistogramState = field(default_factory=HistogramState)
    ntok_digest: TDigestState = field(default_factory=TDigestState)

    def merge(self, other: "ProfileState") -> "ProfileState":
        return ProfileState.merge_many([self, other])

    @staticmethod
    def merge_many(states: list) -> "ProfileState":
        cols = {}
        all_cols = set().union(*(s.column_stats for s in states))
        for c in all_cols:
            have = [s.column_stats[c] for s in states if c in s.column_stats]
            acc = have[0]
            for s in have[1:]:
                acc = acc.merge(s)
            cols[c] = acc
        return ProfileState(
            column_stats=cols,
            token_histogram=HistogramState.merge_many(
                [s.token_histogram for s in states]),
            ntok_digest=TDigestState.merge_many(
                [s.ntok_digest for s in states]))


def _col_stats(col: pa.ChunkedArray | pa.Array, numeric: bool) -> ColumnStatsState:
    nulls = pc.count(col, mode="only_null").as_py()
    if numeric:
        valid = pc.drop_null(col).to_numpy(zero_copy_only=False)
        return ColumnStatsState.from_numpy(valid, null_count=nulls, numeric=True)
    st = ColumnStatsState(count=len(col), null_count=nulls)
    if len(col) - nulls > 0:
        mm = pc.min_max(col)
        st.minimum = mm["min"].as_py()
        st.maximum = mm["max"].as_py()
    return st


@register_validator
class ColumnStatsValidator(Validator):
    id = "column_stats"

    def scan_partition(self, tbl: pa.Table, partition_id: str,
                       ctx: ValidationContext, cache=None) -> ScanResult:
        st = ProfileState()
        st.column_stats["n_tok"] = _col_stats(tbl["n_tok"], numeric=True)
        st.column_stats["doc_id"] = _col_stats(tbl["doc_id"], numeric=False)
        st.column_stats["source"] = _col_stats(tbl["source"], numeric=False)
        tok = tbl["tokens"]
        st.column_stats["tokens"] = ColumnStatsState(
            count=len(tok), null_count=pc.count(tok, mode="only_null").as_py())
        if cache is not None and cache.vocab == ctx.vocab:
            # fused scan kernel: histogram was accumulated in the shared
            # chunked pass — zero extra payload traversals here
            st.token_histogram = HistogramState.from_dense(
                cache.fused["hist"], ctx.vocab)
        else:
            flat = (cache.flat if cache is not None else
                    pc.list_flatten(tok if not isinstance(tok,
                                                          pa.ChunkedArray)
                                    else tok.combine_chunks()))
            vals = (flat.to_numpy(zero_copy_only=False)
                    if flat.null_count == 0
                    else pc.drop_null(flat).to_numpy(zero_copy_only=False))
            st.token_histogram = HistogramState.from_values(vals, ctx.vocab)
        ntok = pc.drop_null(tbl["n_tok"]).to_numpy(zero_copy_only=False)
        st.ntok_digest = TDigestState.from_values(ntok.astype(np.float64))
        return ScanResult(state=st)

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> ValidationResponse:
        if state is None:
            return ValidationResponse(self.id, partition_id,
                                      ValidationResult.NOT_READY,
                                      "no data scanned for partition")
        metrics = {c: s.to_dict() for c, s in state.column_stats.items()}
        metrics["ntok_quantiles"] = dict(zip(
            ["p01", "p25", "p50", "p75", "p99"],
            np.round(state.ntok_digest.quantile([.01, .25, .50, .75, .99]), 3).tolist()))
        metrics["token_histogram_total"] = state.token_histogram.total
        return ValidationResponse(self.id, partition_id, ValidationResult.PASSED,
                                  "column statistics computed", metrics)
