"""Per-source statistics with skew handling (SURVEY.md B-V8).

``source`` is the skew-prone key (FIXTURES F1: one hot key holds ~40% of
rows). The aggregates here (count / sum / min / max of n_tok per source)
are associative, so the scale-correct strategy is block-local combine
INSIDE the shared scan pass: each block contributes one tiny per-source
dict state (Arrow-native ``Table.group_by``), merged associatively — at
most (#blocks × #sources) partial rows ever exist, so the hot key never
concentrates on one reducer and no extra read pass is needed.

The explicit salt-based skew split demanded by ``BASELINE.json:6`` lives
in ``stages.shuffle.salted_aggregate`` — the path for per-key operations
that CANNOT be block-combined (non-mergeable state, key cardinality ≈
row count). Its equivalence to the unsalted groupby is metamorphic-
tested (tests/test_shuffle.py) and exercised against the DuckDB oracle
by the ``per_source_stats_salted`` entry in ``__ray_entry__.py``.

Verdicts: per-partition FAILED iff a source in that partition exceeds
the catalog's ``max_n_tok`` bound; plus one ``__global__`` row carrying
the merged per-source stats table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa

from bigdime_ray.spi import (ScanResult, ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)
from bigdime_ray.state.sketches import PartialState

GLOBAL = "__global__"


@dataclass
class PerSourceState(PartialState):
    """source -> [cnt, ntok_sum, ntok_min, ntok_max]."""

    stats: dict = field(default_factory=dict)

    @staticmethod
    def from_table(tbl: pa.Table) -> "PerSourceState":
        g = (tbl.select(["source", "n_tok"]).group_by(["source"])
             .aggregate([([], "count_all"), ("n_tok", "sum"),
                         ("n_tok", "min"), ("n_tok", "max")]))
        st = PerSourceState()
        cols = [g.column(i).to_pylist() for i in range(5)]
        for src, cnt, s, mn, mx in zip(*cols):
            st.stats[src] = [cnt, int(s or 0),
                             mn if mn is not None else 0,
                             mx if mx is not None else 0]
        return st

    def merge(self, other: "PerSourceState") -> "PerSourceState":
        out = PerSourceState({k: list(v) for k, v in self.stats.items()})
        for k, (cnt, s, mn, mx) in other.stats.items():
            if k in out.stats:
                o = out.stats[k]
                out.stats[k] = [o[0] + cnt, o[1] + s, min(o[2], mn),
                                max(o[3], mx)]
            else:
                out.stats[k] = [cnt, s, mn, mx]
        return out


@register_validator
class PerSourceStatsValidator(Validator):
    id = "per_source_stats"
    requires = ("catalog",)

    def scan_partition(self, tbl: pa.Table, partition_id: str,
                       ctx: ValidationContext, cache=None) -> ScanResult:
        return ScanResult(state=PerSourceState.from_table(tbl))

    def _over_bounds(self, state: PerSourceState,
                     ctx: ValidationContext) -> list[str]:
        bounds = ctx.catalog_max_n_tok or {}
        out = []
        for src, (cnt, s, mn, mx) in sorted(state.stats.items()):
            bound = bounds.get(src)
            if bound is not None and mx > bound:
                out.append(f"{src}: max n_tok {mx} > bound {bound}")
        return out

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> ValidationResponse:
        if state is None:
            return ValidationResponse(self.id, partition_id,
                                      ValidationResult.NOT_READY,
                                      "no scan state for partition")
        over = self._over_bounds(state, ctx)
        metrics = {"num_sources": len(state.stats)}
        if over:
            return ValidationResponse(self.id, partition_id,
                                      ValidationResult.FAILED,
                                      "; ".join(over[:10]), metrics)
        return ValidationResponse(self.id, partition_id,
                                  ValidationResult.PASSED,
                                  f"{len(state.stats)} sources within bounds",
                                  metrics)

    def finalize_global(self, states: dict, ctx: ValidationContext) -> list:
        if not states:
            return []
        acc = None
        for st in states.values():
            acc = st if acc is None else acc.merge(st)
        top = sorted(acc.stats.items(), key=lambda kv: -kv[1][0])[:50]
        metrics = {
            "num_sources": len(acc.stats),
            "per_source": {src: {"cnt": cnt,
                                 "ntok_mean": round(s / cnt, 3) if cnt else 0,
                                 "ntok_max": mx}
                           for src, (cnt, s, mn, mx) in top},
        }
        over = self._over_bounds(acc, ctx)
        if over:
            resp = ValidationResponse(self.id, GLOBAL, ValidationResult.FAILED,
                                      "; ".join(over[:10]), metrics)
        else:
            resp = ValidationResponse(self.id, GLOBAL, ValidationResult.PASSED,
                                      f"{len(acc.stats)} sources within "
                                      "bounds", metrics)
        import pandas as pd
        resp.artifact = pd.DataFrame(
            [{"source": src, "cnt": v[0], "ntok_sum": v[1],
              "ntok_min": v[2], "ntok_max": v[3]}
             for src, v in sorted(acc.stats.items())])
        return [resp]
