"""Distribution-drift validators (SURVEY.md B-V9 / B-V10).

``BASELINE.json:6``: "distribution-drift checks (chi-square on token-id
histograms, KS on n_tok) against a reference profile". These are
finalize-only validators: they reuse the merged per-partition
``ProfileState`` produced by the shared scan pass (``state_source =
"column_stats"`` — no second data pass) and compare it against the
blessed-run ``ReferenceProfile`` (FIXTURES F4):

- χ²: Pearson statistic of the partition's token-id histogram vs the
  profile histogram (expected rescaled to the partition total, small
  bins pooled); p-value from a hand-rolled regularized incomplete gamma
  (scipy unavailable). p < ``ctx.chi2_pvalue_min`` → FAILED.
- KS: two-sample D between the partition's n_tok t-digest CDF and the
  profile digest CDF, evaluated on the union centroid grid.
  D > ``ctx.ks_d_max`` → FAILED.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from bigdime_ray.functions.stats import (chi2_sf, chi2_statistic, ks_pvalue,
                                         ks_statistic_from_cdfs)
from bigdime_ray.spi import (ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)
from bigdime_ray.state.sketches import PartialState


@register_validator
class DriftChi2Validator(Validator):
    id = "drift_chi2"
    requires = ("profile",)
    scans = False
    state_source = "column_stats"

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> ValidationResponse:
        if state is None:
            return ValidationResponse(self.id, partition_id,
                                      ValidationResult.NOT_READY,
                                      "no scan state for partition")
        size = max(state.token_histogram.size, ctx.profile.token_histogram.size)
        obs = np.zeros(size, dtype=np.int64)
        exp = np.zeros(size, dtype=np.int64)
        obs[: state.token_histogram.size] = state.token_histogram.dense()
        exp[: ctx.profile.token_histogram.size] = ctx.profile.token_histogram.dense()
        stat, dof = chi2_statistic(obs, exp)
        p = chi2_sf(stat, dof) if dof > 0 else 1.0
        metrics = {"chi2": round(stat, 3), "dof": dof, "p_value": p,
                   "threshold_p": ctx.chi2_pvalue_min}
        if p < ctx.chi2_pvalue_min:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.FAILED,
                f"token-id distribution drift: chi2={stat:.1f} dof={dof} "
                f"p={p:.3g} < {ctx.chi2_pvalue_min}", metrics)
        return ValidationResponse(
            self.id, partition_id, ValidationResult.PASSED,
            f"no token-id drift (p={p:.3g})", metrics)


@register_validator
class DriftKSValidator(Validator):
    id = "drift_ks"
    requires = ("profile",)
    scans = False
    state_source = "column_stats"

    def finalize(self, partition_id: str, state: Optional[PartialState],
                 ctx: ValidationContext) -> ValidationResponse:
        if state is None:
            return ValidationResponse(self.id, partition_id,
                                      ValidationResult.NOT_READY,
                                      "no scan state for partition")
        cur, ref = state.ntok_digest, ctx.profile.ntok_digest
        if cur.total_weight == 0 or ref.total_weight == 0:
            return ValidationResponse(self.id, partition_id,
                                      ValidationResult.NOT_READY,
                                      "empty n_tok digest")
        grid = np.unique(np.concatenate([cur.means, ref.means,
                                         [cur.minimum, cur.maximum,
                                          ref.minimum, ref.maximum]]))
        d = ks_statistic_from_cdfs(grid, cur.cdf(grid), ref.cdf(grid))
        p = ks_pvalue(d, cur.total_weight, ref.total_weight)
        metrics = {"ks_d": round(d, 5), "p_value": p, "threshold_d": ctx.ks_d_max}
        if d > ctx.ks_d_max:
            return ValidationResponse(
                self.id, partition_id, ValidationResult.FAILED,
                f"n_tok distribution drift: D={d:.4f} > {ctx.ks_d_max}", metrics)
        return ValidationResponse(self.id, partition_id, ValidationResult.PASSED,
                                  f"no n_tok drift (D={d:.4f})", metrics)
