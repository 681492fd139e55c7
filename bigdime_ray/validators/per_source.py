"""Per-source statistics with skew handling (SURVEY.md B-V8).

``source`` is the skew-prone key (FIXTURES F1: one hot key holds ~40% of
rows). Two execution strategies from stages/shuffle.py, selectable via
``ctx.thresholds["per_source_strategy"]``:

- ``"preagg"`` (default): block-local combine inside map_batches → tiny
  groupby over partials. For these mergeable aggregates this removes the
  skew entirely (at most one partial row per key per block).
- ``"salted"``: the explicit salt-based skew split required by
  ``BASELINE.json:6`` — hot keys detected by sampling, split into
  hash-salt sub-keys, aggregated, salt stripped. Used when block
  pre-aggregation is not applicable; results are identical (metamorphic
  test in tests/test_shuffle.py).

Verdict (global, partition_id="__global__"): FAILED iff any source's
observed max n_tok exceeds the catalog's ``max_n_tok`` bound; the full
per-source stats table is attached as an artifact on the run report.
"""

from __future__ import annotations

from ray.data import Dataset

from bigdime_ray.stages.shuffle import (block_preagg_counts, detect_hot_keys,
                                        salted_aggregate)
from bigdime_ray.spi import (ValidationContext, ValidationResponse,
                             ValidationResult, Validator, register_validator)

GLOBAL = "__global__"


@register_validator
class PerSourceStatsValidator(Validator):
    id = "per_source_stats"
    requires = ("catalog",)
    scans = False

    def run_global(self, ds: Dataset, ctx: ValidationContext):
        strategy = ctx.thresholds.get("per_source_strategy", "preagg")
        proj = ds.select_columns(["source", "n_tok", "doc_id"])
        if strategy == "salted":
            hot = detect_hot_keys(
                proj, "source",
                sample_frac=ctx.thresholds.get("hot_key_sample_frac", 0.05),
                target_rows_per_group=ctx.thresholds.get(
                    "target_rows_per_group", 1_000_000))
            stats = salted_aggregate(proj, "source", "n_tok", hot).to_pandas()
            stats = stats.rename(columns={"vsum": "ntok_sum", "vmin": "ntok_min",
                                          "vmax": "ntok_max"})
        else:
            stats = block_preagg_counts(
                proj.select_columns(["source", "n_tok"]), ["source"]).to_pandas()
        stats["ntok_mean"] = stats["ntok_sum"] / stats["cnt"]

        over = []
        bounds = ctx.catalog_max_n_tok or {}
        for _, row in stats.iterrows():
            bound = bounds.get(row["source"])
            if bound is not None and row["ntok_max"] > bound:
                over.append(f"{row['source']}: max n_tok {int(row['ntok_max'])}"
                            f" > bound {bound}")
        metrics = {
            "num_sources": int(len(stats)),
            "strategy": strategy,
            "per_source": {
                r["source"]: {"cnt": int(r["cnt"]),
                              "ntok_mean": round(float(r["ntok_mean"]), 3),
                              "ntok_max": int(r["ntok_max"])}
                for _, r in stats.sort_values("cnt", ascending=False)
                                 .head(50).iterrows()},
        }
        if over:
            resp = ValidationResponse(self.id, GLOBAL, ValidationResult.FAILED,
                                      "; ".join(over[:10]), metrics)
        else:
            resp = ValidationResponse(self.id, GLOBAL, ValidationResult.PASSED,
                                      f"{len(stats)} sources within bounds",
                                      metrics)
        resp.artifact = stats  # per-source stats table for the run report
        return None, [resp]
