"""Validator implementations — importing this module populates the registry.

Each module docstring cites the reference capability it reproduces
(SURVEY.md §2A/§2B; the reference mount was empty this round, so citations
are to BASELINE.json and public-BigDime class paths per SURVEY.md §0).
"""

from bigdime_ray.validators.record_count import RecordCountValidator  # noqa: F401
from bigdime_ray.validators.checksum import RawChecksumValidator  # noqa: F401
from bigdime_ray.validators.schema_gate import SchemaGateValidator  # noqa: F401
from bigdime_ray.validators.ntok import NTokConsistencyValidator  # noqa: F401
from bigdime_ray.validators.token_range import TokenRangeValidator  # noqa: F401
from bigdime_ray.validators.referential import ReferentialValidator  # noqa: F401
from bigdime_ray.validators.stats_profile import ColumnStatsValidator  # noqa: F401
from bigdime_ray.validators.drift import DriftChi2Validator, DriftKSValidator  # noqa: F401
from bigdime_ray.validators.uniqueness import UniquenessValidator  # noqa: F401
from bigdime_ray.validators.per_source import PerSourceStatsValidator  # noqa: F401
from bigdime_ray.validators.row_equality import RowEqualityValidator  # noqa: F401
from bigdime_ray.validators.expression import make_expression_validator  # noqa: F401

DEFAULT_SUITE = [
    "schema", "record_count", "raw_checksum", "ntok_consistency",
    "token_range", "referential", "column_stats", "drift_chi2", "drift_ks",
    "uniqueness", "per_source_stats",
]

FULL_SUITE = DEFAULT_SUITE + ["row_equality"]
