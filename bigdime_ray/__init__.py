"""bigdime_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch rewrite of the *capability* of BigDime's Data Validation
Service (reference: a-ninja/bigdime, see SURVEY.md; the reference mount was
empty this round — the authoritative spec is BASELINE.json `north_star` /
`north_rule` / `input_hint`) re-expressed idiomatically on Ray Data:

- input: Parquet tables of pre-tokenized training sequences
  ``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
- all hot paths are ``map_batches`` over zero-copy Arrow batches
- stateful stages (catalog lookups, profiles) are actor pools
- wide steps (uniqueness, per-key stats) are explicit hash shuffles with
  salt-based skew splitting on hot keys
- verdicts reproduce BigDime's ``ValidationResponse`` semantics
  (PASSED / FAILED / NOT_READY / INCOMPLETE_SETUP) per partition, plus a
  violation-row Dataset
- runs resume from a partition-granular checkpoint manifest with lineage
  and metrics (the RuntimeInfoStore analog)

NOTE (driver contract): nothing in this package calls ``ray.init()`` or
``ray.shutdown()``. Only ``bench.py``, CLI entry points and the pytest
session fixture own a Ray session.
"""

from bigdime_ray.spi import (  # noqa: F401
    ValidationResult,
    ValidationResponse,
    Validator,
    register_validator,
    get_validator,
    registered_validators,
)

__version__ = "0.1.0"
