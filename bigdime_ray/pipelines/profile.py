"""Build a reference profile from a blessed run (FIXTURES F4).

Runs only the column-stats scan over the input and merges the per-
partition ProfileStates into one global ``ReferenceProfile`` — the drift
baseline consumed by DriftChi2/DriftKSValidator on later runs.
"""

from __future__ import annotations

from typing import Optional

import ray
from ray.data import Dataset

from bigdime_ray.sources.tokens import read_tokens
from bigdime_ray.spi import ValidationContext
from bigdime_ray.stages.scan import ScanWorker
from bigdime_ray.state.profile import ReferenceProfile
from bigdime_ray.state.sketches import PartialState, merge_states


def build_profile(input_dir: Optional[str] = None, ds: Optional[Dataset] = None,
                  vocab: int = 32000, concurrency="auto",
                  save_path: Optional[str] = None,
                  partitions: Optional[list] = None) -> ReferenceProfile:
    if ds is None:
        ds = read_tokens(input_dir, partitions=partitions,
                         batch_size=1 << 18)
    ctx = ValidationContext(vocab=vocab)
    ctx_ref = ray.put(ctx)
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from bigdime_ray.stages.scan import resolve_concurrency
    concurrency = resolve_concurrency(concurrency)
    if concurrency:
        union = ds.map_batches(ScanWorker,
                               fn_constructor_args=(["column_stats"], ctx_ref),
                               concurrency=concurrency, num_cpus=1, **kwargs)
    else:
        union = ds.map_batches(ScanWorker(["column_stats"], ctx), **kwargs)
    rows = union.take_all()
    states = [PartialState.from_bytes(r["payload"]) for r in rows
              if r["kind"] == "state"]
    acc = merge_states(states)
    prof = ReferenceProfile(column_stats=acc.column_stats,
                            token_histogram=acc.token_histogram,
                            ntok_digest=acc.ntok_digest)
    if save_path:
        prof.save(save_path)
    return prof


def update_profile(profile_path: str, input_dir: Optional[str] = None,
                   ds: Optional[Dataset] = None,
                   partitions: Optional[list] = None, vocab: int = 32000,
                   concurrency="auto",
                   save_path: Optional[str] = None) -> ReferenceProfile:
    """Incremental profile update (SURVEY 7.1 #6 / VERDICT r1 item 8).

    Scans ONLY the given data (e.g. the newly landed partitions via
    ``partitions=``) and merges the resulting states into the saved
    profile — every component is a mergeable state (ColumnStatsState /
    HistogramState / TDigestState), so incremental == full rebuild
    (equality-tested in tests/test_golden.py) at the cost of one scan
    over the new data alone."""
    base = ReferenceProfile.load(profile_path)
    delta = build_profile(input_dir=input_dir, ds=ds, vocab=vocab,
                          concurrency=concurrency, partitions=partitions)
    from bigdime_ray.state.sketches import (ColumnStatsState, HistogramState,
                                            TDigestState)
    cols = dict(base.column_stats)
    for c, st in delta.column_stats.items():
        cols[c] = cols[c].merge(st) if c in cols else st
    merged = ReferenceProfile(
        column_stats=cols,
        token_histogram=HistogramState.merge_many(
            [base.token_histogram, delta.token_histogram]),
        ntok_digest=TDigestState.merge_many(
            [base.ntok_digest, delta.ntok_digest]))
    merged.save(save_path or profile_path)
    return merged
