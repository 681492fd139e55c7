"""Fault-isolating map: vectorized fast path, bisect on failure.

A 100 TB ingest ALWAYS contains rows that crash a transform (corrupt
payloads, pathological strings, schema drift survivors). The naive
fixes are both wrong at scale: per-row try/except turns a vectorized
kernel into a Python loop everywhere (paying for failures that almost
never happen), and letting the task raise kills the whole block (and
with retries exhausted, the job). ``quarantine_map`` keeps the batch
kernel vectorized for the 99.999 % case and, ONLY when a batch raises,
recursively bisects that batch to isolate the offending rows — log(n)
kernel calls per bad row, not n — emitting them to a quarantine side
output with the error message instead of failing the job.
"""

from __future__ import annotations

import traceback
from typing import Callable

import pyarrow as pa

from ray.data import Dataset

QUARANTINE_SCHEMA = pa.schema([
    ("__quarantined", pa.bool_()),
    ("row_json", pa.string()),
    ("error", pa.string()),
])


def _bisect_apply(fn: Callable[[pa.Table], pa.Table], batch: pa.Table,
                  good: list, bad: list) -> None:
    try:
        good.append(fn(batch))
        return
    except Exception as e:  # noqa: BLE001 — isolating arbitrary kernel faults
        if batch.num_rows <= 1:
            bad.append((batch, f"{type(e).__name__}: {e}"))
            return
    mid = batch.num_rows // 2
    _bisect_apply(fn, batch.slice(0, mid), good, bad)
    _bisect_apply(fn, batch.slice(mid), good, bad)


def quarantine_map(ds: Dataset, fn: Callable[[pa.Table], pa.Table],
                   out_schema: pa.Schema | None = None,
                   **map_kwargs) -> tuple[Dataset, Dataset]:
    """Apply a batch transform with per-row fault isolation.

    Returns ``(good, quarantine)``: ``good`` is ``fn`` applied to every
    batch with faulting rows REMOVED; ``quarantine`` holds one row per
    faulting input row — its JSON rendering plus the exception text —
    for offline triage/replay. Healthy batches pay exactly one ``fn``
    call (zero overhead); a batch with b bad rows pays O(b·log n)
    calls. Both outputs are lazy Datasets; the split happens inside the
    same map tasks (one pass over the data, no second read). ``fn``
    must be row-wise pure (output row i depends only on input row i) —
    bisection reorders batch boundaries, nothing else.

    An ALL-BAD block still needs fn's output schema so the good side
    never emits the zero-column empty blocks this repo's join/union
    machinery cannot normalize: resolution order is (a) any good
    part's schema, (b) fn on the empty slice (only attempted when
    needed — healthy batches pay exactly ONE fn call), (c) the
    explicit ``out_schema`` parameter — pass it when fn rejects empty
    input AND whole blocks can be poison."""

    def guarded(batch: pa.Table) -> pa.Table:
        good: list = []
        bad: list = []
        _bisect_apply(fn, batch, good, bad)
        schema = good[0].schema if good else None
        if schema is None and bad:
            try:
                schema = fn(batch.slice(0, 0)).schema
            except Exception:  # noqa: BLE001
                schema = out_schema
            if schema is None:
                # a marker-only block would become a zero-column empty
                # block after the good-side filter+drop — the class this
                # repo documents as crashing Dataset.join far downstream;
                # fail loudly at the source instead
                raise RuntimeError(
                    "quarantine_map: an all-poison block was seen and the "
                    "output schema could not be resolved (fn raised on the "
                    "empty probe slice). Pass out_schema= explicitly.")
        parts = []
        for g in good:
            if g.num_rows:
                # every block carries the three marker columns so both
                # downstream selects see a stable schema superset
                g = g.append_column("__quarantined",
                                    pa.array([False] * g.num_rows))
                g = g.append_column("row_json",
                                    pa.nulls(g.num_rows, pa.string()))
                parts.append(g.append_column(
                    "error", pa.nulls(g.num_rows, pa.string())))
        for b, err in bad:
            cols = {
                "__quarantined": pa.array([True] * b.num_rows),
                "row_json": pa.array(
                    [str(r) for r in b.to_pylist()], type=pa.string()),
                "error": pa.array([err] * b.num_rows,
                                  type=pa.string())}
            if schema is not None:
                for f in schema:
                    cols[f.name] = pa.nulls(b.num_rows, f.type)
            parts.append(pa.table(cols))
        if not parts:
            cols = {"__quarantined": pa.array([], pa.bool_()),
                    "row_json": pa.array([], pa.string()),
                    "error": pa.array([], pa.string())}
            if schema is not None:
                for f in schema:
                    cols[f.name] = pa.nulls(0, f.type)
            return pa.table(cols)
        return pa.concat_tables(parts, promote_options="default")

    out = ds.map_batches(guarded, batch_format="pyarrow", **map_kwargs)
    good_ds = out.filter(expr="__quarantined == False") \
        .drop_columns(["__quarantined", "row_json", "error"])
    quarantine_ds = out.filter(expr="__quarantined == True") \
        .select_columns(["row_json", "error"])
    return good_ds, quarantine_ds
