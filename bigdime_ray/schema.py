"""Declared input schema + conformance checking (the metadata-store analog).

BigDime holds declared schemas in a relational metadata store
(Metasegment → Entitee → Attribute) and validates the Hive table against
it with ColumnCount/ColumnOrder/ColumnType validators (SURVEY.md §2A
V3–V5). Here the declared schema is a ``pyarrow.Schema`` carried in the
run config; conformance is a pure metadata comparison (parquet footers —
no data pass), producing one structured report per partition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

VOCAB_SIZE = 32000

TOKENS_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string()),
    pa.field("tokens", pa.list_(pa.int32())),
    pa.field("n_tok", pa.int32()),
    pa.field("source", pa.string()),
])

VIOLATION_SCHEMA = pa.schema([
    pa.field("partition_id", pa.string()),
    pa.field("validator_id", pa.string()),
    pa.field("doc_id", pa.string()),
    pa.field("reason", pa.string()),
    pa.field("detail", pa.string()),
])

VERDICT_SCHEMA = pa.schema([
    pa.field("partition_id", pa.string()),
    pa.field("validator_id", pa.string()),
    pa.field("result", pa.string()),
    pa.field("comment", pa.string()),
    pa.field("metrics", pa.string()),  # JSON
])


@dataclass
class SchemaReport:
    """Result of comparing an actual schema against the declared one."""

    ok: bool = True
    problems: list[str] = field(default_factory=list)

    def fail(self, msg: str) -> None:
        self.ok = False
        self.problems.append(msg)


def _normalize(t: pa.DataType) -> pa.DataType:
    """large_string ≡ string, large_list ≡ list (input_hint: 'large_list ok')."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(_normalize(t.value_type))
    return t


def check_schema(actual: pa.Schema, declared: pa.Schema = TOKENS_SCHEMA,
                 strict_order: bool = True) -> SchemaReport:
    """Column count / order / type conformance (reference V3+V4+V5 semantics)."""
    rep = SchemaReport()
    # partition columns appended by hive-partitioned reads are not part of
    # the declared physical schema
    actual_fields = [f for f in actual if f.name != "partition_id"]
    if len(actual_fields) != len(declared):
        rep.fail(f"column count {len(actual_fields)} != declared {len(declared)}")
    declared_by_name = {f.name: f for f in declared}
    actual_names = [f.name for f in actual_fields]
    missing = [n for n in declared_by_name if n not in actual_names]
    extra = [n for n in actual_names if n not in declared_by_name]
    if missing:
        rep.fail(f"missing columns: {missing}")
    if extra:
        rep.fail(f"unexpected columns: {extra}")
    if strict_order and not missing and not extra:
        declared_names = [f.name for f in declared]
        if actual_names != declared_names:
            rep.fail(f"column order {actual_names} != declared {declared_names}")
    for f in actual_fields:
        d = declared_by_name.get(f.name)
        if d is not None and _normalize(f.type) != _normalize(d.type):
            rep.fail(f"column '{f.name}' type {f.type} != declared {d.type}")
    return rep
