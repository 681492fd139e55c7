"""Deterministic synthetic tokenized-sequence tables (SURVEY.md B-R2).

Generates the exact ``input_hint`` shape (``BASELINE.json:15``):
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
as a hive-partitioned parquet layout ``partition_id=pNNNN/part-0.parquet``
plus the side inputs from FIXTURES.md:

- F2 ``source_catalog.parquet`` — allowed sources (+ max_n_tok)
- F3 ``ingest_manifest.parquet`` — per-partition expected_rows +
  raw_checksum (computed with the engine's own content hash at
  generation time, i.e. the "raw side" of raw-vs-loaded checksum)
- F5 ``reference_ingest/`` — same rows, with optional planted per-row
  corruptions, for the row-level equality audit (B-V11)

Everything is seeded (``np.random.default_rng([seed, partition])``) so a
given (seed, shape) is byte-stable across processes — the determinism
contract the golden tests rely on. Defects are planted *after* clean
generation so each defect's affected doc_ids are returned for exact
assertions.

Scale note: generation is per-partition independent; ``generate_dataset``
fans out over Ray tasks when Ray is initialised (bench scale), else runs
a serial loop (unit-test scale). It never calls ``ray.init``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bigdime_ray.functions.hashing import fold_checksum, row_content_hash, u64_to_i64
from bigdime_ray.schema import TOKENS_SCHEMA, VOCAB_SIZE

DEFAULT_SOURCES = [
    "web", "books", "code", "wiki", "news", "forums", "papers", "legal",
    "patents", "subtitles", "recipes", "reviews", "mail", "chat", "docs",
    "social", "qa", "edu", "gov", "misc",
]


def source_probs(n: int = len(DEFAULT_SOURCES), hot_share: float = 0.4) -> np.ndarray:
    """Zipf-skewed with one hot key holding ``hot_share`` of rows (FIXTURES F1)."""
    rest = 1.0 / np.arange(1, n, dtype=np.float64)
    rest = rest / rest.sum() * (1.0 - hot_share)
    return np.concatenate([[hot_share], rest])


@dataclass
class SynthConfig:
    num_rows: int = 5000
    num_partitions: int = 8
    seed: int = 42
    vocab: int = VOCAB_SIZE
    len_mu: float = 4.0       # lognormal; FIXTURES spec is μ=6 — tests use 4 for speed
    len_sigma: float = 0.6
    len_max: int = 8192
    sources: list[str] = field(default_factory=lambda: list(DEFAULT_SOURCES))
    hot_share: float = 0.4


@dataclass
class DefectSpec:
    """Planted defects (FIXTURES F1 golden list). All off by default."""

    dup_intra: int = 0            # duplicate doc_id pairs inside one partition
    dup_cross: int = 0            # duplicate doc_id pairs across partitions
    bad_source: int = 0           # rows whose source is not in the catalog
    ntok_mismatch: int = 0        # rows with n_tok != len(tokens)
    token_oob: int = 0            # rows with a token <0 or >=vocab
    token_null: int = 0           # rows with a null inside tokens
    drift_partition: int | None = None   # shifted token dist + stretched n_tok
    manifest_count_off: int | None = None    # partition whose expected_rows lies
    manifest_checksum_off: int | None = None  # partition whose raw_checksum lies
    schema_variant: int | None = None    # partition written with reordered cols
    missing_file: int | None = None      # in manifest but data file absent
    ref_corrupt_rows: int = 0     # rows corrupted in the reference ingest (B-V11)


@dataclass
class Planted:
    """Ground truth of what was planted — keyed by validator."""

    dup_doc_ids: list[str] = field(default_factory=list)
    bad_source_doc_ids: list[str] = field(default_factory=list)
    ntok_mismatch_doc_ids: list[str] = field(default_factory=list)
    token_oob_doc_ids: list[str] = field(default_factory=list)
    token_null_doc_ids: list[str] = field(default_factory=list)
    ref_corrupt_doc_ids: list[str] = field(default_factory=list)
    drift_partition: str | None = None
    manifest_count_off: str | None = None
    manifest_checksum_off: str | None = None
    schema_variant: str | None = None
    missing_file: str | None = None


def partition_name(i: int) -> str:
    return f"p{i:04d}"


def gen_partition(cfg: SynthConfig, part: int, n_rows: int) -> pa.Table:
    """One clean partition, fully vectorized."""
    rng = np.random.default_rng([cfg.seed, part])
    lengths = np.clip(
        np.rint(rng.lognormal(cfg.len_mu, cfg.len_sigma, n_rows)).astype(np.int64),
        1, cfg.len_max)
    total = int(lengths.sum())
    values = rng.integers(0, cfg.vocab, total, dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))
    probs = source_probs(len(cfg.sources), cfg.hot_share)
    src_idx = rng.choice(len(cfg.sources), n_rows, p=probs)
    sources = np.asarray(cfg.sources, dtype=object)[src_idx]
    seq = np.arange(n_rows) + part * 10_000_000
    doc_ids = np.char.add(
        np.char.add(sources.astype(str), "-"),
        np.char.zfill(seq.astype(str), 10)).astype(object)
    return pa.table({
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(lengths.astype(np.int32)),
        "source": pa.array(sources, type=pa.string()),
    }, schema=TOKENS_SCHEMA)


def _set_row(table: pa.Table, row: int, **updates) -> pa.Table:
    """Return table with one row's columns replaced (test-scale only)."""
    cols = {}
    for name in table.column_names:
        col = table[name]
        if name in updates:
            pylist = col.to_pylist()
            pylist[row] = updates[name]
            typ = table.schema.field(name).type
            cols[name] = pa.array(pylist, type=typ)
        else:
            cols[name] = col
    return pa.table(cols, schema=table.schema)


def _plant_defects(tables: dict[int, pa.Table], cfg: SynthConfig,
                   defects: DefectSpec) -> Planted:
    planted = Planted()
    rng = np.random.default_rng([cfg.seed, 999_983])
    parts = sorted(tables)

    def pick_row(p: int) -> int:
        return int(rng.integers(0, tables[p].num_rows))

    # drift regenerates a whole partition's tokens/n_tok — apply it FIRST so
    # later row-level plants are not overwritten by it
    if defects.drift_partition is not None:
        p = defects.drift_partition
        t = tables[p]
        rng_d = np.random.default_rng([cfg.seed, p, 7])
        n = t.num_rows
        lengths = np.clip(np.rint(rng_d.lognormal(cfg.len_mu + 0.9, cfg.len_sigma * 1.6, n)
                                  ).astype(np.int64), 1, cfg.len_max)
        total = int(lengths.sum())
        # shifted token-id distribution: squeeze into the low third of the vocab
        values = rng_d.integers(0, max(2, cfg.vocab // 3), total, dtype=np.int32)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lengths, out=offsets[1:])
        tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))
        tables[p] = pa.table({
            "doc_id": t["doc_id"], "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32)), "source": t["source"],
        }, schema=TOKENS_SCHEMA)
        planted.drift_partition = partition_name(p)

    for _ in range(defects.dup_intra):
        p = parts[int(rng.integers(len(parts)))]
        a, b = pick_row(p), pick_row(p)
        while b == a:
            b = pick_row(p)
        dup_id = tables[p]["doc_id"][a].as_py()
        tables[p] = _set_row(tables[p], b, doc_id=dup_id)
        planted.dup_doc_ids.append(dup_id)
    for _ in range(defects.dup_cross):
        p1, p2 = rng.choice(parts, 2, replace=False)
        a, b = pick_row(int(p1)), pick_row(int(p2))
        dup_id = tables[int(p1)]["doc_id"][a].as_py()
        tables[int(p2)] = _set_row(tables[int(p2)], b, doc_id=dup_id)
        planted.dup_doc_ids.append(dup_id)
    for _ in range(defects.bad_source):
        p = parts[int(rng.integers(len(parts)))]
        r = pick_row(p)
        tables[p] = _set_row(tables[p], r, source="__rogue__")
        planted.bad_source_doc_ids.append(tables[p]["doc_id"][r].as_py())
    for _ in range(defects.ntok_mismatch):
        p = parts[int(rng.integers(len(parts)))]
        r = pick_row(p)
        bad = tables[p]["n_tok"][r].as_py() + 3
        tables[p] = _set_row(tables[p], r, n_tok=bad)
        planted.ntok_mismatch_doc_ids.append(tables[p]["doc_id"][r].as_py())
    for _ in range(defects.token_oob):
        p = parts[int(rng.integers(len(parts)))]
        r = pick_row(p)
        toks = tables[p]["tokens"][r].as_py()
        toks[0] = cfg.vocab + 17
        tables[p] = _set_row(tables[p], r, tokens=toks)
        planted.token_oob_doc_ids.append(tables[p]["doc_id"][r].as_py())
    for _ in range(defects.token_null):
        p = parts[int(rng.integers(len(parts)))]
        r = pick_row(p)
        toks = tables[p]["tokens"][r].as_py()
        toks[min(1, len(toks) - 1)] = None
        tables[p] = _set_row(tables[p], r, tokens=toks)
        planted.token_null_doc_ids.append(tables[p]["doc_id"][r].as_py())
    if defects.manifest_count_off is not None:
        planted.manifest_count_off = partition_name(defects.manifest_count_off)
    if defects.manifest_checksum_off is not None:
        planted.manifest_checksum_off = partition_name(defects.manifest_checksum_off)
    if defects.schema_variant is not None:
        planted.schema_variant = partition_name(defects.schema_variant)
    if defects.missing_file is not None:
        planted.missing_file = partition_name(defects.missing_file)
    return planted


def _partition_checksum(t: pa.Table) -> int:
    return fold_checksum(row_content_hash(t["doc_id"], t["tokens"]))


def write_catalog(out_dir: str, cfg: SynthConfig) -> str:
    path = os.path.join(out_dir, "source_catalog.parquet")
    pq.write_table(pa.table({
        "source": pa.array(cfg.sources, type=pa.string()),
        "max_n_tok": pa.array([cfg.len_max] * len(cfg.sources), type=pa.int32()),
    }), path)
    return path


def generate_dataset_parallel(out_dir: str, cfg: SynthConfig,
                              with_manifest: bool = True) -> None:
    """Bench-scale clean generation: one Ray task per partition (Ray must
    already be initialised by the caller — bench.py owns the session).
    Writes the same layout as ``generate_dataset`` (no defects)."""
    import ray

    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    rows_per_part = [cfg.num_rows // cfg.num_partitions] * cfg.num_partitions
    rows_per_part[-1] += cfg.num_rows - sum(rows_per_part)

    @ray.remote(num_cpus=1)
    def gen_one(i: int, n_rows: int) -> dict:
        t = gen_partition(cfg, i, n_rows)
        pname = partition_name(i)
        pdir = os.path.join(data_dir, f"partition_id={pname}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(t, os.path.join(pdir, "part-0.parquet"))
        return {"partition_id": pname, "expected_rows": t.num_rows,
                "raw_checksum": u64_to_i64(_partition_checksum(t))}

    manifest_rows = ray.get([gen_one.remote(i, rows_per_part[i])
                             for i in range(cfg.num_partitions)])
    if with_manifest:
        manifest_rows.sort(key=lambda r: r["partition_id"])
        pq.write_table(pa.table({
            "partition_id": pa.array([r["partition_id"] for r in manifest_rows]),
            "expected_rows": pa.array([r["expected_rows"] for r in manifest_rows],
                                      type=pa.int64()),
            "raw_checksum": pa.array([r["raw_checksum"] for r in manifest_rows],
                                     type=pa.int64()),
        }), os.path.join(out_dir, "ingest_manifest.parquet"))
    write_catalog(out_dir, cfg)


def generate_dataset(out_dir: str, cfg: SynthConfig | None = None,
                     defects: DefectSpec | None = None,
                     write_reference: bool = False) -> Planted:
    """Generate the full fixture layout under ``out_dir``.

    Layout::

        out_dir/data/partition_id=pNNNN/part-0.parquet
        out_dir/source_catalog.parquet
        out_dir/ingest_manifest.parquet
        out_dir/reference_ingest/partition_id=pNNNN/part-0.parquet   (optional)
    """
    cfg = cfg or SynthConfig()
    defects = defects or DefectSpec()
    rows_per_part = [cfg.num_rows // cfg.num_partitions] * cfg.num_partitions
    rows_per_part[-1] += cfg.num_rows - sum(rows_per_part)

    tables = {i: gen_partition(cfg, i, rows_per_part[i])
              for i in range(cfg.num_partitions)}
    planted = _plant_defects(tables, cfg, defects)

    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)

    manifest_rows = []
    for i, t in tables.items():
        pname = partition_name(i)
        pdir = os.path.join(data_dir, f"partition_id={pname}")
        os.makedirs(pdir, exist_ok=True)
        expected_rows = t.num_rows
        checksum = _partition_checksum(t)
        if planted.manifest_count_off == pname:
            expected_rows += 41
        if planted.manifest_checksum_off == pname:
            checksum = (checksum + 1) & 0xFFFFFFFFFFFFFFFF
        manifest_rows.append({
            "partition_id": pname,
            "expected_rows": expected_rows,
            "raw_checksum": u64_to_i64(checksum),
        })
        if planted.missing_file == pname:
            continue  # listed in the manifest, no data file → NOT_READY
        if planted.schema_variant == pname:
            # reordered columns (and n_tok widened) — trips the schema gate
            variant = pa.table({
                "source": t["source"], "doc_id": t["doc_id"],
                "n_tok": t["n_tok"].cast(pa.int64()), "tokens": t["tokens"],
            })
            pq.write_table(variant, os.path.join(pdir, "part-0.parquet"))
        else:
            pq.write_table(t, os.path.join(pdir, "part-0.parquet"))

    pq.write_table(pa.table({
        "partition_id": pa.array([r["partition_id"] for r in manifest_rows]),
        "expected_rows": pa.array([r["expected_rows"] for r in manifest_rows],
                                  type=pa.int64()),
        "raw_checksum": pa.array([r["raw_checksum"] for r in manifest_rows],
                                 type=pa.int64()),
    }), os.path.join(out_dir, "ingest_manifest.parquet"))

    write_catalog(out_dir, cfg)

    if write_reference:
        ref_dir = os.path.join(out_dir, "reference_ingest")
        rng = np.random.default_rng([cfg.seed, 424_243])
        corrupt_left = defects.ref_corrupt_rows
        for i, t in tables.items():
            ref_t = t
            while corrupt_left > 0:
                r = int(rng.integers(0, t.num_rows))
                toks = ref_t["tokens"][r].as_py()
                if len(toks) > 1 and corrupt_left % 2 == 0:
                    toks = toks[:-1]          # truncated list
                else:
                    toks[0] = (0 if toks[0] != 0 else 1)  # flipped token
                ref_t = _set_row(ref_t, r, tokens=toks, n_tok=len(toks))
                planted.ref_corrupt_doc_ids.append(ref_t["doc_id"][r].as_py())
                corrupt_left -= 1
                if rng.random() < 0.5:
                    break  # spread corruptions across partitions
            pdir = os.path.join(ref_dir, f"partition_id={partition_name(i)}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(ref_t, os.path.join(pdir, "part-0.parquet"))

    return planted
