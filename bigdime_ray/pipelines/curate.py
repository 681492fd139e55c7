"""Composed curation pass — the shape a training-data pipeline actually
runs: one streaming pipeline of (length gate → exact-dedup
representative filter → optional quality gate), each stage a vectorized
``map_batches`` / narrow-shuffle op from this package. Demonstrates that
the engine's operators COMPOSE as lazy Dataset stages (nothing
materializes between them except dedup's small keep-set broadcast).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from bigdime_ray.pipelines.dedup import exact_dedup


def curate_documents(ds: Dataset, col: str = "text",
                     id_col: str = "doc_id", min_chars: int = 1,
                     max_chars: int = 10**9,
                     min_quality: float | None = None,
                     normalize_dedup: bool = False) -> Dataset:
    """Keep documents that pass the length gate and are the exact-dedup
    representative (min id per distinct content); optionally gate on the
    heuristic quality score (``min_quality`` — non-SQL, leave None for
    oracle-checkable output)."""

    def length_gate(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch[col])
        keep = pc.and_(pc.greater_equal(n, pa.scalar(min_chars)),
                       pc.less_equal(n, pa.scalar(max_chars)))
        return batch.filter(pc.fill_null(keep, False))

    gated = ds.map_batches(length_gate, batch_format="pyarrow",
                           zero_copy_batch=True)
    kept = exact_dedup(gated, col, id_col, normalize=normalize_dedup)
    if min_quality is not None:
        from bigdime_ray.pipelines.text import analyze_text
        kept = (analyze_text(kept)
                .filter(expr=f"quality >= {min_quality}"))
    return kept


SAMPLE_MUL = 2654435761
SAMPLE_MOD = 1_000_000_007


def stratified_sample(ds: Dataset, strata_col: str, rates: dict,
                      id_col: str = "doc_id",
                      default_rate: float = 0.0) -> Dataset:
    """Deterministic per-stratum sampling: keep a row iff
    ``(id·MUL mod P) mod 1000 < rate·1000`` for its stratum's rate.

    Hash-derived, not RNG-derived → reproducible across runs and safe
    under Ray task retries (the same rows are kept no matter how blocks
    are re-executed), and SQL-expressible for oracle checking. Rates are
    per-mille-resolution fractions in [0, 1]."""
    import numpy as np

    keys = list(rates)
    thresh = np.asarray([int(round(rates[k] * 1000)) for k in keys],
                        dtype=np.int64)
    default_t = int(round(default_rate * 1000))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bucket = ((ids * SAMPLE_MUL) % SAMPLE_MOD) % 1000
        strata = batch[strata_col].to_numpy(zero_copy_only=False)
        t = np.full(len(ids), default_t, dtype=np.int64)
        for k, th in zip(keys, thresh):
            t[strata == k] = th
        return batch.filter(pa.array(bucket < t))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def strata_counts(ds: Dataset, strata_col: str) -> dict[str, int]:
    """Exact per-stratum row counts: each block emits its (stratum,
    count) partials, the driver merges. Broadcast-bound in the number
    of DISTINCT strata (languages/domains/sources — ~10²-10⁴ for any
    real corpus), never in rows; the documented assumption of the
    mixing operators below."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch[strata_col].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"k": pa.array(vals.astype(str)),
                         "c": pa.array(counts.astype(np.int64))})

    out: dict[str, int] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        out[row["k"]] = out.get(row["k"], 0) + int(row["c"])
    return out


def temperature_mix_rates(counts: dict[str, int], budget_docs: int,
                          temperature: float = 2.0) -> dict[str, int]:
    """Per-stratum keep-thresholds (per-mille ints) for
    temperature-based source mixing (the UniMax / multilingual-LM
    recipe): sampling mass ∝ count^(1/τ), so τ=1 reproduces the natural
    distribution and larger τ flattens it toward uniform, upweighting
    low-resource strata.

    INTEGER-EXACT for τ ∈ {1, 2}: the tempered weight is
    ``floor(count^(1/τ) · 2^20)`` — for τ=2 that is ``sqrt`` (IEEE
    correctly-rounded, bit-identical in numpy/Python/DuckDB, unlike
    ``pow``) scaled by a power of two (exponent shift, exact) — and
    everything after is arbitrary-precision integer arithmetic:

        t_s = min(1000, (1000 · budget · w_s) // (W · c_s)),  W = Σ w_s

    so the oracle replays it verbatim (HUGEINT in SQL, Python ints
    here). Other τ use ``pow`` and are documented as float-rounded.
    Expected kept rows per stratum ≈ budget · w_s / W, capped at the
    stratum's full population (t_s = 1000)."""
    import math

    ws: dict[str, int] = {}
    for k, c in counts.items():
        if c <= 0:
            ws[k] = 0
        elif temperature == 1.0:
            ws[k] = c << 20
        elif temperature == 2.0:
            ws[k] = math.floor(math.sqrt(c) * (1 << 20))
        else:
            ws[k] = math.floor(c ** (1.0 / temperature) * (1 << 20))
    total = sum(ws.values())
    if total == 0:
        return {k: 0 for k in counts}
    return {k: (min(1000, (1000 * budget_docs * ws[k]) //
                    (total * counts[k])) if counts[k] > 0 else 0)
            for k in counts}


def temperature_mix(ds: Dataset, strata_col: str = "source",
                    id_col: str = "doc_id", budget_docs: int = 0,
                    temperature: float = 2.0) -> Dataset:
    """Temperature-mix a multi-source corpus down to ~``budget_docs``
    rows: count strata (one streaming pass, broadcast-bound merge),
    derive per-mille thresholds via :func:`temperature_mix_rates`, then
    the same hash-derived per-stratum filter as
    :func:`stratified_sample` — deterministic, retry-safe, zero
    shuffle. The input is traversed twice (count pass + filter pass);
    at 100 TB that is the right trade against materializing it."""
    rates = temperature_mix_rates(strata_counts(ds, strata_col),
                                  budget_docs, temperature)
    return stratified_sample(ds, strata_col,
                             {k: t / 1000.0 for k, t in rates.items()},
                             id_col=id_col)


def train_val_split(ds: Dataset, id_col: str = "doc_id",
                    val_per_mille: int = 100,
                    split_col: str = "split") -> Dataset:
    """Deterministic train/validation assignment: a row's split is a
    PURE FUNCTION of its id (the same multiplicative hash as
    ``stratified_sample``), so membership is stable across runs, Ray
    task retries and repartitionings — the property an RNG split lacks
    and a 100 TB pipeline cannot do without (a retried block must not
    re-roll its rows into the other split). ``val_per_mille`` rows per
    1000 land in ``'val'``; the rest in ``'train'``. SQL mirror:
    ``CASE WHEN ((id * MUL) % P) % 1000 < v THEN 'val' ELSE 'train'
    END``. Appends ``split_col``; zero shuffle."""
    import numpy as np

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bucket = ((ids * SAMPLE_MUL) % SAMPLE_MOD) % 1000
        is_val = bucket < val_per_mille
        col = pa.DictionaryArray.from_arrays(
            pa.array(is_val.astype(np.int8)),
            pa.array(["train", "val"])).cast(pa.string())
        return batch.append_column(split_col, col)

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def shuffled_export(ds, seed: int, out_dir: str | None = None,
                    min_rows_per_file: int | None = None):
    """Seeded GLOBAL SHUFFLE for training export — the epoch-ordering
    primitive every training run needs (hash-derived sampling covers
    subsetting; this covers ordering). ``ds.random_shuffle(seed=)`` is
    Ray's all-to-all shuffle: deterministic for a fixed seed and plan,
    so a retried/resumed export reproduces the same epoch order.
    With ``out_dir`` the shuffled stream writes partitioned parquet
    (optionally coalesced via ``min_rows_per_file``) and the Dataset
    is returned un-consumed otherwise. At 100 TB prefer ONE
    random_shuffle per epoch materialized to storage over shuffling
    per consumer — the write amortizes the exchange across trainers."""
    out = ds.random_shuffle(seed=seed)
    if out_dir is not None:
        kw = {}
        if min_rows_per_file:
            kw["min_rows_per_file"] = int(min_rows_per_file)
        out.write_parquet(out_dir, **kw)
        return None
    return out


def token_ngram_decontaminate(train_ds: Dataset, eval_ds: Dataset,
                              tokens_col: str = "tokens",
                              id_col: str = "doc_id",
                              n: int = 8) -> Dataset:
    """Token-LEVEL benchmark decontamination — the sibling of
    ``pipelines/text.py::ngram_decontaminate`` operating directly on
    pre-tokenized sequences (the engine's north-star input shape:
    ``tokens: list<int32>``): per TRAIN sequence, how many of its
    ``n``-token windows appear anywhere in the EVAL set.

    Window hashing is fully vectorized over the flattened token buffer:
    ``h[i] = Σ_j mix64(tok[i+j] ⊕ mix64(j+1))`` — per-position keys
    make it order-sensitive; windows never cross a row boundary
    (valid starts are where ``doc_idx[i] == doc_idx[i+n-1]``). The
    eval side contributes DISTINCT window hashes per block, unioned
    and broadcast once via ``ray.put``; the train pass is a
    zero-shuffle searchsorted membership probe with equality check
    (residual error = true 64-bit collision, over-flag only).

    Returns ``(id_col, n_windows, n_hits)``; rows with fewer than
    ``n`` tokens carry no windows and are absent (same contract as the
    text-level operator).
    """
    import numpy as np
    import ray

    from bigdime_ray.functions.hashing import mix64

    pos_keys = mix64(np.arange(1, n + 1, dtype=np.uint64))

    def window_hashes(batch: pa.Table
                      ) -> tuple[np.ndarray, np.ndarray]:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if len(flat) < n:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        starts = np.nonzero(doc_idx[: len(doc_idx) - n + 1]
                            == doc_idx[n - 1:])[0]
        if len(starts) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        with np.errstate(over="ignore"):
            h = np.zeros(len(starts), dtype=np.uint64)
            for j in range(n):
                h += mix64(flat[starts + j] ^ pos_keys[j])
        return h, doc_idx[starts]

    def eval_partial(batch: pa.Table) -> pa.Table:
        h, _ = window_hashes(batch)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64),
                                       type=pa.int64())})

    blocks = (eval_ds.map_batches(eval_partial, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all())
    ev = (np.unique(np.asarray([r["h"] for r in blocks],
                               dtype=np.int64).view(np.uint64))
          if blocks else np.empty(0, dtype=np.uint64))
    ev_ref = ray.put(ev)

    sch = train_ds.schema()
    id_type = sch.types[sch.names.index(id_col)]
    empty = pa.table({id_col: pa.array([], type=id_type),
                      "n_windows": pa.array([], type=pa.int64()),
                      "n_hits": pa.array([], type=pa.int64())})

    def probe(batch: pa.Table) -> pa.Table:
        import numpy as np
        evh = ray.get(ev_ref)
        h, d = window_hashes(batch)
        if len(d) == 0:
            return empty
        if len(evh):
            i = np.minimum(np.searchsorted(evh, h), len(evh) - 1)
            hit = (evh[i] == h).astype(np.int64)
        else:
            hit = np.zeros(len(h), dtype=np.int64)
        uniq, inv = np.unique(d, return_inverse=True)
        hits = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(hits, inv, hit)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(uniq)),
            "n_windows": pa.array(np.bincount(
                inv, minlength=len(uniq)).astype(np.int64)),
            "n_hits": pa.array(hits)})

    return train_ds.map_batches(probe, batch_format="pyarrow",
                                zero_copy_batch=True)
