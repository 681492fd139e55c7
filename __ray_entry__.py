"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in ``bigdime_ray``) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``      — flagship pipeline: full validation suite of
  ``bigdime_ray`` over a deterministic synthetic tokenized table with
  planted defects; returns the per-partition verdict table.
- ``queries()``    — one entry per implemented operator/pipeline from
  SURVEY.md §2B + the training-data ops; each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible ones
  (column names match the Ray results exactly; the driver's compare is
  order-insensitive but name- and value-sensitive).
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# --------------------------------------------------------------- helpers

_CHK_MUL = 2654435761
_CHK_MOD = 1_000_000_007


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns)


def _scaled_i64(values, scale: int) -> pa.Array:
    """Fixed-point encode a float column as int64: floor(x*scale + 0.5).

    The driver's correctness compare value-hashes results EXACTLY;
    rounded float64 outputs differ between engines in the last ulp
    (banker's vs half-away rounding, summation order), so every compared
    float becomes a scaled integer — identical formula in the SQL oracle
    (CAST(FLOOR(x * scale + 0.5) AS BIGINT))."""
    v = np.asarray(values, dtype=np.float64)
    return pa.array(np.floor(v * scale + 0.5).astype(np.int64))


def _collect(ds, schema: pa.Schema) -> pa.Table:
    """Collect a (small) Dataset into an Arrow table, preserving the
    schema even when every block is empty (Dataset.to_pandas drops the
    schema of an all-empty result)."""
    return pa.Table.from_pylist(ds.take_all(), schema=schema)


def _entry_fixture_dir() -> str:
    """Deterministic synthetic validation fixture (built once, reused)."""
    from bigdime_ray.synth import DefectSpec, SynthConfig, generate_dataset
    from bigdime_ray.pipelines.profile import build_profile

    base = "/tmp/bigdime_ray_entry_fixture"
    marker = os.path.join(base, ".complete")
    if not os.path.exists(marker):
        cfg = SynthConfig(num_rows=4000, num_partitions=8, seed=42)
        generate_dataset(os.path.join(base, "clean"), cfg)
        build_profile(os.path.join(base, "clean", "data"),
                      save_path=os.path.join(base, "reference_profile.json"))
        generate_dataset(
            os.path.join(base, "dirty"), cfg,
            DefectSpec(dup_intra=2, dup_cross=2, bad_source=3,
                       ntok_mismatch=2, token_oob=2, token_null=1,
                       drift_partition=3, manifest_count_off=1,
                       manifest_checksum_off=2, schema_variant=5,
                       missing_file=6, ref_corrupt_rows=3),
            write_reference=True)
        with open(marker, "w") as f:
            f.write("ok")
    return base


def entry() -> Any:
    """Flagship: full constraint suite over the synthetic dirty table."""
    import shutil
    from bigdime_ray.pipelines.validate import (ValidationRunConfig,
                                                run_validation)
    from bigdime_ray.validators import FULL_SUITE

    base = _entry_fixture_dir()
    run_dir = os.path.join(base, "run_entry")
    shutil.rmtree(run_dir, ignore_errors=True)
    report = run_validation(ValidationRunConfig(
        input_dir=os.path.join(base, "dirty"), run_dir=run_dir,
        profile_path=os.path.join(base, "reference_profile.json"),
        suite=list(FULL_SUITE)))
    return report.verdicts


# --------------------------------------------------------------- queries

def _q_record_count_per_source(sf_dir: str):
    """B-V1 proxy: per-key record counts via block pre-aggregation."""
    from bigdime_ray.stages.shuffle import block_preagg_counts
    ds = _read(sf_dir, "documents", columns=["source"])
    return block_preagg_counts(ds, ["source"], ntok_col=None)


def _q_checksum_per_source(sf_dir: str):
    """B-V2 proxy: order-insensitive per-partition arithmetic checksum.

    The engine's real checksum is a 64-bit content hash (not
    SQL-expressible); this proxy uses the same fold structure with an
    arithmetic row hash DuckDB can reproduce."""
    ds = _read(sf_dir, "documents", columns=["source", "doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rh = (ids * _CHK_MUL) % _CHK_MOD
        t = pa.table({"source": batch["source"], "rh": pa.array(rh)})
        g = t.group_by(["source"]).aggregate([("rh", "sum")])
        return g.rename_columns(["source", "checksum"])

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("source").aggregate(Sum("checksum",
                                             alias_name="checksum")))


def _q_ntok_consistency(sf_dir: str):
    """B-V4 proxy on documents: n_chars == length(text)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def viol(batch: pa.Table) -> pa.Table:
        actual = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        bad = pc.fill_null(pc.invert(pc.equal(batch["n_chars"], actual)), True)
        hit = batch.filter(bad)
        return pa.table({
            "doc_id": hit["doc_id"],
            "declared": hit["n_chars"],
            "actual": pc.cast(pc.utf8_length(hit["text"]), pa.int64())})

    out = ds.map_batches(viol, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(out, pa.schema([("doc_id", pa.int64()),
                                    ("declared", pa.int64()),
                                    ("actual", pa.int64())]))


def _q_list_range_check(sf_dir: str):
    """B-V5 proxy on embeddings: fixed dim + values within [-16, 16]."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def viol(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        lengths = (pc.fill_null(pc.list_value_length(emb), 0)
                   .to_numpy(zero_copy_only=False).astype(np.int64))
        flat = pc.list_flatten(emb)
        vals = pc.fill_null(flat, np.float32(1e30)).to_numpy(zero_copy_only=False)
        bad_elem = (vals < -16.0) | (vals > 16.0)
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        bad_rows = np.unique(np.searchsorted(
            offsets, np.nonzero(bad_elem)[0], side="right") - 1)
        wrong_dim = np.nonzero(lengths != 64)[0]
        rows = np.unique(np.concatenate([bad_rows, wrong_dim])).astype(np.int64)
        hit = batch.take(pa.array(rows))
        return pa.table({"vec_id": hit["vec_id"]})

    out = ds.map_batches(viol, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(out, pa.schema([("vec_id", pa.int64())]))


def _q_duplicate_keys(sf_dir: str):
    """B-V6 proxy: duplicated keys via the packed-cell count exchange
    (one (sorted keys, counts) cell per block; numpy merge) — ~7×
    faster than the row-level hash-shuffle groupby at this scale; the
    bucketed variant is the 10¹²-row path."""
    from bigdime_ray.stages.shuffle import duplicate_key_counts
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    return duplicate_key_counts(ds, "l_orderkey", min_count=2)


def _q_referential_violations(sf_dir: str):
    """B-V7 proxy: broadcast anti-join — lineitem orderkeys not in orders."""
    # projected single-column Arrow pull of the SMALL (broadcast) side —
    # no per-row Python materialization; only safe while orders is small
    import ray as _ray
    key_tbl = pa.concat_tables(
        _ray.get(_read(sf_dir, "orders",
                       columns=["o_orderkey"]).to_arrow_refs()))
    key_set = key_tbl["o_orderkey"].combine_chunks()
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def anti(batch: pa.Table) -> pa.Table:
        bad = pc.invert(pc.is_in(batch["l_orderkey"], value_set=key_set))
        return batch.filter(bad)

    from ray.data.aggregate import Count
    out = (ds.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("l_orderkey")
           .aggregate(Count(alias_name="cnt"))  # distinct violating keys
           .drop_columns(["cnt"]))
    return _collect(out, pa.schema([("l_orderkey", pa.int64())]))


def _q_column_stats(sf_dir: str):
    """B-S1 proxy: single-pass min/max/count/null/mean over lineitem cols."""
    from ray.data.aggregate import Count, Max, Mean, Min
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = _read(sf_dir, "lineitem", columns=cols)
    from ray.data.aggregate import Sum

    def scaled(batch: pa.Table) -> pa.Table:
        # per-row fixed-point (×10^7) so the mean's SUM is an integer sum
        # — order-independent, no last-ulp flapping across runs
        out = {}
        for c in cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            out[c] = batch[c]
            out[f"{c}_s7"] = pa.array(
                np.floor(v * 10_000_000 + 0.5).astype(np.int64))
        return pa.table(out)

    aggs = []
    for c in cols:
        aggs += [Min(c, alias_name=f"min_{c}"), Max(c, alias_name=f"max_{c}"),
                 Sum(f"{c}_s7", alias_name=f"sum7_{c}")]
    aggs.append(Count(alias_name="cnt"))
    res = ds.map_batches(scaled, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(*aggs)
    rows = []
    for c in cols:
        rows.append({"col_name": c,
                     "min_v": int(np.floor(res[f"min_{c}"] * 10_000 + 0.5)),
                     "max_v": int(np.floor(res[f"max_{c}"] * 10_000 + 0.5)),
                     "mean_v": int(np.floor(
                         res[f"sum7_{c}"] / 1000.0 / res["cnt"] + 0.5)),
                     "cnt": res["cnt"]})
    return pa.Table.from_pylist(rows)


def _q_per_source_stats_salted(sf_dir: str):
    """B-V8: per-source stats through the explicit salt-based skew split;
    salting must be invisible vs the plain GROUP BY oracle."""
    from bigdime_ray.stages.shuffle import salted_aggregate
    ds = _read(sf_dir, "documents", columns=["source", "n_chars", "doc_id"])
    ds = ds.map_batches(
        lambda b: b.append_column("doc_key", pc.cast(b["doc_id"], pa.string())),
        batch_format="pyarrow")
    out = salted_aggregate(ds, "source", "n_chars",
                           hot_keys={"src1": 4, "src3": 4},
                           salt_source="doc_key")
    return out


def _q_exact_dedup(sf_dir: str):
    """Exact dedup groups on documents (hash-partition + per-group first)."""
    from bigdime_ray.pipelines.dedup import exact_dedup_groups
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_groups(ds)


def _q_exact_dedup_normalized(sf_dir: str):
    """Normalized-content dedup groups (lowercase + collapsed
    whitespace before hashing — the curation-pipeline variant)."""
    from bigdime_ray.pipelines.dedup import exact_dedup_groups
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_groups(ds, normalize=True)


def _q_minhash_dedup(sf_dir: str):
    """MinHash-LSH near-dup pairs on documents (rows-only check)."""
    from bigdime_ray.pipelines.dedup import minhash_lsh_dedup
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    res = minhash_lsh_dedup(ds, threshold=0.6)
    return pa.Table.from_pandas(
        res.pairs.astype({"id_a": "int64", "id_b": "int64",
                          "similarity": "float64"})
        if len(res.pairs) else
        pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                      "id_b": pd.Series(dtype="int64"),
                      "similarity": pd.Series(dtype="float64")}),
        preserve_index=False)


def _q_ngram_jaccard_dedup(sf_dir: str):
    """Near-dup pairs by EXACT word-3-gram Jaccard (LSH candidates +
    full shingle-set verification; rows-only check — exact-Jaccard
    equality vs brute force is pinned in tests/test_dedup.py)."""
    from bigdime_ray.pipelines.dedup import ngram_jaccard_dedup
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    res = ngram_jaccard_dedup(ds, threshold=0.5)
    return pa.Table.from_pandas(
        res.pairs.astype({"id_a": "int64", "id_b": "int64",
                          "similarity": "float64"})
        if len(res.pairs) else
        pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                      "id_b": pd.Series(dtype="int64"),
                      "similarity": pd.Series(dtype="float64")}),
        preserve_index=False)


def _q_simhash_dedup(sf_dir: str):
    from bigdime_ray.pipelines.dedup import simhash_dedup
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    res = simhash_dedup(ds, max_hamming=3)
    df = res.pairs.astype({"id_a": "int64", "id_b": "int64",
                           "similarity": "float64"}) if len(res.pairs) else \
        pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                      "id_b": pd.Series(dtype="int64"),
                      "similarity": pd.Series(dtype="float64")})
    return pa.Table.from_pandas(df, preserve_index=False)


def _q_embedding_near_dup(sf_dir: str):
    from bigdime_ray.pipelines.dedup import embedding_near_dup
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    res = embedding_near_dup(ds, threshold=0.95, planes=10)
    df = res.pairs.astype({"id_a": "int64", "id_b": "int64",
                           "similarity": "float64"}) if len(res.pairs) else \
        pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                      "id_b": pd.Series(dtype="int64"),
                      "similarity": pd.Series(dtype="float64")})
    return pa.Table.from_pandas(df, preserve_index=False)


def _query_vec(ds) -> np.ndarray:
    """Fetch the vec_id=0 embedding with a pushed-down filter (no
    driver-side iter_rows scan)."""
    row = ds.filter(expr="vec_id == 0").take(1)[0]
    return np.asarray(row["embedding"], dtype=np.float64)


def _q_knn_top10(sf_dir: str):
    """Brute-force cosine top-10 vs the vec_id=0 embedding (broadcast)."""
    from bigdime_ray.pipelines.similarity import brute_force_topk
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vec(ds)
    top = brute_force_topk(ds, q[None, :], k=10)
    return pa.table({"vec_id": pa.array(top.vec_id.to_numpy(), type=pa.int64()),
                     "rnk": pa.array(top["rank"].to_numpy(), type=pa.int64())})


def _q_knn_hnsw(sf_dir: str):
    """Graph ANN (HNSW-class, shard-parallel) top-10 vs the vec_id=0
    embedding — the no-training-pass high-recall option (rows-only:
    approximate by design; recall vs brute force asserted in
    tests/test_similarity.py)."""
    from bigdime_ray.pipelines.similarity import hnsw_topk
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vec(ds)
    top = hnsw_topk(ds, q[None, :], k=10)
    return pa.table({"vec_id": pa.array(top.vec_id.to_numpy(),
                                        type=pa.int64()),
                     "rnk": pa.array(top["rank"].to_numpy(),
                                     type=pa.int64())})


def _q_knn_ivf(sf_dir: str):
    """IVF-bucketed approximate top-10 (scale path; rows-only — approx by
    design, recall asserted in tests/test_similarity.py)."""
    import hashlib

    from bigdime_ray.pipelines.similarity import build_ivf_index, ivf_search
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vec(ds)
    # persisted index (SURVEY 7.1 #3): built once per input, reused —
    # search loads centroids (no refit) and reads only probed clusters.
    # Cache key fingerprints the source FILES (path, size, mtime), so
    # regenerated data at the same path rebuilds instead of serving a
    # stale index.
    import glob as _glob
    files = sorted(_glob.glob(os.path.join(sf_dir, "embeddings.parquet")))
    fp = ";".join(f"{f}:{os.path.getsize(f)}:{int(os.path.getmtime(f))}"
                  for f in files)
    tag = hashlib.sha1(fp.encode()).hexdigest()[:12]
    index_dir = f"/tmp/bigdime_ivf_{tag}"
    if not os.path.exists(os.path.join(index_dir, "centroids.npz")):
        build_ivf_index(ds, index_dir, nlist=8, seed=11)
    top = ivf_search(index_dir, q[None, :], k=10, nprobe=4)
    return pa.table({"vec_id": pa.array(top.vec_id.to_numpy(),
                                        type=pa.int64()),
                     "rnk": pa.array(top["rank"].to_numpy(),
                                     type=pa.int64())})


def _q_token_count(sf_dir: str):
    """Whitespace token counting per document (vectorized regex count)."""
    from bigdime_ray.pipelines.text import count_tokens
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pc.cast(count_tokens(batch["text"]), pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_token_count_bpe(sf_dir: str):
    """Word/punct (BPE-ish) token counting — vectorized regex count,
    RE2 pattern identical on both sides."""
    from bigdime_ray.pipelines.text import WORD_TOKEN_RE, count_tokens
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_word_tokens": pc.cast(
                count_tokens(batch["text"], WORD_TOKEN_RE), pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_curated_documents(sf_dir: str):
    """Composed curation pass: length gate → exact-dedup representative
    (oracle-checkable composition; the quality gate is the non-SQL
    opt-in)."""
    from bigdime_ray.pipelines.curate import curate_documents
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    kept = curate_documents(ds, min_chars=50, max_chars=100_000)
    return kept.map_batches(
        lambda b: b.select(["doc_id", "n_chars"]), batch_format="pyarrow")


def _q_document_fingerprints(sf_dir: str):
    """Rolling-hash (winnowing) document fingerprints — rows-only
    (position-robust substring fingerprints; properties pinned in
    tests/test_text.py)."""
    from bigdime_ray.pipelines.text import add_rolling_fingerprints
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_rolling_fingerprints(ds)
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_fingerprints"]),
        batch_format="pyarrow")


def _q_document_frequency(sf_dir: str):
    """Per-word document frequency (vocab/stopword statistic): exact,
    block-partials summed over one small (word, cnt) shuffle."""
    from bigdime_ray.pipelines.text import document_frequency
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return document_frequency(ds, min_df=5)


def _q_pack_sequences(sf_dir: str):
    """Sequence packing (first-fit-decreasing per block; rows-only —
    the assignment is algorithmic, invariants pinned in tests)."""
    from bigdime_ray.pipelines.pack import pack_sequences
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return pack_sequences(ds, max_len=2000, len_col="n_chars")


def _q_text_analysis(sf_dir: str):
    """Language-ID + quality scoring (heuristic — rows-only check)."""
    from bigdime_ray.pipelines.text import analyze_text
    ds = _read(sf_dir, "documents")
    out = analyze_text(ds, concurrency=2)
    return out.select_columns(["doc_id", "lang_pred", "quality"])


def _q_events_hourly(sf_dir: str):
    """Stream-shaped proxy: tumbling 1h window per user — composite
    (user_id, hour) packed into ONE int64 key through the packed-cell
    sum exchange (block pre-agg + numpy merge; no row-level hash
    shuffle). Per-row fixed-point BEFORE the sum keeps integer sums
    order-independent (float sums flap in the last ulp)."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    US_PER_H = 3_600_000_000
    SHIFT = np.int64(1) << np.int64(24)  # hour index < 2^24 (~1900 yrs)

    def extract(batch: pa.Table):
        t = (batch["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").view(np.int64))
        if len(t) and t.min() < 0:
            # pre-epoch hours would make the packed key ambiguous
            raise ValueError("events_hourly packing assumes ts >= 1970")
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keys = uid * SHIFT + t // US_PER_H
        val_s = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                         * 10_000 + 0.5).astype(np.int64)
        return keys, [np.ones(len(keys), dtype=np.int64), val_s]

    keys, (cnt, total) = grouped_int_sums_exchange(ds, extract, 2)
    hour = ((keys % SHIFT) * US_PER_H).astype("datetime64[us]")
    return pa.table({
        "user_id": pa.array(keys // SHIFT),
        "hour": pa.array(hour, type=pa.timestamp("us")),
        "cnt": pa.array(cnt), "total": pa.array(total)})


def _q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped aggregate (general wide-agg capability)."""
    from ray.data.aggregate import Count, Mean, Sum
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def scaled_partial(batch: pa.Table) -> pa.Table:
        # per-row fixed-point BEFORE every sum (order-independent int
        # sums), then BLOCK pre-aggregation: only ≤6 partial rows per
        # block reach the shuffle (6 groups total)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_s": _scaled_i64(
                batch["l_quantity"].to_numpy(zero_copy_only=False), 1_000),
            "rev_s": _scaled_i64(ep * (1.0 - disc), 1_000),
            "disc_s6": _scaled_i64(disc, 1_000_000)})
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_s", "sum"), ("rev_s", "sum"), ("disc_s6", "sum"),
             ([], "count_all")])
        return g.rename_columns(["l_returnflag", "l_linestatus", "qty_s",
                                 "rev_s", "disc_s6", "cnt"])

    out = (ds.map_batches(scaled_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty_s", alias_name="sum_qty"),
                      Sum("rev_s", alias_name="sum_rev"),
                      Sum("disc_s6", alias_name="sum_disc6"),
                      Sum("cnt", alias_name="cnt")))

    def finish(batch: pa.Table) -> pa.Table:
        sum6 = batch["sum_disc6"].to_numpy(zero_copy_only=False)
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)
        avg = np.floor(sum6 / 1000.0 / cnt + 0.5).astype(np.int64)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": batch["sum_qty"], "sum_rev": batch["sum_rev"],
            "avg_disc": pa.array(avg), "cnt": batch["cnt"]})

    return out.map_batches(finish, batch_format="pyarrow")


def _q_top_orders(sf_dir: str):
    """Join-shaped: top-10 orders by lineitem revenue (agg → sort → limit)."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    def extract(batch: pa.Table):
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rev_s = np.floor(ep * (1.0 - disc) * 1_000 + 0.5).astype(np.int64)
        return keys, [rev_s]

    # packed-cell sum exchange with per-bucket top-k prune: each merge
    # (bucketed or driver) keeps only its top-10, so the driver never
    # holds every distinct order key (VERDICT r2 #8); complete key
    # groups per bucket make the union of per-bucket top-10 a superset
    # of the global top-10
    keys, (rev,) = grouped_int_sums_exchange(ds, extract, 1, topk=(0, 10))
    order = np.lexsort((keys, -rev))[:10]
    return pa.table({
        "l_orderkey": pa.array(keys[order], type=pa.int64()),
        "revenue": pa.array(rev[order], type=pa.int64())})


def _q_revenue_by_orderpriority(sf_dir: str):
    """Large-large hash join (Dataset.join, partitioned on the key) —
    lineitem ⋈ orders, revenue per order priority. The small-side
    broadcast alternative is `referential_violations`; this demonstrates
    the true co-partitioned join for when neither side fits broadcast."""
    from ray.data.aggregate import Count, Sum
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        # per-row fixed-point before the join+sum → integer sum is
        # order-independent (the float sum flapped the ×1000 boundary)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "rev_s": _scaled_i64(ep * (1.0 - disc), 1_000)})

    li = li.map_batches(revenue, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    return (joined.groupby("o_orderpriority")
            .aggregate(Sum("rev_s", alias_name="revenue"),
                       Count(alias_name="cnt")))


def _q_revenue_by_status_string_join(sf_dir: str):
    """Large-large hash join on STRING keys: both sides derive a string
    order key ('O' + orderkey), the exchange carries only an int64
    xxhash of it, and string equality is verified post-join
    (pipelines/join.py::string_key_join). Same fixed-point revenue
    discipline as the int-keyed join query."""
    from ray.data.aggregate import Count, Sum
    from bigdime_ray.pipelines.join import string_key_join

    def li_prep(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        skey = pc.binary_join_element_wise(
            pa.scalar("O"), pc.cast(batch["l_orderkey"], pa.string()),
            pa.scalar(""))
        return pa.table({"l_skey": skey,
                         "rev_s": _scaled_i64(ep * (1.0 - disc), 1_000)})

    def o_prep(batch: pa.Table) -> pa.Table:
        okey = pc.binary_join_element_wise(
            pa.scalar("O"), pc.cast(batch["o_orderkey"], pa.string()),
            pa.scalar(""))
        return pa.table({"o_skey": okey,
                         "o_orderstatus": batch["o_orderstatus"]})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus"]) \
        .map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True)
    joined = string_key_join(li, orders, "l_skey", "o_skey",
                             num_partitions=16)
    return (joined.groupby("o_orderstatus")
            .aggregate(Sum("rev_s", alias_name="revenue"),
                       Count(alias_name="cnt")))


def _q_customer_order_coverage(sf_dir: str):
    """LEFT OUTER string-key join (pipelines/join.py::
    string_key_left_join: verified inner ⊎ broadcast anti with null
    right columns) aggregated to per-segment row / match counts — the
    null-preserving semantics are what the aggregate checks
    (COUNT(*) vs COUNT(o_orderkey))."""
    from ray.data.aggregate import Count, Sum
    from bigdime_ray.pipelines.join import string_key_left_join

    def c_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_skey": pc.binary_join_element_wise(
                pa.scalar("C"), pc.cast(batch["c_custkey"], pa.string()),
                pa.scalar("")),
            "c_mktsegment": batch["c_mktsegment"]})

    def o_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_skey": pc.binary_join_element_wise(
                pa.scalar("C"), pc.cast(batch["o_custkey"], pa.string()),
                pa.scalar("")),
            "o_orderkey": batch["o_orderkey"]})

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(c_prep, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey"]) \
        .map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True)
    joined = string_key_left_join(cust, orders, "c_skey", "o_skey",
                                  num_partitions=16)

    def part(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "m": pc.cast(pc.is_valid(batch["o_orderkey"]), pa.int64())})

    return (joined.map_batches(part, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("c_mktsegment")
            .aggregate(Count(alias_name="n_rows"),
                       Sum("m", alias_name="n_matched")))


def _q_validation_suite(sf_dir: str):
    """Flagship engine run (rows-only): verdict table of the full suite."""
    return entry()


def _q_tdigest_quantiles(sf_dir: str):
    """Mergeable t-digest quantiles on l_quantity (approx — rows-only;
    accuracy asserted in tests/test_sketches.py with ε bounds)."""
    from bigdime_ray.state.sketches import TDigestState, merge_states
    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        st = TDigestState.from_values(
            batch["l_quantity"].to_numpy(zero_copy_only=False))
        return pa.table({"payload": pa.array([st.to_bytes()],
                                             type=pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    from bigdime_ray.state.sketches import PartialState
    dig = merge_states([PartialState.from_bytes(r["payload"]) for r in rows])
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    vals = dig.quantile(qs)
    return pa.table({"q": pa.array(qs), "value": pa.array(np.round(vals, 3))})


def _q_grouped_topk(sf_dir: str):
    """B-T1-shaped grouped top-k: first 2 lines per order (deterministic)."""
    from bigdime_ray.stages.topk import grouped_topk
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    return grouped_topk(ds, ["l_orderkey"], ["l_linenumber"], k=2)


def _q_running_sum(sf_dir: str):
    """Window-function shape: per-user ordered cumulative sum."""
    from bigdime_ray.pipelines.stream import running_aggregate
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "value"])
    out = running_aggregate(ds, "user_id", "ts", "value",
                            order_tiebreak="event_id")

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "running_total": _scaled_i64(
                batch["running_total"].to_numpy(zero_copy_only=False),
                10_000)})

    return out.map_batches(proj, batch_format="pyarrow")


def _q_embedding_centroids(sf_dir: str):
    """Per-label vector centroid statistic (fixed-point per-dimension
    integer sums + counts; centroid = s_i / (scale * n))."""
    from bigdime_ray.pipelines.similarity import group_centroids
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def widen(b: pa.Table) -> pa.Table:  # label int32 → int64 for SQL
        return pa.table({"label": pc.cast(b["label"], pa.int64()),
                         "embedding": b["embedding"]})

    ds = ds.map_batches(widen, batch_format="pyarrow",
                        zero_copy_batch=True)
    return group_centroids(ds, "label", "embedding", dim=64)


def _q_ntile(sf_dir: str):
    """Quantile binning (curriculum-bucketing shape): NTILE(4) of
    n_chars per language, SQL tile-size rule, doc_id tiebreak."""
    from bigdime_ray.pipelines.stream import ntile
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    out = ntile(ds, "lang", "n_chars", "doc_id", n_tiles=4)
    return out.map_batches(
        lambda b: b.select(["doc_id", "lang", "tile"]),
        batch_format="pyarrow")


def _q_event_pivot(sf_dir: str):
    """Wide-format count features: one row per user, one count column
    per event type (block pre-agg does all counting; the shuffle only
    carries int64 partials)."""
    from bigdime_ray.pipelines.frequency import pivot_counts
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    out = pivot_counts(ds, "user_id", "event_type",
                       values=["click", "view", "purchase", "signup",
                               "error"])
    return out


def _q_latest_event(sf_dir: str):
    """Keep-latest reducer (newest-version dedup shape): the most recent
    event per user, ties broken by event_id — grouped top-1 descending,
    block-pruned so the shuffle sees ≤ blocks × 1 rows per user."""
    from bigdime_ray.stages.topk import grouped_topk
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    out = grouped_topk(ds, ["user_id"], ["ts", "event_id"], k=1,
                       descending=True)
    return out.map_batches(
        lambda b: b.select(["user_id", "ts", "event_id"]),
        batch_format="pyarrow")


def _q_lag_delta(sf_dir: str):
    """LAG shape: per-user inter-event gap in µs (-1 for the first
    event; encoded instead of null so the column stays plain int64)."""
    from bigdime_ray.pipelines.stream import lag_delta
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    out = lag_delta(ds, "user_id", "ts", "event_id")
    return out.map_batches(
        lambda b: b.select(["user_id", "event_id", "delta_us"]),
        batch_format="pyarrow")


def _q_rolling_sum(sf_dir: str):
    """Trailing 1-hour RANGE-window sum of value per user (rate-feature
    shape); per-row fixed-point BEFORE the prefix sums so the windowed
    sums are integer-exact on both engines."""
    from bigdime_ray.pipelines.stream import rolling_window_sum
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "value"])
    out = rolling_window_sum(ds, "user_id", "ts", "value", "event_id",
                             window_us=3_600_000_000, scale=10_000)
    return out.map_batches(
        lambda b: b.select(["user_id", "event_id", "window_total"]),
        batch_format="pyarrow")


def _q_rolling_rows(sf_dir: str):
    """ROWS-frame trailing sum (last 3 rows + current per user, ordered
    by (ts, event_id)) — the row-count-frame sibling of
    events_rolling_sum; per-row fixed-point keeps both engines
    integer-exact."""
    from bigdime_ray.pipelines.stream import rolling_rows_sum
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "value"])
    out = rolling_rows_sum(ds, "user_id", "ts", "value", "event_id",
                           preceding=3, scale=10_000)
    return out.map_batches(
        lambda b: b.select(["user_id", "event_id", "rows_total"]),
        batch_format="pyarrow")


def _q_rolling_rows_max(sf_dir: str):
    """ROWS-frame trailing MAX (last 3 rows + current per user, ordered
    by (ts, event_id)) — the extremum sibling of events_rolling_rows_sum
    (pipelines/stream.py::rolling_rows_extremum): segment-guarded
    shift-fold, per-row fixed-point ×10⁴ so both engines compare
    identical integers."""
    from bigdime_ray.pipelines.stream import rolling_rows_extremum
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "value"])
    out = rolling_rows_extremum(ds, "user_id", "ts", "value", "event_id",
                                preceding=3, op="max", scale=10_000)
    return out.map_batches(
        lambda b: b.select(["user_id", "event_id", "rows_ext"]),
        batch_format="pyarrow")


def _q_distinct_users_by_type(sf_dir: str):
    """Per-group exact COUNT(DISTINCT): distinct users per event type
    via the key-hash-bucketed packed-pair exchange."""
    from bigdime_ray.pipelines.frequency import grouped_distinct_count
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_distinct_count(ds, "event_type", "user_id")


def _q_redact(sf_dir: str):
    """Regex redaction (PII-scrub shape) over documents: replace two
    term patterns, count matches per doc. Arrow and DuckDB both run
    RE2, so the oracle evaluates the identical pattern semantics."""
    from bigdime_ray.pipelines.text import redact_text
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = redact_text(ds, patterns={"keyish": r"\b(key|hash)\b",
                                    "digits": r"\d{3,}"})
    return out.map_batches(
        lambda b: b.select(["doc_id", "text", "n_redactions"]),
        batch_format="pyarrow")


def _q_html_extract(sf_dir: str):
    """HTML → visible-text extraction (functions/html.py::strip_html):
    synthesize a deterministic page per document (title, style+script
    blocks, comment, bold emphasis, footer link with entities), then
    reduce it back to text with the vectorized RE2 kernel chain. The
    oracle builds and reduces the IDENTICAL page in DuckDB (also RE2),
    so the two extractions verify each other token-for-token —
    including the entity-order trap (&amp; decoded last, after
    tag-stripping, so literal &lt;end&gt; survives as text)."""
    from bigdime_ray.functions.html import synthesize_html, extract_html

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "html": synthesize_html(batch["doc_id"], batch["text"]),
        })

    ds = ds.map_batches(synth, batch_format="pyarrow",
                        zero_copy_batch=True)
    out = extract_html(ds, html_col="html", out_col="text")
    return out.map_batches(lambda b: b.select(["doc_id", "text"]),
                           batch_format="pyarrow")


def _q_html_stats(sf_dir: str):
    """Markup statistics for boilerplate scoring (functions/html.py::
    html_stats): tag count, anchor count, extracted-text length and
    link density (anchors per 1000 extracted chars, fixed-point micro
    so both engines compare identical integers) over the same
    synthesized pages as documents_html_extracted."""
    from bigdime_ray.functions.html import synthesize_html, html_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        st = html_stats(synthesize_html(batch["doc_id"], batch["text"]))
        dens = pc.cast(pc.floor(pc.add(
            pc.multiply(st["link_density"], 1_000_000.0), 0.5)),
            pa.int64())
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tags": st["n_tags"],
            "n_links": st["n_links"],
            "text_len": st["text_len"],
            "link_density_micro": dens,
        })

    return ds.map_batches(stats, batch_format="pyarrow",
                          zero_copy_batch=True)


def _q_paragraph_dedup(sf_dir: str):
    """Corpus-level repeated-paragraph removal (pipelines/text.py::
    dedup_paragraphs — the C4/Dolma boilerplate scrub): give every
    document three lines (a per-lang shared header, its own text, a
    per-source footer); the shared/footer lines repeat across documents
    and must survive only in the minimum-doc_id keeper, while each
    document's own text always survives. One packed (hash, count,
    min-doc) exchange + a broadcast rewrite; the oracle recomputes
    keeper semantics relationally over the line strings themselves,
    so a fingerprint collision or keeper bug cannot hide."""
    from bigdime_ray.pipelines.text import dedup_paragraphs

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source"])

    def synth(batch: pa.Table) -> pa.Table:
        shared = pc.binary_join_element_wise(
            pa.scalar("shared-"), batch["lang"], pa.scalar(""))
        footer = pc.binary_join_element_wise(
            pa.scalar("footer-"), batch["source"], pa.scalar(""))
        text3 = pc.binary_join_element_wise(
            shared, batch["text"], footer, pa.scalar("\n"))
        return pa.table({"doc_id": batch["doc_id"], "text": text3})

    ds = ds.map_batches(synth, batch_format="pyarrow",
                        zero_copy_batch=True)
    return dedup_paragraphs(ds, min_count=2, keep="first")


_SUBSTR_K = 32


def _q_compression_signals(sf_dir: str):
    """zlib compression-ratio curation signal (pipelines/text.py::
    compression_signals). Rows-only by design: DuckDB cannot deflate,
    so correctness is pinned by pytest against direct zlib calls
    (exact per-doc byte counts for the in-container zlib build)."""
    from bigdime_ray.pipelines.text import compression_signals

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = compression_signals(ds)
    return out.map_batches(
        lambda b: b.select(["doc_id", "raw_len", "zlib_len",
                            "compress_pm"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_gopher_quality(sf_dir: str):
    """Gopher rule-set quality filter (pipelines/text.py::
    gopher_quality, Rae et al. 2021): decorate every third/fourth/fifth
    document with a bullet line / ellipsis teaser / symbol wall so each
    line- and symbol-rule actually bites, then emit the per-doc
    counters + verdict. Every rule is an integer cross-multiplication,
    so the oracle recomputes ALL counters and the verdict relationally
    — hash-exact."""
    from bigdime_ray.pipelines.text import gopher_quality

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pre = pa.array(np.where(ids % 3 == 0,
                                "- bullet intro line\n", ""))
        suf1 = pa.array(np.where(ids % 4 == 0,
                                 "\nteaser ends here...", ""))
        suf2 = pa.array(np.where(ids % 5 == 0,
                                 "\n### symbol ... wall ...", ""))
        t = pc.binary_join_element_wise(pre, batch["text"], suf1, suf2,
                                        pa.scalar(""))
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    ds = ds.map_batches(synth, batch_format="pyarrow",
                        zero_copy_batch=True)
    return gopher_quality(ds)


def _q_c4_filters(sf_dir: str):
    """C4 cleaning rules (pipelines/text.py::c4_filters, Raffel et al.
    2020 §2.2): turn each word-soup document into four lines — its text
    with a terminal period (kept), a too-short line (dropped), every
    third doc a javascript mention (dropped), every seventh a
    'lorem ipsum' (page dies), every eleventh a curly brace (page
    dies) — then rewrite pages to their surviving lines. The oracle
    replays line retention, the rebuilt text (string_agg over line
    ordinals) and the page verdict relationally — hash-exact."""
    from bigdime_ray.pipelines.text import c4_filters

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        js = pa.array(np.where(
            ids % 3 == 0,
            "\nPlease enable javascript to continue reading this.", ""))
        lorem = pa.array(np.where(
            ids % 7 == 0, "\nClassic lorem ipsum filler appears here.",
            ""))
        brace = pa.array(np.where(
            ids % 11 == 0, "\nA stray { brace lives on this page.", ""))
        t = pc.binary_join_element_wise(
            batch["text"],
            pa.scalar(".\nshort line."
                      "\nAnother perfectly fine sentence appears here."
                      "\nIs this a well formed closing question now?"),
            js, lorem, brace, pa.scalar(""))
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    ds = ds.map_batches(synth, batch_format="pyarrow",
                        zero_copy_batch=True)
    return c4_filters(ds)


def _q_dsir_scores(sf_dir: str):
    """DSIR-style importance scoring (pipelines/text.py::{dsir_weights,
    dsir_scores}; Xie et al. 2023): target domain = the 'en' documents,
    raw = the whole corpus; per-word add-one RATIO weights (integer
    fixed-point, not the paper's float log-ratio — documented variant)
    broadcast once, every document scored by one searchsorted +
    np.add.at pass. The oracle recomputes counts, weights and scores
    from the word STRINGS, so fingerprint collisions or weight-table
    bugs cannot hide. Same tokenization as top_words_by_source."""
    from bigdime_ray.pipelines.text import dsir_scores, dsir_weights

    raw = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    target = raw.filter(expr="lang == 'en'")
    h, w = dsir_weights(target, raw)
    out = dsir_scores(raw, h, w)
    return out.map_batches(
        lambda b: b.select(["doc_id", "dsir_score_fp"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_substring_dedup(sf_dir: str):
    """ExactSubstr-style repeated-substring masking (pipelines/text.py
    ::dedup_substrings, the Lee et al. 2022 recipe windowed): every
    stride-1 32-byte window repeated anywhere in the corpus is cut
    from all docs but the min-doc_id keeper; overlapping windows merge
    into spans. The documents table is word-soup over a tiny
    vocabulary, so real cross-doc repeats abound (~6k distinct repeated
    windows at sf0.01). Output is the per-doc (flagged windows, masked
    bytes) pair; the oracle re-derives BOTH from the substring CONTENT
    (grid enumeration + interval-union islands), so a fingerprint or
    interval bug cannot hide. Corpus is ASCII (bytes == chars, checked
    by the schema gate's charset) — the byte-window/char-substring
    equivalence the oracle relies on."""
    from bigdime_ray.pipelines.text import dedup_substrings

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_substrings(ds, k=_SUBSTR_K)
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_dup_windows",
                            "n_masked_chars"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_url_components(sf_dir: str):
    """URL decomposition (functions/html.py::parse_url_components):
    synthesize one crawl URL per document (host varies by source),
    parse with one vectorized RE2 pass, return all components plus the
    second-level-domain aggregation key; every fourth doc carries a
    query string so the optional group is exercised. DuckDB evaluates the IDENTICAL
    regex grammar, so the two parsers verify each other — including the
    absent-query → empty-string normalization."""
    from bigdime_ray.functions.html import parse_url_components

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def build(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.string())
        q = pc.if_else(
            pc.equal(pc.bit_wise_and(batch["doc_id"], 3), 0),
            pc.binary_join_element_wise(pa.scalar("?ref="),
                                        batch["lang"], pa.scalar("")),
            pa.scalar("", type=pa.string()))
        url = pc.binary_join_element_wise(
            pa.scalar("https://"), batch["source"],
            pa.scalar(".example.org/d/"), ids, q, pa.scalar(""))
        comps = parse_url_components(url)
        return pa.table({
            "doc_id": batch["doc_id"],
            "url": url,
            "scheme": comps["scheme"],
            "host": comps["host"],
            "path": comps["path"],
            "url_query": comps["query"],
            "host_sld": comps["host_sld"],
        })

    return ds.map_batches(build, batch_format="pyarrow",
                          zero_copy_batch=True)


_PAGERANK_ITERS = 5


def _host_link_edges(sf_dir: str):
    """Synthesized host link graph shared by host_pagerank/host_hits:
    every document links its source host to a per-lang hub and back,
    and every tenth document links to a pure sink (the dangling-mass
    path for PageRank; a pure authority for HITS)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def edges(batch: pa.Table) -> pa.Table:
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        lang = batch["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        hub = pc.binary_join_element_wise(pa.scalar("hub-"), lang,
                                          pa.scalar(""))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tenth = src.filter(pa.array(ids % 10 == 0))
        sink = pa.array(["sink"] * len(tenth), type=pa.string())
        return pa.table({"src": pa.concat_arrays([src, hub, tenth]),
                         "dst": pa.concat_arrays([hub, src, sink])})

    return ds.map_batches(edges, batch_format="pyarrow",
                          zero_copy_batch=True)


_HOST_EDGES_SQL = (
    "WITH e AS ("
    "SELECT source AS src, 'hub-' || lang AS dst FROM documents "
    "UNION ALL SELECT 'hub-' || lang, source FROM documents "
    "UNION ALL SELECT source, 'sink' FROM documents "
    "WHERE doc_id % 10 = 0), "
    "nodes AS (SELECT DISTINCT node FROM "
    "(SELECT src AS node FROM e UNION SELECT dst FROM e)), "
    "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)")


def _q_host_pagerank(sf_dir: str):
    """Integer-exact PageRank over the synthesized host link graph
    (pipelines/graph.py). Because the whole recurrence is integer
    arithmetic (fixed-point 1e-12 ranks, floor-division
    contributions), the DuckDB oracle replays the identical 5
    iterations as chained CTEs and the comparison is HASH-EXACT — an
    iterative graph algorithm under the same oracle bar as a GROUP BY."""
    from bigdime_ray.pipelines.graph import pagerank

    out = pagerank(_host_link_edges(sf_dir), iterations=_PAGERANK_ITERS)
    return out.select(["node", "rank_fp"])


def _pagerank_oracle_sql(iters: int) -> str:
    """The identical integer recurrence, iterations unrolled as CTEs."""
    s = (_HOST_EDGES_SQL +
         ", deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d "
         "FROM e GROUP BY src), "
         "pr0 AS (SELECT node, CAST(1000000000000 // (SELECT n FROM nn) "
         "AS BIGINT) AS r FROM nodes)")
    for t in range(iters):
        s += (f", pr{t + 1} AS MATERIALIZED (SELECT nodes.node, "
              "CAST(3000000000000 // (20 * (SELECT n FROM nn)) + "
              "(17 * (COALESCE(c.s, 0) + "
              f"(SELECT CAST(COALESCE(SUM(p.r), 0) AS BIGINT) FROM pr{t} "
              "p LEFT JOIN deg ON deg.node = p.node "
              "WHERE deg.node IS NULL) // (SELECT n FROM nn))) // 20 "
              "AS BIGINT) AS r FROM nodes LEFT JOIN "
              "(SELECT e.dst AS node, CAST(SUM(p.r // deg.d) AS BIGINT) "
              f"AS s FROM e JOIN pr{t} p ON e.src = p.node "
              "JOIN deg ON deg.node = e.src GROUP BY e.dst) c "
              "ON c.node = nodes.node)")
    return s + (f" SELECT node, r AS rank_fp FROM pr{iters}")


def _q_host_degrees(sf_dir: str):
    """Per-node in/out degrees of the shared host link graph
    (pipelines/graph.py::degree_stats): out-degrees ride the node
    table, in-degrees cost one packed exchange. Oracle = two GROUP BYs
    over the edge list, full-outer-merged per node."""
    from bigdime_ray.pipelines.graph import degree_stats

    return degree_stats(_host_link_edges(sf_dir))


def _q_host_pagerank_seeded(sf_dir: str):
    """PERSONALIZED PageRank (crawl seed-expansion variant): teleport
    and initial mass concentrate on the per-lang hub nodes; dangling
    mass returns to the seeds. Same integer recurrence, so the oracle
    again replays it as MATERIALIZED CTEs — hash-exact."""
    from bigdime_ray.pipelines.graph import pagerank

    ds = _read(sf_dir, "documents", columns=["lang"])
    hubs = sorted({"hub-" + r["lang"]
                   for r in ds.groupby("lang").count().take_all()})
    out = pagerank(_host_link_edges(sf_dir),
                   iterations=_PAGERANK_ITERS, seed_nodes=hubs)
    return out.select(["node", "rank_fp"])


def _ppr_oracle_sql(iters: int) -> str:
    """Personalized recurrence unrolled; seeds = nodes LIKE 'hub-%'."""
    s = (_HOST_EDGES_SQL +
         ", deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d "
         "FROM e GROUP BY src), "
         "sn AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM nodes "
         "WHERE node LIKE 'hub-%'), "
         "pr0 AS (SELECT node, CASE WHEN node LIKE 'hub-%' THEN "
         "CAST(1000000000000 // (SELECT ns FROM sn) AS BIGINT) "
         "ELSE 0 END AS r FROM nodes)")
    for t in range(iters):
        s += (f", pr{t + 1} AS MATERIALIZED (SELECT nodes.node, "
              "CAST(CASE WHEN nodes.node LIKE 'hub-%' THEN "
              "3000000000000 // (20 * (SELECT ns FROM sn)) "
              "ELSE 0 END + "
              "(17 * (COALESCE(c.s, 0) + "
              "CASE WHEN nodes.node LIKE 'hub-%' THEN "
              f"(SELECT CAST(COALESCE(SUM(p.r), 0) AS BIGINT) FROM pr{t} "
              "p LEFT JOIN deg ON deg.node = p.node "
              "WHERE deg.node IS NULL) // (SELECT ns FROM sn) "
              "ELSE 0 END)) // 20 "
              "AS BIGINT) AS r FROM nodes LEFT JOIN "
              "(SELECT e.dst AS node, CAST(SUM(p.r // deg.d) AS BIGINT) "
              f"AS s FROM e JOIN pr{t} p ON e.src = p.node "
              "JOIN deg ON deg.node = e.src GROUP BY e.dst) c "
              "ON c.node = nodes.node)")
    return s + (f" SELECT node, r AS rank_fp FROM pr{iters}")


_HITS_ITERS = 4


def _q_host_hits(sf_dir: str):
    """Integer-exact HITS hubs/authorities over the same host link
    graph (pipelines/graph.py::hits): fixed-point 1e-9 vectors with a
    deterministic integer normalization (// max(1, total // S)), so the
    DuckDB oracle replays the identical 4 iterations (two propagation
    half-steps each) as chained CTEs — hash-exact like host_pagerank."""
    from bigdime_ray.pipelines.graph import hits

    out = hits(_host_link_edges(sf_dir), iterations=_HITS_ITERS)
    return out.select(["node", "hub_fp", "auth_fp"])


def _hits_oracle_sql(iters: int) -> str:
    """The identical integer recurrence, iterations unrolled as CTEs.
    S = 1e9 (graph.HITS_SCALE); normalization divisor is
    GREATEST(1, SUM(raw) // S), matching _half_step exactly."""
    s = (_HOST_EDGES_SQL +
         ", h0 AS (SELECT node, CAST(1000000000 // (SELECT n FROM nn) "
         "AS BIGINT) AS r FROM nodes)")
    for t in range(iters):
        s += (f", ar{t} AS MATERIALIZED (SELECT e.dst AS node, "
              "CAST(SUM(h.r) AS BIGINT) AS s "
              f"FROM e JOIN h{t} h ON e.src = h.node GROUP BY e.dst)"
              f", a{t} AS MATERIALIZED (SELECT nodes.node, "
              "CAST(COALESCE(ar.s, 0) // GREATEST(1, "
              f"(SELECT COALESCE(CAST(SUM(s) AS BIGINT), 0) FROM ar{t}) "
              "// 1000000000) AS BIGINT) AS r "
              f"FROM nodes LEFT JOIN ar{t} ar ON ar.node = nodes.node)"
              f", hr{t} AS MATERIALIZED (SELECT e.src AS node, "
              "CAST(SUM(a.r) AS BIGINT) AS s "
              f"FROM e JOIN a{t} a ON e.dst = a.node GROUP BY e.src)"
              f", h{t + 1} AS MATERIALIZED (SELECT nodes.node, "
              "CAST(COALESCE(hr.s, 0) // GREATEST(1, "
              f"(SELECT COALESCE(CAST(SUM(s) AS BIGINT), 0) FROM hr{t}) "
              "// 1000000000) AS BIGINT) AS r "
              f"FROM nodes LEFT JOIN hr{t} hr ON hr.node = nodes.node)")
    return s + (f" SELECT nodes.node, h{iters}.r AS hub_fp, "
                f"a{iters - 1}.r AS auth_fp FROM nodes "
                f"JOIN h{iters} ON h{iters}.node = nodes.node "
                f"JOIN a{iters - 1} ON a{iters - 1}.node = nodes.node")


def _q_url_canonical(sf_dir: str):
    """URL canonicalization (functions/html.py::canonicalize_urls):
    synthesize per-doc URLs exercising every rule — mixed-case scheme
    and host, default ports, tracking params (sometimes the WHOLE
    query), fragments — and emit the canonical form next to the raw.
    The oracle reimplements the normalization relationally
    (regexp split, conditional port strip, list_filter on params,
    piecewise rebuild) — hash-exact."""
    from bigdime_ray.functions.html import canonicalize_urls

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sch = pa.array(np.where(ids % 2 == 0, "HTTPS://WWW.",
                                "http://WWW."))
        port = pa.array(np.where(ids % 2 == 0, ":443", ":80"))
        path = pa.array(np.where(
            ids % 4 == 0, "",
            np.char.add("/Articles/", ids.astype(str))))
        fb = pa.array(np.where(ids % 3 == 0, "&fbclid=track", ""))
        idp = pa.array(np.where(
            ids % 6 == 0, "",
            np.char.add("&id=", (ids % 50).astype(str))))
        lang = batch["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        frag = pc.if_else(
            pa.array(ids % 5 == 0),
            pc.binary_join_element_wise(pa.scalar("#sec-"), lang,
                                        pa.scalar("")),
            pa.scalar("", type=pa.string()))
        url = pc.binary_join_element_wise(
            sch, batch["source"], pa.scalar(".Example.ORG"), port,
            path, pa.scalar("?utm_source=feed"), fb, idp, frag,
            pa.scalar(""))
        return pa.table({"doc_id": batch["doc_id"], "url": url})

    ds = ds.map_batches(synth, batch_format="pyarrow",
                        zero_copy_batch=True)

    def canon(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "canon", canonicalize_urls(batch["url"]))

    return ds.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True)


def _q_warc_ingest(sf_dir: str):
    """Crawl-archive round trip (sources/warc.py): synthesize the same
    deterministic HTML pages as documents_html_extracted, pack them as
    HTTP responses into multi-member-gzip WARC files (one file per
    block, distributed writer, atomic replace), then run the full
    ingest front end — distributed WARC parse → vectorized HTTP split →
    HTML→text — and recover (doc_id, text) from the WARC-Target-URI.
    The oracle is the plain SQL HTML extraction: equality proves the
    WARC container + HTTP framing round-trip payloads bit-exactly."""
    import shutil

    from bigdime_ray.functions.html import synthesize_html
    from bigdime_ray.sources.warc import (warc_text_documents,
                                          write_warc_dataset)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.string())
        return pa.table({
            "target_uri": pc.binary_join_element_wise(
                pa.scalar("https://example.org/d/"), ids, pa.scalar("")),
            "html": synthesize_html(batch["doc_id"], batch["text"]),
        })

    out_dir = os.path.join("/tmp/bigdime_warc",
                           os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)
    paths = write_warc_dataset(
        ds.map_batches(synth, batch_format="pyarrow",
                       zero_copy_batch=True),
        out_dir, html_col="html", uri_col="target_uri",
        gzip_per_record=True)

    docs = warc_text_documents(paths)

    def finish(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["target_uri"], r"/d/(?P<id>\d+)$")
        return pa.table({
            "doc_id": pc.cast(pc.struct_field(m, "id"), pa.int64()),
            "text": batch["text"],
        })

    return docs.map_batches(finish, batch_format="pyarrow",
                            zero_copy_batch=True)


def _q_sessions(sf_dir: str):
    """Gap-based sessionization (30-minute gap) per user."""
    from bigdime_ray.pipelines.stream import session_windows
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = session_windows(ds, "user_id", "ts", gap_seconds=1800.0)
    return out.map_batches(
        lambda b: b.select(["user_id", "session_id", "n_events",
                            "session_start", "session_end"]),
        batch_format="pyarrow")


def _q_heavy_hitters(sf_dir: str):
    """Sketch-first EXACT heavy hitters: Misra-Gries candidates (block
    states, superset-guaranteed) + exact broadcast recount."""
    from bigdime_ray.pipelines.frequency import heavy_hitters
    ds = _read(sf_dir, "lineitem", columns=["l_partkey"])
    return heavy_hitters(ds, "l_partkey", threshold=40)


def _q_distinct_count(sf_dir: str):
    """Exact COUNT(DISTINCT) via the packed-cell exchange."""
    from bigdime_ray.pipelines.frequency import distinct_count
    ds = _read(sf_dir, "lineitem", columns=["l_partkey"])
    return pa.table({"cnt": pa.array([distinct_count(ds, "l_partkey")],
                                     type=pa.int64())})


def _q_asof_join(sf_dir: str):
    """As-of join: each purchase matched to the user's latest prior (or
    simultaneous) click — per-key co-partitioned searchsorted."""
    from bigdime_ray.pipelines.stream import asof_join_packed_tagged
    # ONE scan with a row-filter pushed into the read (row-group
    # pruning; only the two relevant event types leave storage), then
    # the packed-cell exchange (int64 keys): #blocks × #buckets cells
    # move instead of every row through the sort-shuffle. The previous
    # two-filtered-reads + grouped path measured 2.1–2.6 s here, all
    # fixed overhead on tiny blocks.
    cols = ["event_id", "user_id", "ts", "event_type"]
    p = os.path.join(sf_dir, "events.parquet")
    # Ray splits a small file into ~2×CPU near-empty blocks and the
    # per-block fixed cost then dominates the exchange (measured 1.3 s
    # → 0.4 s at sf0.1): target ~32 MB of file per block, floor 4; big
    # inputs (>128 blocks) keep Ray's own splitting
    nb = max(4, os.path.getsize(p) // (32 << 20) + 1)
    kw = {"override_num_blocks": int(nb)} if nb <= 128 else {}
    ev = ray.data.read_parquet(
        p, columns=cols,
        filter=(pc.field("event_type").isin(["purchase", "click"])), **kw)
    out = asof_join_packed_tagged(ev, key="user_id", ts_col="ts",
                                  id_col="event_id",
                                  side_col="event_type",
                                  left_value="purchase",
                                  right_value="click",
                                  out_col="click_event_id")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(b["k"], pa.int64()), "ts": b["ts"],
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "click_event_id": pc.cast(b["click_event_id"], pa.float64())})

    return out.map_batches(rename, batch_format="pyarrow")


def _q_asof_join_next(sf_dir: str):
    """FORWARD as-of join: each purchase matched to the user's EARLIEST
    click at-or-after it — the 'next event' direction, obtained from
    the SAME backward packed kernel by negating timestamps (latest
    −c ≤ −p ⟺ smallest c ≥ p; the kernel's int64 ts math is
    sign-agnostic). Tie semantics inherited: MAX(event_id) among
    equal-ts clicks, mirrored in the oracle's pre-aggregation."""
    from bigdime_ray.pipelines.stream import asof_join_packed_tagged
    cols = ["event_id", "user_id", "ts", "event_type"]
    p = os.path.join(sf_dir, "events.parquet")
    nb = max(4, os.path.getsize(p) // (32 << 20) + 1)
    kw = {"override_num_blocks": int(nb)} if nb <= 128 else {}
    ev = ray.data.read_parquet(
        p, columns=cols,
        filter=(pc.field("event_type").isin(["purchase", "click"])), **kw)

    def negate(b: pa.Table) -> pa.Table:
        ti = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        return pa.table({
            "event_id": b["event_id"], "user_id": b["user_id"],
            "ts": pa.array((-ti).view("datetime64[us]"),
                           type=pa.timestamp("us")),
            "event_type": b["event_type"]})

    out = asof_join_packed_tagged(
        ev.map_batches(negate, batch_format="pyarrow",
                       zero_copy_batch=True),
        key="user_id", ts_col="ts", id_col="event_id",
        side_col="event_type", left_value="purchase",
        right_value="click", out_col="next_click_id")

    def rename(b: pa.Table) -> pa.Table:
        ti = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        return pa.table({
            "user_id": pc.cast(b["k"], pa.int64()),
            "ts": pa.array((-ti).view("datetime64[us]"),
                           type=pa.timestamp("us")),
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "next_click_id": pc.cast(b["next_click_id"],
                                     pa.float64())})

    return out.map_batches(rename, batch_format="pyarrow")


def _q_asof_join_windowed(sf_dir: str):
    """As-of join with a match-window tolerance (attribution semantics):
    each purchase matched to the latest prior click of the same user
    WITHIN 2 hours — older clicks are no match. Same packed-cell
    exchange as events_asof_join."""
    from bigdime_ray.pipelines.stream import asof_join_packed_tagged
    cols = ["event_id", "user_id", "ts", "event_type"]
    p = os.path.join(sf_dir, "events.parquet")
    nb = max(4, os.path.getsize(p) // (32 << 20) + 1)
    kw = {"override_num_blocks": int(nb)} if nb <= 128 else {}
    ev = ray.data.read_parquet(
        p, columns=cols,
        filter=(pc.field("event_type").isin(["purchase", "click"])), **kw)
    out = asof_join_packed_tagged(ev, key="user_id", ts_col="ts",
                                  id_col="event_id",
                                  side_col="event_type",
                                  left_value="purchase",
                                  right_value="click",
                                  out_col="click_event_id",
                                  tolerance_us=2 * 3_600_000_000)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(b["k"], pa.int64()), "ts": b["ts"],
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "click_event_id": pc.cast(b["click_event_id"], pa.float64())})

    return out.map_batches(rename, batch_format="pyarrow")


def _q_interval_overlap(sf_dir: str):
    """Range-join aggregate: for every click, how many purchase windows
    [purchase_ts, purchase_ts + 2h] of the same user were active —
    exact under arbitrary overlap via two merged-lexsort ranks per
    bucket (#lo<=ts − #hi<ts), never an interval enumeration."""
    from bigdime_ray.pipelines.stream import interval_overlap_count
    cols = ["event_id", "user_id", "ts", "event_type"]
    p = os.path.join(sf_dir, "events.parquet")
    nb = max(4, os.path.getsize(p) // (32 << 20) + 1)
    kw = {"override_num_blocks": int(nb)} if nb <= 128 else {}

    def _typed(t):
        return ray.data.read_parquet(
            p, columns=cols, filter=(pc.field("event_type") == t), **kw)

    H2 = 2 * 3_600_000_000  # µs

    def widen(b: pa.Table) -> pa.Table:
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        return pa.table({
            "user_id": b["user_id"],
            "lo": pa.array(ts.view("datetime64[us]"),
                           type=pa.timestamp("us")),
            "hi": pa.array((ts + H2).view("datetime64[us]"),
                           type=pa.timestamp("us"))})

    intervals = _typed("purchase").map_batches(widen,
                                               batch_format="pyarrow",
                                               zero_copy_batch=True)
    out = interval_overlap_count(_typed("click"), intervals,
                                 key="user_id", ts_col="ts",
                                 lo_col="lo", hi_col="hi",
                                 event_id="event_id")

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()), "ts": b["ts"],
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "n_active": pc.cast(b["n_active"], pa.int64())})

    return out.map_batches(proj, batch_format="pyarrow")


def _q_media_near_dup_pairs(sf_dir: str):
    """Multimodal NEAR-DUP detection (rows-only): deterministic real
    media with PLANTED perceptual duplicates (noise-perturbed image
    copies, gain-scaled audio copies) → actor-pool perceptual hashes
    (dHash / envelope fingerprint) → generic Hamming LSH + in-bucket
    verify (pipelines/multimodal.py::media_perceptual_dedup over
    pipelines/dedup.py::hamming_near_dup). Pytest pins the planted
    pairs; this entry drives the same path through the driver
    surface."""
    import ray.data as rd
    from bigdime_ray.functions.codecs import (decode_image, decode_wav,
                                              encode_ppm, encode_wav)
    from bigdime_ray.pipelines.multimodal import (media_perceptual_dedup,
                                                  synth_real_media_table)
    t = synth_real_media_table(n=120, seed=13).to_pandas()
    rng = np.random.default_rng(29)
    extra = []
    for i, (_, row) in enumerate(
            t[t.kind == "image"].head(5).iterrows()):
        px = decode_image(row.payload)  # PPM / PNG / JPEG source
        noisy = np.clip(px.astype(np.int64)
                        + rng.integers(-4, 5, px.shape), 0, 255) \
            .astype(np.uint8)
        extra.append({"media_id": f"dup-img-{i}", "kind": "image",
                      "payload": encode_ppm(noisy),
                      "width": px.shape[1], "height": px.shape[0],
                      "sample_rate": 0})
    for i, (_, row) in enumerate(
            t[t.kind == "audio"].head(5).iterrows()):
        s, sr = decode_wav(row.payload)
        half = (s.astype(np.float64) * 0.5).astype(np.int16)
        extra.append({"media_id": f"dup-aud-{i}", "kind": "audio",
                      "payload": encode_wav(half, sr), "width": 0,
                      "height": 0, "sample_rate": sr})
    full = pd.concat([t, pd.DataFrame(extra)], ignore_index=True)
    ds = rd.from_arrow(pa.Table.from_pandas(full)).repartition(4)
    res = media_perceptual_dedup(ds, max_hamming=6, concurrency=2)
    out = res.pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.table({"id_a": pa.array(out.id_a, type=pa.string()),
                     "id_b": pa.array(out.id_b, type=pa.string()),
                     "similarity": pa.array(out.similarity,
                                            type=pa.float64())})


def _q_media_features(sf_dir: str):
    """Multimodal pipeline end-to-end through the driver surface with
    REAL codecs: deterministic real media (binary PPM images, PCM16 WAV
    audio, concatenated-P6 video — `functions/codecs.py`, pure
    numpy/struct) → actor-pool decode/feature stage → real
    nearest-neighbor resize → real frame splitting (rows-only)."""
    import ray.data as rd
    from bigdime_ray.pipelines.multimodal import (extract_media_features,
                                                  frame_sample,
                                                  resize_media,
                                                  synth_real_media_table)
    tbl = synth_real_media_table(n=300, seed=11)
    ds = rd.from_arrow(tbl).repartition(4)
    feats = extract_media_features(ds, concurrency=2).to_pandas()
    resized = resize_media(ds, 24, 24, concurrency=2)
    frames = frame_sample(resized, num_frames=3).to_pandas()
    out = pd.DataFrame({
        "media_id": feats["media_id"], "kind": feats["kind"],
        "decode_ok": feats["decode_ok"],
        "n_frames": feats["media_id"].map(
            frames.groupby("media_id").size()).fillna(0).astype("int64")})
    return pa.Table.from_pandas(out, preserve_index=False)


def _q_media_triage(sf_dir: str):
    """Multimodal ingest triage (rows-only): header-only metadata probe
    (`probe_media_metadata` — PPM/PNG/JPEG-SOF/WAV/FLAC-STREAMINFO/MP3
    frame headers, no full decode) routes rows; probe-ok rows then flow through the
    real decode/feature actor-pool stage; undecodable rows surface as
    probe_ok=false instead of failing the batch. The cheap-first-pass
    pattern a 100 TB media ingest needs: the probe touches ~100 bytes
    per row, the expensive decode only runs on rows the probe
    admitted."""
    import ray.data as rd
    from bigdime_ray.pipelines.multimodal import (extract_media_features,
                                                  probe_media_metadata,
                                                  synth_real_media_table)
    t = synth_real_media_table(n=200, seed=17).to_pandas()
    # plant undecodables: junk magic + a truncated PNG
    t.loc[len(t)] = {"media_id": "junk-0", "kind": "image",
                     "payload": b"\x00nope", "width": 0, "height": 0,
                     "sample_rate": 0}
    t.loc[len(t)] = {"media_id": "junk-1", "kind": "image",
                     "payload": b"\x89PNG\r\n\x1a\n\x00\x00", "width": 0,
                     "height": 0, "sample_rate": 0}
    ds = rd.from_arrow(pa.Table.from_pandas(t, preserve_index=False)) \
        .repartition(4)
    probed = probe_media_metadata(ds).to_pandas().set_index("media_id")
    ok_ids = pa.array(probed[probed.probe_ok].index.to_numpy())
    admitted = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["media_id"], value_set=ok_ids)),
        batch_format="pyarrow", zero_copy_batch=True)
    feats = extract_media_features(admitted, concurrency=2).to_pandas()
    out = probed.reset_index().merge(
        feats[["media_id", "decode_ok"]], on="media_id", how="left")
    out["decode_ok"] = out["decode_ok"].fillna(False).astype(bool)
    out = out.sort_values("media_id").reset_index(drop=True)
    return pa.table({
        "media_id": pa.array(out.media_id, type=pa.string()),
        "format": pa.array(out.format, type=pa.string()),
        "kind": pa.array(out.kind, type=pa.string()),
        "probe_ok": pa.array(out.probe_ok, type=pa.bool_()),
        "decode_ok": pa.array(out.decode_ok, type=pa.bool_())})


def _q_stratified_sample(sf_dir: str):
    """Deterministic hash-based per-stratum sampling (reproducible,
    retry-safe, SQL-expressible — not RNG)."""
    from bigdime_ray.pipelines.curate import stratified_sample
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = stratified_sample(ds, "source",
                            rates={"web": 0.5, "wiki": 0.25},
                            default_rate=0.1)
    return out.map_batches(lambda b: b.select(["doc_id", "source"]),
                           batch_format="pyarrow")


_MIX_BUDGET = 400


def _q_temperature_mix(sf_dir: str):
    """UniMax-style temperature mixing (τ=2) over the skewed lang
    column (pipelines/curate.py::temperature_mix): sampling mass ∝
    sqrt(count), upweighting low-resource languages, applied with the
    hash-derived per-stratum filter. INTEGER-EXACT end to end — the
    tempered weight floor(sqrt(c)·2^20) is bit-identical in
    Python/DuckDB (correctly-rounded sqrt, power-of-two scale) and
    everything after is integer — so the oracle replays rates AND
    membership hash-exactly. Output: per-lang threshold + kept count."""
    from bigdime_ray.pipelines.curate import (strata_counts,
                                              temperature_mix,
                                              temperature_mix_rates)
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    rates = temperature_mix_rates(strata_counts(ds, "lang"),
                                  budget_docs=_MIX_BUDGET,
                                  temperature=2.0)
    kept = strata_counts(
        temperature_mix(ds, strata_col="lang", budget_docs=_MIX_BUDGET,
                        temperature=2.0), "lang")
    langs = sorted(rates)
    return pa.table({
        "lang": pa.array(langs, type=pa.string()),
        "rate_pm": pa.array([rates[g] for g in langs], type=pa.int64()),
        "kept": pa.array([kept.get(g, 0) for g in langs],
                         type=pa.int64()),
    })


def _q_hopping_window(sf_dir: str):
    """Overlapping 1h windows hopping every 30 min — each event lands in
    size/hop = 2 windows; the (user, window) aggregate goes through the
    packed-cell sum exchange like events_hourly (the library's general
    ``hopping_window`` demonstrates the groupby form)."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    HOP_US = 1_800_000_000
    SHIFT = np.int64(1) << np.int64(25)  # half-hour index < 2^25

    def extract(batch: pa.Table):
        t = (batch["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").view(np.int64))
        if len(t) and t.min() < HOP_US:
            # widx==0 would make `widx - 1` wrap into user uid-1's key
            # space (ADVICE r2); pre-epoch ts is ambiguous the same way.
            # The library `hopping_window` handles this via floor division.
            raise ValueError("events_hopping packing assumes ts >= "
                             "1970-01-01 00:30 (one hop past epoch)")
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        widx = t // HOP_US
        val_s = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                         * 10_000 + 0.5).astype(np.int64)
        # window starts at widx and widx-1 (size = 2 hops)
        keys = np.concatenate([uid * SHIFT + widx,
                               uid * SHIFT + widx - 1])
        v2 = np.concatenate([val_s, val_s])
        return keys, [np.ones(len(keys), dtype=np.int64), v2]

    keys, (cnt, total) = grouped_int_sums_exchange(ds, extract, 2)
    win = ((keys % SHIFT) * HOP_US).astype("datetime64[us]")
    return pa.table({
        "user_id": pa.array(keys // SHIFT),
        "window_start": pa.array(win, type=pa.timestamp("us")),
        "cnt": pa.array(cnt), "total": pa.array(total)})


def _q_customers_without_orders(sf_dir: str):
    """Broadcast ANTI-join: customers never appearing in orders — the
    orders key set ships once (projected Arrow pull + is_in), customer
    streams through a filter; no shuffle."""
    import ray as _ray
    keys = pa.concat_tables(_ray.get(
        _read(sf_dir, "orders", columns=["o_custkey"]).to_arrow_refs())
    )["o_custkey"].combine_chunks()
    ds = _read(sf_dir, "customer", columns=["c_custkey"])

    def anti(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(
            pc.is_in(batch["c_custkey"], value_set=keys)))

    out = ds.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(out, pa.schema([("c_custkey", pa.int64())]))


def _q_parts_with_heavy_orders(sf_dir: str):
    """Broadcast SEMI-join: parts appearing in at least one high-quantity
    lineitem. The qualifying l_partkey set is built with the row filter
    pushed into the parquet read (only matching row groups leave
    storage), deduped driver-side, and shipped once; part streams
    through an is_in filter — no shuffle, the semi sibling of
    customers_without_orders."""
    import ray as _ray
    import pyarrow.dataset as pads
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey"],
        filter=pads.field("l_quantity") > 45)
    keys = pc.unique(pa.concat_tables(
        _ray.get(li.to_arrow_refs()))["l_partkey"].combine_chunks())
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["p_partkey"], value_set=keys))

    out = ds.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(out, pa.schema([("p_partkey", pa.int64()),
                                    ("p_brand", pa.string())]))


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shape COMPOSITE pipeline: three-table filter + join +
    groupby + top-k in one lazy graph — the 'could a reference user run
    their real pipeline' test is composition, not unit coverage.

    Scale shape: both date filters push into the parquet reads (only
    matching row groups leave storage); the BUILDING customer keys
    broadcast once (small side); lineitem pre-aggregates revenue per
    order BEFORE the join (orders attributes are functional on the
    key, so group-then-join == join-then-group but the join input
    shrinks from |lineitem| to |orders|); the final top-10 is a
    per-block prune + ≤ blocks×10-row driver merge, never a full sort.
    The groupby→join seam applies the repo's empty-block discipline
    (drop_empty_blocks + materialize between the two hash exchanges —
    CLAUDE.md deadlock note)."""
    import datetime as _dt
    import ray as _ray
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum
    from bigdime_ray.stages.shuffle import drop_empty_blocks

    cut = _dt.datetime(1998, 6, 1)
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING")
    ckeys = pc.unique(pa.concat_tables(
        _ray.get(cust.to_arrow_refs()))["c_custkey"].combine_chunks())

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=pads.field("o_orderdate") < cut)

    def sel_orders(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["o_custkey"], value_set=ckeys)
        return batch.filter(keep).drop_columns(["o_custkey"])

    orders = orders.map_batches(sel_orders, batch_format="pyarrow",
                                zero_copy_batch=True)

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > cut)

    def revenue(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "rev_s": _scaled_i64(ep * (1.0 - disc), 1_000)})

    # Size dispatch (the _auto_scale_dispatch discipline): the filtered
    # orders side is |BUILDING ∩ date<cut| — tiny at benchable scales,
    # huge at 100 TB. Below the broadcast bound, gather order attrs via
    # the searchsorted LUT (ONE hash exchange total: the lineitem
    # groupby, itself pre-filtered by the order key set so only
    # BUILDING orders' lineitems shuffle); above it, fall back to the
    # co-partitioned Dataset.join with the empty-block + materialize
    # seam discipline.
    orders_mat = orders.materialize()
    if orders_mat.count() <= 2_000_000:
        from bigdime_ray.pipelines.join import broadcast_join
        otabs = [t for t in _ray.get(orders_mat.to_arrow_refs())
                 if t.num_rows > 0]
        otab = pa.concat_tables(otabs).combine_chunks()
        okeys = otab["o_orderkey"].combine_chunks()

        def sel_li(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch["l_orderkey"], value_set=okeys))

        per_order = (li.map_batches(sel_li, batch_format="pyarrow",
                                    zero_copy_batch=True)
                     .map_batches(revenue, batch_format="pyarrow",
                                  zero_copy_batch=True)
                     .groupby("l_orderkey")
                     .aggregate(Sum("rev_s", alias_name="revenue")))
        joined = broadcast_join(per_order,
                                ray.data.from_arrow(otab),
                                "l_orderkey", "o_orderkey")
    else:
        per_order = (li.map_batches(revenue, batch_format="pyarrow",
                                    zero_copy_batch=True)
                     .groupby("l_orderkey")
                     .aggregate(Sum("rev_s", alias_name="revenue")))
        per_order = drop_empty_blocks(per_order).materialize()
        joined = per_order.join(orders_mat, join_type="inner",
                                num_partitions=16,
                                on=("l_orderkey",),
                                right_on=("o_orderkey",))

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= 10:
            return batch
        rev = batch["revenue"].to_numpy(zero_copy_only=False)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        top = np.lexsort((okey, -rev))[:10]
        return batch.take(pa.array(top))

    schema = pa.schema([("l_orderkey", pa.int64()),
                        ("revenue", pa.int64()),
                        ("o_orderdate", pa.timestamp("us")),
                        ("o_orderpriority", pa.string())])
    small = _collect(joined.map_batches(prune, batch_format="pyarrow")
                     .select_columns(list(schema.names)), schema)
    rev = small["revenue"].to_numpy(zero_copy_only=False)
    okey = small["l_orderkey"].to_numpy(zero_copy_only=False)
    top = np.lexsort((okey, -rev))[:10]
    return small.combine_chunks().take(pa.array(top))


def _q_quantity_discount_comoments(sf_dir: str):
    """Per-returnflag bivariate moments of (quantity, discount%): the
    exact int64 covariance/correlation building blocks
    (pipelines/frequency.py::grouped_comoments) — order-independent,
    hash-exact against the SQL oracle."""
    from bigdime_ray.pipelines.frequency import grouped_comoments
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_discount"])

    def prep(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "x": _scaled_i64(q, 1),
                         "y": _scaled_i64(d, 100)})

    return grouped_comoments(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        "l_returnflag", "x", "y")


def _q_quantity_discount_corr(sf_dir: str):
    """Per-returnflag Pearson correlation of (quantity, discount%),
    finished from the exact int64 comoment sums
    (pipelines/frequency.py::grouped_comoments). The sums are
    order-independent integers; the final corr is ONE float64 expression
    evaluated in the identical order on both engines
    ((n·sxy − sx·sy)/√((n·sxx − sx²)(n·syy − sy²)), every operand cast
    to double first), then fixed-point ×10⁶ — so the hash compare sees
    the same bits."""
    from bigdime_ray.pipelines.frequency import grouped_comoments
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_discount"])

    def prep(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "x": _scaled_i64(q, 1),
                         "y": _scaled_i64(d, 100)})

    agg = grouped_comoments(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        "l_returnflag", "x", "y")
    schema = pa.schema([("l_returnflag", pa.string())]
                       + [(c, pa.int64())
                          for c in ("n", "sx", "sy", "sxx", "syy",
                                    "sxy")])
    small = _collect(agg, schema)
    n = small["n"].to_numpy().astype(np.float64)
    sx = small["sx"].to_numpy().astype(np.float64)
    sy = small["sy"].to_numpy().astype(np.float64)
    sxx = small["sxx"].to_numpy().astype(np.float64)
    syy = small["syy"].to_numpy().astype(np.float64)
    sxy = small["sxy"].to_numpy().astype(np.float64)
    numer = n * sxy - sx * sy
    denom = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    corr = np.where(denom > 0.0, numer / np.where(denom > 0.0, denom,
                                                  1.0), 0.0)
    return pa.table({
        "l_returnflag": small["l_returnflag"],
        "n": small["n"],
        "corr_micro": pa.array(
            np.floor(corr * 1_000_000 + 0.5).astype(np.int64))})


def _q_customer_order_full_outer(sf_dir: str):
    """FULL OUTER join of wealthy customers vs big-order counts per
    customer on STRING keys
    (pipelines/join.py::string_key_full_outer_join: verified inner ⊎
    two broadcast anti branches) — exercises matched, left-only and
    right-only regions at every SF. Aggregated right side passes
    through drop_empty_blocks (groupby → join hazard, CLAUDE.md)."""
    from ray.data.aggregate import Sum
    from bigdime_ray.pipelines.join import string_key_full_outer_join
    from bigdime_ray.stages.shuffle import drop_empty_blocks

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def prep_left(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["c_acctbal"], 9000.0)
        out = batch.filter(keep)
        bal = out["c_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cust_l": pc.cast(out["c_custkey"], pa.string()),
            "acctbal_cents": _scaled_i64(bal, 100)})

    # the filter can empty whole blocks; empty blocks BYPASS later map
    # operators (CLAUDE.md), so they'd reach the join without the hash
    # column — drop them here, same discipline as groupby-derived sides
    left = drop_empty_blocks(
        cust.map_batches(prep_left, batch_format="pyarrow",
                         zero_copy_batch=True))

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["o_totalprice"], 470_000.0)
        out = batch.filter(keep)
        k = out["o_custkey"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(k, return_counts=True)
        return pa.table({"o_custkey": pa.array(uniq),
                         "n_orders": pa.array(cnt.astype(np.int64))})

    right = (orders.map_batches(part, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("o_custkey")
             .aggregate(Sum("n_orders", alias_name="n_orders")))
    right = drop_empty_blocks(right).map_batches(
        lambda b: pa.table({
            "cust_r": pc.cast(b["o_custkey"], pa.string()),
            "n_orders": b["n_orders"]}),
        batch_format="pyarrow")

    joined = string_key_full_outer_join(left, right, "cust_l", "cust_r",
                                        num_partitions=8)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cust_key": pc.coalesce(batch["cust_l"], batch["cust_r"]),
            "acctbal_cents": batch["acctbal_cents"],
            "n_orders": batch["n_orders"]})

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def _q_doc_tfidf(sf_dir: str):
    """Per-(doc, word) TF-IDF over documents (pipelines/text.py::tf_idf)
    — same tokenizer as document_frequency, df broadcast once, ln-score
    fixed-point scaled (×10⁶)."""
    from bigdime_ray.pipelines.text import tf_idf
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tf_idf(ds, min_df=2)


def _q_doc_rank_by_length(sf_dir: str):
    """RANK + DENSE_RANK + PERCENT_RANK + CUME_DIST of documents by
    n_chars (DESC) within source — the bucketed one-lexsort window-rank
    kernel (pipelines/stream.py::grouped_rank); ties share a rank, so
    the result is deterministic without a tiebreak; the two
    distribution functions are single exact-int divisions, fixed-point
    ×10⁶."""
    from bigdime_ray.pipelines.stream import grouped_rank
    ds = _read(sf_dir, "documents",
               columns=["source", "doc_id", "n_chars"])
    return grouped_rank(ds, "source", "n_chars", "doc_id",
                        descending=True)


def _q_monthly_revenue(sf_dir: str):
    """CALENDAR-month windowed aggregate (variable-width windows — the
    fixed-width sibling is events_hourly/hopping): block-local
    pre-aggregation to (month, n, cents) partials via one
    datetime64[M] truncation + np.add.at, so ≤ months × blocks rows
    reach the tiny groupby; Ray's timestamp-key [us]→[s] downcast is
    cast back post-aggregate (CLAUDE.md gotcha)."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]")
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100 + 0.5).astype(np.int64)
        uniq, inv = np.unique(ts, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"month": pa.array(uniq.astype("datetime64[us]")),
                         "n": pa.array(n), "s": pa.array(s)})

    out = (ds.map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("month")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s")))

    def fix_ts(batch: pa.Table) -> pa.Table:
        return pa.table({"month": pc.cast(batch["month"],
                                          pa.timestamp("us")),
                         "n": batch["n"], "s": batch["s"]})

    return out.map_batches(fix_ts, batch_format="pyarrow")


def _q_order_rollup(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): count + revenue
    at every hierarchical grain — data touched once at the finest grain,
    subtotals re-aggregated from that ≤ |priorities|×|statuses|-row
    result (pipelines/frequency.py::rollup_aggregate)."""
    from bigdime_ray.pipelines.frequency import rollup_aggregate
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus",
                        "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderpriority": batch["o_orderpriority"],
                         "o_orderstatus": batch["o_orderstatus"],
                         "cents": _scaled_i64(v, 100)})

    return rollup_aggregate(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["o_orderpriority", "o_orderstatus"], "cents")


def _q_doc_ids_by_source(sf_dir: str):
    """ORDER BY-deterministic string_agg: comma-joined doc ids per
    source (pipelines/frequency.py::grouped_string_agg)."""
    from bigdime_ray.pipelines.frequency import grouped_string_agg
    ds = _read(sf_dir, "documents", columns=["source", "doc_id"])
    return grouped_string_agg(ds, "source", "doc_id", "doc_id")


def _q_doc_lengths_by_source(sf_dir: str):
    """Typed collect_list (rows-only: LIST columns don't hash-compare
    through the SQL oracle; equivalence vs string_agg is pytest-pinned):
    per source, n_chars values ordered by doc_id as list<int64>."""
    from bigdime_ray.pipelines.frequency import grouped_collect_list
    ds = _read(sf_dir, "documents",
               columns=["source", "doc_id", "n_chars"])
    return grouped_collect_list(ds, "source", "n_chars", "doc_id")


def _q_doc_length_moments(sf_dir: str):
    """Per-source COUNT / SUM / SUM-of-squares of n_chars — the exact
    integer building blocks of mean/variance/stddev
    (pipelines/frequency.py::grouped_moments). int64 end to end, so the
    result is order-independent and hash-exact against the SQL oracle
    (float streaming variance would differ in the last ulp)."""
    from bigdime_ray.pipelines.frequency import grouped_moments
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    return grouped_moments(ds, "source", "n_chars")


def _q_grouped_median(sf_dir: str):
    """Exact per-group median (n_chars per source) via the bucketed
    grouped-quantile kernel (one lexsort per co-located hash bucket, no
    per-KEY pandas task — VERDICT r3 #5 retired the per-key map_groups
    form). Median of ints is integer or half-integer, so ×10 fixed-point
    rounding is exact in float64; the huge-group path is the grouped
    t-digest (tdigest_quantiles)."""
    from bigdime_ray.pipelines.frequency import grouped_quantiles
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    rows = grouped_quantiles(ds, "source", "n_chars", [0.5],
                             method="exact").take_all()
    return pa.table({
        "source": pa.array([r["source"] for r in rows]),
        "med": pa.array([int(np.floor(r["q50"] * 10 + 0.5))
                         for r in rows], type=pa.int64())})


def _q_order_price_quantiles(sf_dir: str):
    """Per-priority p25/p50/p75 of o_totalprice via the vectorized
    grouped-quantile kernel (quantile_cont interpolation). Oracle
    discipline for interpolated floats: quantile over PRE-SCALED integer
    cents, then ×4 — with q ∈ {.25,.5,.75} the interpolation fraction is
    a quarter, so 4·quantile is an exact integer in float64 on both
    engines and the final CAST cannot flap on a last-ulp."""
    from bigdime_ray.pipelines.frequency import grouped_quantiles
    ds = _read(sf_dir, "orders", columns=["o_orderpriority",
                                          "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64))})

    out = grouped_quantiles(
        ds.map_batches(cents, batch_format="pyarrow",
                       zero_copy_batch=True),
        "o_orderpriority", "cents", [0.25, 0.5, 0.75])

    def fx(b: pa.Table) -> pa.Table:
        cols = {"o_orderpriority": b["o_orderpriority"]}
        for c in ("q25", "q50", "q75"):
            v = b[c].to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.floor(v * 4 + 0.5).astype(np.int64))
        return pa.table(cols)

    return out.map_batches(fx, batch_format="pyarrow")


def _q_revenue_by_region(sf_dir: str):
    """Multi-hop dimension join resolved ENTIRELY by broadcast: the
    orders→customer→nation→region chain collapses on the driver into
    one (sorted orderkey → region-index) lookup pair, shipped once via
    ray.put; the fact table never shuffles — each block does a
    searchsorted + bincount partial, and ≤ |regions| rows leave each
    task."""
    import ray as _ray

    def _pull(table, cols):
        return pa.concat_tables(_ray.get(
            _read(sf_dir, table, columns=cols).to_arrow_refs()))

    orders = _pull("orders", ["o_orderkey", "o_custkey"])
    cust = _pull("customer", ["c_custkey", "c_nationkey"])
    nation = _pull("nation", ["n_nationkey", "n_regionkey"])
    region = _pull("region", ["r_regionkey", "r_name"])

    # tiny dims → dense index arrays; customer/orders → sorted-key lookup
    n_reg = np.zeros(int(pc.max(nation["n_nationkey"]).as_py()) + 1,
                     dtype=np.int64)
    n_reg[nation["n_nationkey"].to_numpy()] = \
        nation["n_regionkey"].to_numpy()
    r_keys = region["r_regionkey"].to_numpy()
    r_names = region["r_name"].to_pylist()
    # dense r_regionkey -> region index (region keys are tiny ints)
    r_index_dense = np.zeros(int(r_keys.max()) + 1, dtype=np.int64)
    r_index_dense[r_keys] = np.arange(len(r_keys), dtype=np.int64)
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    corder = np.argsort(ck, kind="stable")
    ck_sorted = ck[corder]
    c_region = r_index_dense[
        n_reg[cust["c_nationkey"].to_numpy(zero_copy_only=False)
              .astype(np.int64)[corder]]]
    ok = orders["o_orderkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    oorder = np.argsort(ok, kind="stable")
    ok_sorted = ok[oorder]
    o_cust = orders["o_custkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[oorder]
    # membership-checked lookup (inner-join semantics on dirty inputs:
    # an o_custkey missing from customer drops the order, never
    # mis-attributes it to a neighboring customer's region)
    cpos = np.minimum(np.searchsorted(ck_sorted, o_cust),
                      len(ck_sorted) - 1)
    chit = ck_sorted[cpos] == o_cust
    ok_sorted, cpos = ok_sorted[chit], cpos[chit]
    o_region = c_region[cpos]
    lut = _ray.put((ok_sorted, o_region, len(r_keys)))

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        keys_sorted, key_region, n_regions = _ray.get(lut)
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.minimum(np.searchsorted(keys_sorted, lk),
                         len(keys_sorted) - 1)
        hit = keys_sorted[pos] == lk  # inner-join semantics
        lk, pos = lk[hit], pos[hit]
        rid = key_region[pos]
        ep = batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[hit]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[hit]
        rev_s = np.floor(ep * (1.0 - disc) * 1_000 + 0.5).astype(np.int64)
        # int64 accumulator (np.add.at), never float: the weighted
        # bincount sums fixed-point through float64, exact only < 2^53
        rev = np.zeros(n_regions, dtype=np.int64)
        np.add.at(rev, rid, rev_s)
        cnt = np.bincount(rid, minlength=n_regions).astype(np.int64)
        return pa.table({"rid": pa.array(np.arange(n_regions)),
                         "revenue": pa.array(rev), "cnt": pa.array(cnt)})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    rev = np.zeros(len(r_keys), dtype=np.int64)
    cnt = np.zeros(len(r_keys), dtype=np.int64)
    for r in rows:
        rev[r["rid"]] += r["revenue"]
        cnt[r["rid"]] += r["cnt"]
    m = cnt > 0
    return pa.table({"r_name": pa.array([r_names[i]
                                         for i in np.nonzero(m)[0]]),
                     "revenue": pa.array(rev[m]), "cnt": pa.array(cnt[m])})


def _q_conditional_agg(sf_dir: str):
    """Conditional aggregation (CASE WHEN inside SUM — the TPC-H Q12
    shape): per returnflag, total count, heavy-line count (qty > 25)
    and revenue restricted to discount > 5%. All three predicates are
    evaluated on per-row FIXED-POINT encodings so the branch taken is
    bit-identical across engines; block-local np.add.at partials mean
    ≤ |flags| rows per block reach the tiny groupby."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def part(batch: pa.Table) -> pa.Table:
        qty_s = np.floor(batch["l_quantity"].to_numpy(
            zero_copy_only=False) * 1_000 + 0.5).astype(np.int64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        disc_s6 = np.floor(disc * 1_000_000 + 0.5).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        rev_s = np.floor(ep * (1.0 - disc) * 1_000 + 0.5).astype(np.int64)
        flags = batch["l_returnflag"]
        uniq = pc.unique(flags)
        code = pc.index_in(flags, uniq).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(uniq)
        cnt = np.bincount(code, minlength=n).astype(np.int64)
        heavy = np.zeros(n, dtype=np.int64)
        np.add.at(heavy, code, (qty_s > 25_000).astype(np.int64))
        drev = np.zeros(n, dtype=np.int64)
        np.add.at(drev, code, np.where(disc_s6 > 50_000, rev_s, 0))
        return pa.table({"l_returnflag": uniq, "cnt": pa.array(cnt),
                         "heavy_cnt": pa.array(heavy),
                         "disc_rev_s": pa.array(drev)})

    return (ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("l_returnflag")
            .aggregate(Sum("cnt", alias_name="cnt"),
                       Sum("heavy_cnt", alias_name="heavy_cnt"),
                       Sum("disc_rev_s", alias_name="disc_rev_s")))


def _q_small_quantity_revenue(sf_dir: str):
    """Correlated-subquery shape (TPC-H Q17): revenue of lineitem rows
    whose quantity is below 20% of their PART's average quantity. The
    per-part (count, sum_qty) aggregate rides the packed-cell exchange
    and is broadcast ONCE via ray.put (bounded by |parts|, the
    dimension); the fact scan then filters with a searchsorted lookup —
    no row ever shuffles. The correlated predicate qty < 0.2·avg is
    evaluated as qty_s·5·n < sum_qty_s — pure int64, no division, so
    both engines take identical branches."""
    import ray as _ray
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def extract(batch: pa.Table):
        keys = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        qty_s = np.floor(batch["l_quantity"].to_numpy(
            zero_copy_only=False) * 1_000 + 0.5).astype(np.int64)
        return keys, [np.ones(len(keys), dtype=np.int64), qty_s]

    keys, (n, sq) = grouped_int_sums_exchange(ds, extract, 2)
    order = np.argsort(keys, kind="stable")
    lut = _ray.put((keys[order], n[order], sq[order]))

    def flt(batch: pa.Table) -> pa.Table:
        k_sorted, n_s, sq_s = _ray.get(lut)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(k_sorted, pk)  # every part key is present
        qty_s = np.floor(batch["l_quantity"].to_numpy(
            zero_copy_only=False) * 1_000 + 0.5).astype(np.int64)
        cond = qty_s * 5 * n_s[pos] < sq_s[pos]
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        rev_s = np.floor(ep * 100 + 0.5).astype(np.int64)
        return pa.table({
            "revenue_s": pa.array([int(rev_s[cond].sum())]),
            "n": pa.array([int(cond.sum())])})

    rows = ds.map_batches(flt, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    return pa.table({
        "revenue_s": pa.array([sum(r["revenue_s"] for r in rows)],
                              type=pa.int64()),
        "n": pa.array([sum(r["n"] for r in rows)], type=pa.int64())})


def _q_customer_order_counts(sf_dir: str):
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers. Per-bucket count histograms (finalize inside
    the packed-cell exchange) mean the driver merges ≤ buckets × |count
    values| rows — never |customers|; the zero bucket derives from the
    dimension cardinality (metadata-cheap count on the parquet read).
    Assumes o_custkey ⊆ c_custkey (referential validator's contract)."""
    from bigdime_ray.pipelines.frequency import count_histogram
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    total = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    t = count_histogram(orders, "o_custkey", total_keys=total)
    return t.rename_columns(["order_count", "num_customers"])


def _q_mode_lang_by_source(sf_dir: str):
    """Grouped MODE (most frequent value, ties toward the smallest):
    dominant language per document source. One (source, lang) pair-
    count groupby touches the data; the argmax runs over the pair table
    (bounded by |sources|×|langs|, not rows)."""
    from bigdime_ray.pipelines.frequency import grouped_mode
    ds = _read(sf_dir, "documents", columns=["source", "lang"])
    return grouped_mode(ds, "source", "lang")


def _q_user_first_last_value(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE per user over the explicit (ts,
    event_id) total order — values fixed-point ×10⁴ (exact: selected,
    never summed). Block partials keep ≤2 candidate rows per (block,
    user) so the exchange never moves the input."""
    from bigdime_ray.pipelines.stream import grouped_first_last
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "value"])
    return grouped_first_last(ds, "user_id", "ts", "event_id", "value",
                              scale=10_000)


def _q_users_purchase_no_error(sf_dir: str):
    """Set-difference shape (EXCEPT): users with a high-value purchase
    (value > 90) but NO high-value error event. Per-user presence
    flags ride ONE packed-cell exchange as two 0/1 sums — distinct-
    union-minus semantics with no row shuffle and no second pass. The
    driver holds only the qualifying user ids (the result itself)."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange
    ds = _read(sf_dir, "events", columns=["user_id", "event_type",
                                          "value"])

    def extract(batch: pa.Table):
        keys = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = batch["event_type"]
        hi = batch["value"].to_numpy(zero_copy_only=False) > 90.0
        a = (pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
             & hi).astype(np.int64)
        b = (pc.equal(et, "error").to_numpy(zero_copy_only=False)
             & hi).astype(np.int64)
        return keys, [a, b]

    keys, (a, b) = grouped_int_sums_exchange(ds, extract, 2)
    out = np.sort(keys[(a > 0) & (b == 0)])
    return pa.table({"user_id": pa.array(out, type=pa.int64())})


def _q_funnel_conversion(sf_dir: str):
    """Ordered-event funnel (signup → click → purchase): users whose
    FIRST signup strictly precedes their FIRST click, which strictly
    precedes their FIRST purchase — the sessionless funnel shape every
    product-analytics stack runs. All three per-user MIN(ts) step
    columns ride ONE packed-cell exchange (``ops=["min"]*3``: rows of
    the wrong type contribute the int64-max identity), so the event
    rows never shuffle and the driver sees one cell per (block,
    bucket). Absent steps keep the identity, which fails the strict
    ordering test exactly like SQL's NULL comparisons."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    IDENT = np.iinfo(np.int64).max
    STEPS = ("signup", "click", "purchase")

    def extract(batch: pa.Table):
        keys = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        et = batch["event_type"]
        return keys, [
            np.where(pc.equal(et, t).to_numpy(zero_copy_only=False),
                     ts, IDENT)
            for t in STEPS]

    keys, (s, c, p) = grouped_int_sums_exchange(ds, extract, 3,
                                                ops=["min"] * 3)
    # p < IDENT ⇒ all three present; strict < matches SQL NULL-drop.
    conv = (s < c) & (c < p) & (p < IDENT)
    o = np.argsort(keys[conv])
    return pa.table({
        "user_id": pa.array(keys[conv][o], type=pa.int64()),
        "signup_ts": pa.array(s[conv][o].view("datetime64[us]"),
                              type=pa.timestamp("us")),
        "click_ts": pa.array(c[conv][o].view("datetime64[us]"),
                             type=pa.timestamp("us")),
        "purchase_ts": pa.array(p[conv][o].view("datetime64[us]"),
                                type=pa.timestamp("us"))})


def _q_weighted_avg_price(sf_dir: str):
    """Weighted average (SUM(w·x) / SUM(w)) per group: quantity-
    weighted mean extended price per return flag. Numerator and
    denominator are exact int64 sums (price fixed-point ×100 per row
    BEFORE the multiply); the ratio is one integer floor division on
    the ≤|flags|-row final table, so the result hashes identically to
    the SQL. Block pre-agg → 3-group groupby; nothing row-level moves."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def part(batch: pa.Table) -> pa.Table:
        flags = batch["l_returnflag"]
        uniq = pc.unique(flags)
        code = pc.index_in(flags, uniq).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price_c = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100 + 0.5).astype(np.int64)
        qty = np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False)
                       + 0.5).astype(np.int64)
        n = len(uniq)
        num = np.zeros(n, dtype=np.int64)
        np.add.at(num, code, price_c * qty)
        den = np.zeros(n, dtype=np.int64)
        np.add.at(den, code, qty)
        return pa.table({"l_returnflag": uniq, "num_s": pa.array(num),
                         "den": pa.array(den)})

    agg = (ds.map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("l_returnflag")
           .aggregate(Sum("num_s", alias_name="num_s"),
                      Sum("den", alias_name="den"))
           .to_pandas())
    num = agg["num_s"].to_numpy().astype(np.int64)
    den = agg["den"].to_numpy().astype(np.int64)
    # num·10⁴ can exceed int64 at large SF while DuckDB promotes to
    # HUGEINT — split the division (exact, overflow-free)
    q, r = np.divmod(num, den)
    return pa.table({"l_returnflag": pa.array(agg["l_returnflag"]),
                     "num_s": pa.array(num), "den": pa.array(den),
                     "wavg_micro": pa.array(q * 10_000
                                            + (r * 10_000) // den)})


def _q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (top supplier by revenue): per-supplier revenue
    over a 3-month ship window, then the supplier(s) hitting the
    maximum — the HAVING agg = (SELECT MAX(..)) pattern. The date
    filter is pushed into the parquet read; per-supplier sums ride one
    packed-cell exchange; the max + tie filter runs on the ≤|suppliers|
    result; names come from a driver pull of the tiny supplier table
    (never a row shuffle)."""
    import datetime as _dt
    import pyarrow.dataset as pads
    import ray as _ray
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
                & (pads.field("l_shipdate") < _dt.datetime(1996, 4, 1))))

    def extract(batch: pa.Table):
        keys = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - disc) * 1_000 + 0.5).astype(np.int64)
        return keys, [rev]

    keys, (rev,) = grouped_int_sums_exchange(li, extract, 1)
    if len(keys) == 0:
        return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                         "s_name": pa.array([], type=pa.string()),
                         "total_rev": pa.array([], type=pa.int64())})
    top = rev == rev.max()
    tk, tr = keys[top], rev[top]
    o = np.argsort(tk)
    tk, tr = tk[o], tr[o]
    supp = pa.concat_tables(_ray.get(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        .to_arrow_refs()))
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    pos = so[np.searchsorted(sk[so], tk)]
    names = supp["s_name"].take(pa.array(pos))
    return pa.table({"s_suppkey": pa.array(tk), "s_name": names,
                     "total_rev": pa.array(tr)})


def _q_brand_quantity_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue under a DISJUNCTION of (brand, size,
    quantity) conjunctions spanning both join sides. The 3-column part
    projection is pulled once, key-sorted and `ray.put` broadcast;
    every lineitem batch gathers its part attributes by searchsorted
    and evaluates the whole OR-of-ANDs vectorized — the fact table
    never shuffles and the driver folds one (rev_s, cnt) pair per
    block."""
    import ray as _ray
    from ray.data.aggregate import Sum

    part_t = pa.concat_tables(_ray.get(
        _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
        .to_arrow_refs()))
    pk = part_t["p_partkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    o = np.argsort(pk)
    brand = np.asarray(part_t["p_brand"].to_pylist(), dtype=object)[o]
    lut = _ray.put((pk[o],
                    np.isin(brand, ["Brand#1"]),
                    np.isin(brand, ["Brand#2"]),
                    np.isin(brand, ["Brand#3"]),
                    part_t["p_size"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)[o]))
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def part_fn(batch: pa.Table) -> pa.Table:
        keys, b1, b2, b3, size = _ray.get(lut)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        idx = np.searchsorted(keys, lp).clip(0, len(keys) - 1)
        found = keys[idx] == lp  # membership guard: inner-join semantics
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        hit = found & \
              ((b1[idx] & (size[idx] <= 15) & (qty >= 1) & (qty <= 11))
               | (b2[idx] & (size[idx] <= 25) & (qty >= 10) & (qty <= 20))
               | (b3[idx] & (size[idx] <= 35) & (qty >= 20) & (qty <= 30)))
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - disc) * 1_000 + 0.5).astype(np.int64)
        return pa.table({"rev_s": pa.array([int(rev[hit].sum())]),
                         "cnt": pa.array([int(hit.sum())])})

    agg = (li.map_batches(part_fn, batch_format="pyarrow",
                          zero_copy_batch=True)
           .aggregate(Sum("rev_s", alias_name="rev_s"),
                      Sum("cnt", alias_name="cnt")))
    return pa.table({"rev_s": pa.array([agg["rev_s"]], type=pa.int64()),
                     "cnt": pa.array([agg["cnt"]], type=pa.int64())})


def _q_wealthy_inactive_customers(sf_dir: str):
    """TPC-H Q22 shape: customers with an above-average positive
    balance and NO high-value order, counted per nation. The scalar
    subquery AVG becomes an exact integer cross-multiplication
    (bal_c · n_pos > Σpos_c — no float division anywhere, same trick as
    small_quantity_revenue); the NOT-IN side is a broadcast key set
    built with the price filter pushed into the orders read."""
    import pyarrow.dataset as pads
    import ray as _ray
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_part(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = bal > 0.0
        bal_c = np.floor(bal * 100 + 0.5).astype(np.int64)
        return pa.table({"n": pa.array([int(pos.sum())]),
                         "s": pa.array([int(bal_c[pos].sum())])})

    g = (cust.map_batches(pos_part, batch_format="pyarrow",
                          zero_copy_batch=True)
         .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s")))
    n_pos, sum_pos = int(g["n"]), int(g["s"])

    active = pc.unique(pa.concat_tables(_ray.get(
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"],
            filter=pads.field("o_totalprice") > 300_000.0)
        .to_arrow_refs()))["o_custkey"].combine_chunks())

    def part_fn(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        bal_c = np.floor(bal * 100 + 0.5).astype(np.int64)
        keep = ((bal_c * n_pos > sum_pos)
                & np.invert(pc.is_in(batch["c_custkey"],
                                     value_set=active)
                            .to_numpy(zero_copy_only=False)))
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        uniq, inv = np.unique(nk, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, bal_c[keep])
        return pa.table({"c_nationkey": pa.array(uniq),
                         "numcust": pa.array(np.bincount(
                             inv, minlength=len(uniq)).astype(np.int64)),
                         "totacctbal_s": pa.array(s)})

    return (cust.map_batches(part_fn, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("c_nationkey")
            .aggregate(Sum("numcust", alias_name="numcust"),
                       Sum("totacctbal_s", alias_name="totacctbal_s")))


def _q_props_value_by_type(sf_dir: str):
    """Semi-structured extraction: parse the integer field out of the
    JSON-ish ``props`` string with one vectorized RE2 pass per block
    (never per-row json.loads), then aggregate per event type — sum,
    present-count (non-null extraction) and row count."""
    from ray.data.aggregate import Sum
    from bigdime_ray.pipelines.text import extract_int_field
    ds = _read(sf_dir, "events", columns=["event_type", "props"])
    ext = extract_int_field(ds, "props", r'"k":\s*(?P<v>-?\d+)')

    def part(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        uniq = pc.unique(et)
        code = pc.index_in(et, uniq).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = batch["val"]
        valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
        vf = pc.fill_null(v, 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(uniq)
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, code, vf)
        npres = np.zeros(n, dtype=np.int64)
        np.add.at(npres, code, valid.astype(np.int64))
        cnt = np.bincount(code, minlength=n).astype(np.int64)
        return pa.table({"event_type": uniq, "s": pa.array(s),
                         "n_present": pa.array(npres),
                         "cnt": pa.array(cnt)})

    return (ext.map_batches(part, batch_format="pyarrow",
                            zero_copy_batch=True)
            .groupby("event_type")
            .aggregate(Sum("s", alias_name="s"),
                       Sum("n_present", alias_name="n_present"),
                       Sum("cnt", alias_name="cnt")))


def _q_user_value_pivot(sf_dir: str):
    """Wide per-user feature table: SUM(value) pivoted by event type
    (the value-weighted pivot sibling of event_type_pivot); per-row
    fixed-point ×10⁴ before any addition."""
    from bigdime_ray.pipelines.frequency import pivot_sums
    ds = _read(sf_dir, "events", columns=["user_id", "event_type",
                                          "value"])
    return pivot_sums(ds, "user_id", "event_type", "value",
                      values=["click", "view", "purchase", "signup",
                              "error"], scale=10_000)


def _q_totalprice_histogram(sf_dir: str):
    """Equi-width histogram (width_bucket shape): order counts in
    20 000-wide totalprice bins. Block-local np.unique partials mean
    ≤ bins rows per block reach the tiny groupby."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.floor(tp / 20_000.0).astype(np.int64)
        uniq, counts = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq),
                         "n": pa.array(counts.astype(np.int64))})

    return (ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").aggregate(Sum("n", alias_name="n")))


def _q_orders_page(sf_dir: str):
    """Deterministic pagination (ORDER BY … LIMIT 20 OFFSET 40): each
    block keeps only its own top-(offset+limit) candidates by
    (price_s DESC, orderkey), so the driver merges ≤ blocks × 60 rows
    and slices the page — never a global sort. The sort key is the
    FIXED-POINT price (ties under cent-rounding would otherwise order
    differently across engines)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    off, lim = 40, 20

    def part(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        ps = np.floor(tp * 100 + 0.5).astype(np.int64)
        sel = np.lexsort((ok, -ps))[:off + lim]
        return pa.table({"o_orderkey": pa.array(ok[sel]),
                         "price_s": pa.array(ps[sel])})

    rows = ds.map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    ok = np.array([r["o_orderkey"] for r in rows], dtype=np.int64)
    ps = np.array([r["price_s"] for r in rows], dtype=np.int64)
    sel = np.lexsort((ok, -ps))[off:off + lim]
    return pa.table({"o_orderkey": pa.array(ok[sel]),
                     "price_s": pa.array(ps[sel])})


def _q_order_price_mad(sf_dir: str):
    """Exact grouped median absolute deviation of the order price —
    robust per-group dispersion. mad4 = 4·MAD is an exact int64 (two
    interpolated medians each carry denominator 2; ×4 clears both), so
    the statistic hash-matches DuckDB's interpolated ``mad``."""
    from bigdime_ray.pipelines.frequency import grouped_mad
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderpriority": batch["o_orderpriority"],
                         "cents": _scaled_i64(v, 100)})

    return grouped_mad(ds.map_batches(prep, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       "o_orderpriority", "cents")


def _q_order_price_quantiles_disc(sf_dir: str):
    """PERCENTILE_DISC quartiles per priority — the order statistic at
    ceil(q·n)−1, no interpolation, so the fixed-point int64 input
    passes through untouched (no ×4 scaling trick needed, unlike the
    quantile_cont sibling ``order_price_quantiles``)."""
    from bigdime_ray.pipelines.frequency import grouped_quantiles
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderpriority": batch["o_orderpriority"],
                         "cents": _scaled_i64(v, 100)})

    return grouped_quantiles(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        "o_orderpriority", "cents", [0.25, 0.5, 0.75], method="disc")


def _q_order_cube(sf_dir: str):
    """GROUP BY CUBE(priority, status): count + revenue at all four
    grouping sets — one Ray groupby at the finest grain, the three
    coarser sets derived from that tiny result
    (pipelines/frequency.py::cube_aggregate)."""
    from bigdime_ray.pipelines.frequency import cube_aggregate
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus",
                        "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderpriority": batch["o_orderpriority"],
                         "o_orderstatus": batch["o_orderstatus"],
                         "cents": _scaled_i64(v, 100)})

    return cube_aggregate(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["o_orderpriority", "o_orderstatus"], "cents")


def _q_users_purchase_and_error(sf_dir: str):
    """Set-intersection shape (INTERSECT): users with BOTH a high-value
    purchase and a high-value error. Identical one-packed-exchange
    machinery as the EXCEPT sibling ``users_purchase_no_error`` — only
    the final flag predicate differs (both > 0)."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange
    ds = _read(sf_dir, "events", columns=["user_id", "event_type",
                                          "value"])

    def extract(batch: pa.Table):
        keys = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = batch["event_type"]
        hi = batch["value"].to_numpy(zero_copy_only=False) > 90.0
        a = (pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
             & hi).astype(np.int64)
        b = (pc.equal(et, "error").to_numpy(zero_copy_only=False)
             & hi).astype(np.int64)
        return keys, [a, b]

    keys, (a, b) = grouped_int_sums_exchange(ds, extract, 2)
    out = np.sort(keys[(a > 0) & (b > 0)])
    return pa.table({"user_id": pa.array(out, type=pa.int64())})


def _q_customers_without_orders_ll(sf_dir: str):
    """The LARGE-LARGE anti-join strategy for the same question as
    ``customers_without_orders``: Ray-native ``left_anti`` hash join
    against the key-projected orders side (8 B/row through the
    exchange), for when the orders key set no longer fits a broadcast.
    Same oracle SQL as the broadcast variant — the two strategies must
    agree row-for-row."""
    from bigdime_ray.pipelines.join import key_anti_join
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    out = key_anti_join(cust, orders, "c_custkey", "o_custkey")
    return _collect(out, pa.schema([("c_custkey", pa.int64())]))


def _q_events_lag_lead(sf_dir: str):
    """LAG + LEAD of the event value over (PARTITION BY user ORDER BY
    ts, event_id) in one bucketed kernel pass — previous/next-action
    features; -1 encodes the missing neighbor so both columns stay
    null-free int64 (SQL LAG(v, 1, -1))."""
    from bigdime_ray.pipelines.stream import grouped_lag_lead
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])
    out = grouped_lag_lead(ds, "user_id", "ts", "event_id", "value",
                           default=-1, scale=10_000)
    return out.map_batches(
        lambda b: b.select(["user_id", "event_id", "lag_v", "lead_v"]),
        batch_format="pyarrow")


def _q_embedding_dim_sums(sf_dir: str):
    """UNNEST WITH ORDINALITY shape: explode the list<float> embedding
    column into (ordinal, value) rows (pipelines/nested.py — pure map,
    zero shuffle), then per-dimension count + fixed-point sum via block
    partials — ≤ dim rows per block reach the tiny groupby. float32 →
    float64 is exact, so both engines scale the identical double."""
    from ray.data.aggregate import Sum
    from bigdime_ray.pipelines.nested import unnest_column
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    ex = unnest_column(ds, "embedding", value_col="val",
                       ordinal_col="dim")

    def part(batch: pa.Table) -> pa.Table:
        d = batch["dim"].to_numpy(zero_copy_only=False)
        v = batch["val"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        vs = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
        ndim = int(d.max()) + 1 if len(d) else 0
        n = np.bincount(d, minlength=ndim).astype(np.int64)
        s = np.zeros(ndim, dtype=np.int64)
        np.add.at(s, d, vs)
        return pa.table({"dim": pa.array(np.arange(ndim)),
                         "n": pa.array(n), "s": pa.array(s)})

    return (ex.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("dim").aggregate(Sum("n", alias_name="n"),
                                      Sum("s", alias_name="s")))


def _q_event_dow_chi2(sf_dir: str):
    """χ² INDEPENDENCE test on the event_type × day-of-week
    contingency table — the drift/statistics shape as a query. Counts
    come from block crosstab partials (≤ types×dows rows per block);
    the statistic is computed on the ≤35-cell table: every per-cell
    term (o−e)²/e is the SAME double in both engines (o, row/col
    totals and n are exact ints; e = r·c/n one double division), fixed-
    pointed ×10⁶ PER CELL, then integer-summed — order-independent.
    Absent cells still contribute e (o=0 → term = e)."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def part(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        uniq = pc.unique(et)
        code = pc.index_in(et, uniq).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ti = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        dow = ((ti // 86_400_000_000) + 4) % 7
        n_et = len(uniq)
        m = np.zeros((n_et, 7), dtype=np.int64)
        np.add.at(m, (code, dow), 1)
        nz = np.nonzero(m)
        return pa.table({
            "et": uniq.take(pa.array(nz[0])),
            "dow": pa.array(nz[1].astype(np.int64)),
            "o": pa.array(m[nz])})

    cells = (ds.map_batches(part, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["et", "dow"]).aggregate(Sum("o", alias_name="o"))
             .to_pandas())
    ets = sorted(cells["et"].unique())
    dows = sorted(cells["dow"].unique())
    full = np.zeros((len(ets), len(dows)), dtype=np.int64)
    ei = {e: i for i, e in enumerate(ets)}
    di = {d: i for i, d in enumerate(dows)}
    for _, r in cells.iterrows():
        full[ei[r["et"]], di[r["dow"]]] = int(r["o"])
    rt = full.sum(axis=1)
    ct = full.sum(axis=0)
    n = int(full.sum())
    e = (rt[:, None] * ct[None, :]) / float(n)
    term = np.floor((full - e) ** 2 / e * 1_000_000 + 0.5) \
        .astype(np.int64)
    dof = (len(ets) - 1) * (len(dows) - 1)
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "dof": pa.array([dof], type=pa.int64()),
                     "chi2_micro": pa.array([int(term.sum())],
                                            type=pa.int64())})


def _q_session_funnel(sf_dir: str):
    """Sessionized funnel: (user, session) pairs whose first signup
    strictly precedes their first purchase WITHIN the same 30-min-gap
    session (pipelines/stream.py::sessionized_funnel — session
    segmentation + masked min-per-step reduceat in one kernel pass)."""
    from bigdime_ray.pipelines.stream import sessionized_funnel
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return sessionized_funnel(ds, "user_id", "ts", "event_type",
                              steps=["signup", "purchase"],
                              gap_seconds=1800)


def _q_user_time_weighted_value(sf_dir: str):
    """Time-weighted average value per user (TWAP shape): each event's
    value is held until the user's next event; Σ value·Δt is an exact
    int64 (fixed-point value × µs gap per row), the average one integer
    floor division (pipelines/stream.py::time_weighted_sum)."""
    from bigdime_ray.pipelines.stream import time_weighted_sum
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "value"])
    return time_weighted_sum(ds, "user_id", "ts", "event_id", "value",
                             scale=10_000)


def _q_approx_distinct_users(sf_dir: str):
    """Grouped HyperLogLog (rows-only: approximate by design; accuracy
    + partition invariance pinned in pytest): approx distinct users
    per event type at a FIXED 256 B per group — the 10¹²-scale sibling
    of the exact `distinct_users_by_type`
    (pipelines/frequency.py::grouped_approx_distinct)."""
    from bigdime_ray.pipelines.frequency import grouped_approx_distinct
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_approx_distinct(ds, "event_type", "user_id", p=8)


def _q_user_event_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity feature. Float determinism discipline: every
    per-(user, type) term c·ln(c) is fixed-pointed ×10⁶ PER TERM (same
    ln precedent as doc_tfidf — both engines evaluate the identical
    double), so the per-user sum is an order-independent INTEGER sum;
    the final H = (ln(n)·10⁶·n − Σ) // n is pure int64 arithmetic.
    Counts ride the pivot_counts exchange (block crosstab partials);
    the entropy map runs distributed on the ≤|users|-row wide table."""
    from bigdime_ray.pipelines.frequency import pivot_counts
    TYPES = ["click", "view", "purchase", "signup", "error"]
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    wide = pivot_counts(ds, "user_id", "event_type", TYPES)

    def ent(batch: pa.Table) -> pa.Table:
        c = np.stack([batch[f"n_{t}"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) for t in TYPES], axis=1)
        n = c.sum(axis=1)
        with np.errstate(divide="ignore"):
            term = np.floor(np.where(c > 0, c * np.log(c), 0.0)
                            * 1_000_000 + 0.5).astype(np.int64)
        s = term.sum(axis=1)
        ln_n = np.floor(np.log(n) * 1_000_000 + 0.5).astype(np.int64)
        return pa.table({"user_id": batch["user_id"],
                         "n": pa.array(n), "s_clogc": pa.array(s),
                         "entropy_micro": pa.array((ln_n * n - s) // n)})

    return wide.map_batches(ent, batch_format="pyarrow",
                            zero_copy_batch=True)


def _q_pq_topk(sf_dir: str):
    """Product-quantization ANN (rows-only: approximate by design;
    recall pinned in pytest): codebooks trained on a driver sample,
    DISTRIBUTED encode to m=8 uint8 codes per vector (32× smaller than
    float32), ADC top-10 via per-batch byte-gather against one m×k
    lookup table (pipelines/similarity.py::{pq_train,pq_encode,
    pq_search}). The memory-scale path for 10¹²-vector ANN."""
    import ray as _ray
    from bigdime_ray.pipelines.similarity import (_to_matrix, pq_encode,
                                                  pq_search, pq_train)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = _to_matrix(
        pa.table(ds.limit(2000).take_batch(2000,
                                           batch_format="pyarrow"))
        ["embedding"], 64)
    books = pq_train(sample, m=8, bits=8, iters=6)
    codes = pq_encode(ds, books)
    q = sample[0]
    out = pq_search(codes, books, q, topk=10)
    return pa.table({
        "vec_id": pc.cast(out["vec_id"], pa.int64()),
        "adc_micro": pa.array(np.floor(
            out["adc"].to_numpy(zero_copy_only=False) * 1_000_000
            + 0.5).astype(np.int64))})


def _q_pq_ivf_topk(sf_dir: str):
    """IVF×PQ hybrid serving layout (rows-only: doubly approximate —
    probe recall × quantization, both pinned in pytest): build a
    cluster-partitioned CODE index under /tmp, search reading ONLY the
    probed partitions' m-byte codes
    (pipelines/similarity.py::{build_pq_ivf_index, pq_ivf_search})."""
    import tempfile
    from bigdime_ray.pipelines.similarity import (_to_matrix,
                                                  build_pq_ivf_index,
                                                  pq_ivf_search)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _to_matrix(
        pa.table(ds.limit(1).take_batch(1, batch_format="pyarrow"))
        ["embedding"], 64)[0]
    with tempfile.TemporaryDirectory(prefix="pqivf_") as d:
        build_pq_ivf_index(ds, d, nlist=8, m=8, bits=8,
                           sample_size=4000)
        out = pq_ivf_search(d, q, k=10, nprobe=3)
    return pa.table({
        "vec_id": pc.cast(out["vec_id"], pa.int64()),
        "adc_micro": pa.array(np.floor(
            out["adc"].to_numpy(zero_copy_only=False) * 1_000_000
            + 0.5).astype(np.int64))})


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means over the embedding table (rows-only:
    iterative, no SQL oracle — pytest pins bit-exact equality with a
    single-process reference and partition invariance). Returns one
    row per cluster: count + fixed-point centroid preview (first 4
    dims) — deterministic across runs."""
    from bigdime_ray.pipelines.similarity import kmeans_distributed
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    cent, n = kmeans_distributed(ds, k=8, iters=4, dim=64)
    cf = np.floor(cent * 1_000_000 + 0.5).astype(np.int64)
    return pa.table({
        "cluster": pa.array(np.arange(len(n), dtype=np.int64)),
        "n": pa.array(n),
        **{f"c{j}_micro": pa.array(cf[:, j]) for j in range(4)}})


def _q_nation_trade_flows(sf_dir: str):
    """TPC-H Q7 shape: revenue BETWEEN nation pairs (supplier nation ≠
    customer nation) for one order year — one large-large join
    (lineitem ⋈ orders, year filter pushed into the read) plus two
    broadcast LUT stages; the pair key packs both nation keys into one
    int64 so the final aggregate is a packed exchange over ≤ 25² keys."""
    import datetime as _dt
    import pyarrow.dataset as pads
    from bigdime_ray.pipelines.join import broadcast_join
    from bigdime_ray.stages.shuffle import (drop_empty_blocks,
                                            grouped_int_sums_exchange)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_suppkey": batch["l_suppkey"],
                         "rev_s": _scaled_i64(ep * (1.0 - disc), 1_000)})

    li = li.map_batches(revenue, batch_format="pyarrow",
                        zero_copy_batch=True)
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=((pads.field("o_orderdate") >= _dt.datetime(1997, 1, 1))
                & (pads.field("o_orderdate")
                   < _dt.datetime(1998, 1, 1))))
    joined = li.join(orders, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = drop_empty_blocks(joined).materialize()
    j1 = broadcast_join(joined, supp, "l_suppkey", "s_suppkey")
    j2 = broadcast_join(j1, cust, "o_custkey", "c_custkey")

    def extract(batch: pa.Table):
        sn = batch["s_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rev = batch["rev_s"].to_numpy(zero_copy_only=False)
        m = sn != cn
        return (sn[m] * 1_000 + cn[m]), [rev[m]]

    keys, (rev,) = grouped_int_sums_exchange(j2, extract, 1,
                                             num_buckets=1)
    o = np.argsort(keys)
    keys, rev = keys[o], rev[o]
    return pa.table({
        "supp_nation": pa.array(keys // 1_000),
        "cust_nation": pa.array(keys % 1_000),
        "revenue": pa.array(rev)})


def _q_embedding_gram(sf_dir: str):
    """Exact Gram matrix Σ xxᵀ over the embedding table (the PCA /
    covariance input): int64 fixed-point matmul per block, ≤ 2 080
    upper-triangle rows per block to the groupby
    (pipelines/similarity.py::embedding_gram)."""
    from bigdime_ray.pipelines.similarity import embedding_gram
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    return embedding_gram(ds, dim=64)


def _q_embedding_cov_fixed(sf_dir: str):
    """Exact covariance NUMERATOR n·Gram − s·sᵀ from the distributed
    PCA fit (pipelines/similarity.py::pca_fit): the one-pass packed
    partial (upper-triangle Gram + per-dim sums + count) merged in
    arbitrary-precision Python ints — the integer-exact statistic the
    float eigendecomposition then consumes. The oracle recomputes the
    same integers relationally (HUGEINT), so the whole distributed part
    of PCA sits under the hash-exact bar; only the driver-side dim×dim
    eigh is float (pinned by tests against numpy)."""
    from bigdime_ray.pipelines.similarity import pca_fit

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    fit = pca_fit(ds, dim=64, n_components=8)
    iu = np.triu_indices(64)
    return pa.table({
        "dim_a": pa.array(iu[0].astype(np.int64)),
        "dim_b": pa.array(iu[1].astype(np.int64)),
        "cov_num": pa.array([int(fit["cov_num"][a, b])
                             for a, b in zip(iu[0], iu[1])],
                            type=pa.int64()),
    })


def _q_label_centroid_dots(sf_dir: str):
    """Pairwise label-centroid DOT PRODUCTS over the embedding table —
    cluster-separation analytics. Exact integers end to end: per-label
    per-dim fixed-point sums from the group_centroids exchange, then
    dot_s(a,b) = Σ_d s_a·s_b on the ≤|labels|²/2 driver table (the
    centroid dot is s_a·s_b/(n_a·n_b·scale²) — numerators and counts
    are returned, never the float division)."""
    from bigdime_ray.pipelines.similarity import group_centroids
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    cent = group_centroids(ds, "label", "embedding", dim=64)
    labels = cent["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = cent["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    S = np.stack([cent[f"s_{j}"].to_numpy(zero_copy_only=False)
                  .astype(np.int64) for j in range(64)], axis=1)
    la, lb, dots, na, nb = [], [], [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            la.append(labels[i])
            lb.append(labels[j])
            na.append(n[i])
            nb.append(n[j])
            dots.append(int((S[i] * S[j]).sum()))
    return pa.table({"label_a": pa.array(la, type=pa.int64()),
                     "label_b": pa.array(lb, type=pa.int64()),
                     "n_a": pa.array(na, type=pa.int64()),
                     "n_b": pa.array(nb, type=pa.int64()),
                     "dot_s": pa.array(dots, type=pa.int64())})


def _q_lineitem_metrics_long(sf_dir: str):
    """UNPIVOT / melt shape: the three lineitem measures reshaped to
    one (orderkey, linenumber, metric, value) row each — wide → long,
    pure map, zero shuffle (pipelines/nested.py::unpivot). Values
    fixed-point ×100 into ONE int64 column before the melt (unpivot
    requires a single value type — exactly the oracle discipline)."""
    from bigdime_ray.pipelines.nested import unpivot
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_linenumber": pc.cast(batch["l_linenumber"], pa.int64()),
            "quantity": _scaled_i64(
                batch["l_quantity"].to_numpy(zero_copy_only=False),
                100),
            "extendedprice": _scaled_i64(
                batch["l_extendedprice"]
                .to_numpy(zero_copy_only=False), 100),
            "discount": _scaled_i64(
                batch["l_discount"].to_numpy(zero_copy_only=False),
                100)})

    wide = ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
    return unpivot(wide, ["l_orderkey", "l_linenumber"],
                   ["quantity", "extendedprice", "discount"],
                   var_col="metric", value_col="value_c")


def _q_ops_maintenance_cycle(sf_dir: str):
    """Operational lifecycle through the driver surface (rows-only,
    deterministic): synthesize a token table → INGEST with a
    quarantining cleanse transform (poison rows bisected into the
    quarantine side output, manifest counts exclude them) → COMPACT
    the small files with Z-ORDER clustering → FOOTER-ONLY recount.
    One summary row per stage metric — the accreting-dataset chores
    (pipelines/ingest.py, stages/{quarantine,layout}.py,
    sources/tables.py::metadata_row_counts)."""
    import tempfile
    import ray.data as rd
    from bigdime_ray.pipelines.ingest import compact_parquet, ingest
    from bigdime_ray.sources.tables import metadata_row_counts
    from bigdime_ray.synth import SynthConfig, gen_partition

    t = gen_partition(SynthConfig(seed=33), 0, 3000)
    ds = rd.from_arrow(t).repartition(6)

    def cleanse(batch: pa.Table) -> pa.Table:
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False)
        if (n_tok % 101 == 0).any():
            raise ValueError("cursed length")
        return batch

    with tempfile.TemporaryDirectory(prefix="opscycle_") as d:
        man = ingest(ds, os.path.join(d, "ing"), num_partitions=4,
                     transform=cleanse, quarantine=True)
        quarantined = man.get("__quarantined__",
                              {"expected_rows": 0})["expected_rows"]
        healthy = sum(v["expected_rows"] for k, v in man.items()
                      if k != "__quarantined__")
        rep = compact_parquet(os.path.join(d, "ing", "data"),
                              os.path.join(d, "compact"),
                              target_rows_per_file=10_000,
                              zorder_by=["n_tok"])
        counted = int(sum(metadata_row_counts(
            os.path.join(d, "compact"))["rows"].to_pylist()))
    return pa.table({
        "stage": pa.array(["ingested_rows", "quarantined_rows",
                           "files_in", "files_out",
                           "footer_recount"], type=pa.string()),
        "value": pa.array([healthy, quarantined, rep["files_in"],
                           rep["files_out"], counted],
                          type=pa.int64())})


def _q_bpe_merges(sf_dir: str):
    """Distributed byte-level BPE training over the documents corpus
    (rows-only: iterative, no SQL oracle — pytest pins exact equality
    with a sequential reference incl. tie-breaks and overlapping-run
    semantics). Returns the learned merge table in merge order
    (pipelines/tokenize.py::bpe_train)."""
    from bigdime_ray.pipelines.tokenize import bpe_train
    ds = _read(sf_dir, "documents", columns=["text"])
    merges = bpe_train(ds, num_merges=40)
    return pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
        "left": pa.array([m[0] for m in merges], type=pa.int64()),
        "right": pa.array([m[1] for m in merges], type=pa.int64()),
        "new_id": pa.array([m[2] for m in merges], type=pa.int64())})


def _q_bpe_encoded_lengths(sf_dir: str):
    """Distributed BPE ENCODE with a trained merge table (rows-only:
    iterative training + greedy merge application, no SQL oracle):
    train 40 merges on the documents corpus, then tokenize every
    document in one streaming map with the merge list broadcast once
    (pipelines/tokenize.py::bpe_encode — the same vectorized kernel
    the trainer rewrites with, so encode ≡ train by construction).
    Returns per-doc byte length, token length, and the corpus
    compression the merges bought — deterministic."""
    import pyarrow.compute as pc

    from bigdime_ray.pipelines.tokenize import bpe_encode, bpe_train
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges = bpe_train(_read(sf_dir, "documents", columns=["text"]),
                       num_merges=40)
    out = bpe_encode(ds, merges)

    def lengths(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "n_bytes": pc.cast(pc.binary_length(
                pc.cast(b["text"], pa.binary())), pa.int64()),
            "n_tokens": pc.cast(pc.list_value_length(b["tokens"]),
                                pa.int64())})

    df = out.map_batches(lengths, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _q_doc_lm_scores(sf_dir: str):
    """Corpus-bigram language-model score per document (KenLM-style
    quality filter): logprob = Σ ln P(w_i | w_{i-1}) from the corpus's
    own bigram counts — per-TERM fixed-point ln (tf_idf precedent) so
    the per-doc integer sums hash identically
    (pipelines/text.py::bigram_lm_scores)."""
    from bigdime_ray.pipelines.text import bigram_lm_scores
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bigram_lm_scores(ds)


def _q_vocabulary_jaccard(sf_dir: str):
    """Set-similarity join between sources' vocabularies: exact
    distinct-word Jaccard per source pair — shuffle carries only the
    vocabulary-bounded (source, word) pairs, the pairwise intersection
    runs on the driver's exact string sets
    (pipelines/text.py::vocabulary_jaccard)."""
    from bigdime_ray.pipelines.text import vocabulary_jaccard
    ds = _read(sf_dir, "documents", columns=["source", "text"])
    return vocabulary_jaccard(ds)


def _q_word_bigrams(sf_dir: str):
    """Corpus word-bigram counts (n-gram LM / boilerplate shape):
    bigrams never cross documents; per-block Arrow group_by partials,
    global (w1, w2, cnt) groupby-sum, min_count prunes the long tail
    after the exact sum (pipelines/text.py::word_bigram_counts)."""
    from bigdime_ray.pipelines.text import word_bigram_counts
    ds = _read(sf_dir, "documents", columns=["text"])
    return word_bigram_counts(ds, min_count=3)


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3/PaLM n-gram overlap rule): a
    deterministic 2% hash-selected slice of documents plays the EVAL
    benchmark; every TRAIN doc reports how many of its word trigrams
    appear anywhere in it. Eval n-gram hashes are broadcast once
    (``ray.put``); the train side is a zero-shuffle searchsorted
    membership probe (pipelines/text.py::ngram_decontaminate)."""
    from bigdime_ray.pipelines.text import ngram_decontaminate

    def side(want_eval: bool):
        def split(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sel = (ids * _CHK_MUL) % _CHK_MOD % 1000 < 20
            return b.filter(pa.array(sel if want_eval else ~sel))
        return _read(sf_dir, "documents",
                     columns=["doc_id", "text"]).map_batches(
            split, batch_format="pyarrow", zero_copy_batch=True)

    return ngram_decontaminate(side(False), side(True), n=3)


def _q_token_decontaminate(sf_dir: str):
    """Token-LEVEL decontamination over the north-star input shape
    (rows-only; text-level sibling `decontaminate_trigram` carries the
    SQL oracle): deterministic synthetic tokenized sequences, an eval
    partition, and PLANTED 8-token overlaps — eval window hashes
    broadcast once, train side a zero-shuffle vectorized rolling-window
    membership probe (pipelines/curate.py::token_ngram_decontaminate).
    Returns only the contaminated rows plus totals, deterministic."""
    import ray.data as rd
    from bigdime_ray.pipelines.curate import token_ngram_decontaminate
    from bigdime_ray.synth import SynthConfig, gen_partition
    cfg = SynthConfig(seed=19)
    train = gen_partition(cfg, 0, 3000)
    evals = gen_partition(cfg, 1, 300)
    # plant: splice an 8-token eval window into two train rows
    ev_tokens = evals["tokens"][0].as_py()
    window = ev_tokens[:8]
    t = train.to_pydict()
    for row in (10, 500):
        seq = t["tokens"][row]
        t["tokens"][row] = seq[:2] + window + seq[10:]
    train = pa.table({"doc_id": pa.array(t["doc_id"], type=pa.string()),
                      "tokens": pa.array(t["tokens"],
                                         type=pa.list_(pa.int32()))})
    out = token_ngram_decontaminate(
        rd.from_arrow(train).repartition(4),
        rd.from_arrow(evals.select(["doc_id", "tokens"])), n=8)
    df = out.to_pandas()
    hit = df[df.n_hits > 0].sort_values("doc_id").reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(hit.doc_id, type=pa.string()),
        "n_windows": pa.array(hit.n_windows, type=pa.int64()),
        "n_hits": pa.array(hit.n_hits, type=pa.int64())})


def _q_doc_keyword_classifier(sf_dir: str):
    """Distributed fastText-style linear classifier (rows-only; model
    training/scoring is not SQL-expressible): hashed char-4-gram bag
    features + full-batch logistic regression over documents.text,
    recovering a deterministic weak label (>= 2 'vector' occurrences —
    a balanced, text-derived stand-in for human labels; the synthetic
    table's lang/source columns are uncorrelated with text by
    construction). Training is exactly partition-invariant
    (per-occurrence fixed-point int64 gradient partials, weights
    broadcast per iteration via ray.put — pipelines/classify.py), so
    the output is deterministic across runs and block counts. Scale
    note: train on a BOUNDED sample, stream inference over the corpus;
    the 500-row documents table is both here."""
    import pyarrow.compute as pc

    from bigdime_ray.pipelines.classify import (extract_features,
                                                score_logreg,
                                                train_logreg)
    dim = 1 << 16

    def label(b: pa.Table) -> pa.Table:
        n = pc.count_substring(b["text"], "vector")
        return b.append_column(
            "label", pc.cast(pc.greater_equal(n, 2), pa.int8()))

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text"]).map_batches(
        label, batch_format="pyarrow", zero_copy_batch=True)
    feats = extract_features(ds, dim=dim)
    w = train_logreg(feats, dim=dim, iters=40, lr=5.0)
    scored = score_logreg(ds, w, dim=dim).to_pandas()
    scored["pred"] = (scored["prob"] > 0.5).astype(np.int8)
    scored["prob"] = scored["prob"].round(6)
    out = scored[["doc_id", "label", "pred", "prob"]] \
        .sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _q_doc_repetition(sf_dir: str):
    """Per-document trigram repetition score (Gopher-style quality
    rule) — exact string-distinct per doc, zero shuffle, rep_ppm as
    integer floor division (pipelines/text.py::repetition_scores)."""
    from bigdime_ray.pipelines.text import repetition_scores
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return repetition_scores(ds, n=3)


def _q_fuzzy_doc_pairs(sf_dir: str):
    """Edit-distance near-dup pairs (blocked fuzzy join): document
    pairs within the same source at Levenshtein distance ≤ 20 — exact,
    via the capped vectorized-row DP kernel over length-window
    candidates (pipelines/dedup.py::edit_distance_pairs). The ONLY
    near-dup method here with a DuckDB-expressible oracle
    (levenshtein), so it anchors the whole fuzzy family's correctness."""
    from bigdime_ray.pipelines.dedup import edit_distance_pairs
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    pairs = edit_distance_pairs(ds, id_col="doc_id", text_col="text",
                                block_col="source", max_dist=20)

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.field("dist") >= 0)
        return b.select(["id_a", "id_b", "dist"])

    out = pairs.map_batches(proj, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _collect(out, pa.schema([("id_a", pa.int64()),
                                    ("id_b", pa.int64()),
                                    ("dist", pa.int64())]))


def _q_embedding_norms_by_label(sf_dir: str):
    """Per-row LIST REDUCTION (squared L2 norm of the embedding) rolled
    up per label — the row-level sibling of embedding_dim_sums. Each
    block flattens the list column zero-copy, fixed-points every
    element (float32→float64 is exact, so both engines square the same
    integer), segment-sums per row, and scatters into per-label
    partials; ≤ |labels| rows per block reach the groupby. Squared
    norm, not norm: sqrt is irrational so only the square hashes
    identically across engines."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def part(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        el = np.floor(flat * 10_000 + 0.5).astype(np.int64)
        sq = el * el
        lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offs = np.r_[0, np.cumsum(lens)]
        # reduceat only over non-empty rows (empty segments corrupt the
        # preceding one); empty lists contribute 0
        row_sq = np.zeros(len(lens), dtype=np.int64)
        nz = lens > 0
        if nz.any():
            row_sq[nz] = np.add.reduceat(sq, offs[:-1][nz])
        lab = batch["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, row_sq)
        return pa.table({"label": pa.array(uniq),
                         "sq_s": pa.array(s),
                         "cnt": pa.array(np.bincount(
                             inv, minlength=len(uniq)).astype(np.int64))})

    return (ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("label").aggregate(Sum("sq_s", alias_name="sq_s"),
                                        Sum("cnt", alias_name="cnt")))


def _q_order_snapshot_diff(sf_dir: str):
    """CDC audit between two deterministic snapshot views of orders
    (old: keys %10≠0; new: keys %10≠1 with %7==0 prices bumped):
    added / removed / changed / same per key through ONE packed-cell
    exchange of exact integers (pipelines/diff.py::snapshot_diff —
    value sums, not hashes, so no collision can hide a change)."""
    from bigdime_ray.pipelines.diff import snapshot_diff
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(bump: bool):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
            vs = np.floor(v * 100 + 0.5).astype(np.int64)
            if bump:
                keep = k % 10 != 1
                k, vs = k[keep], vs[keep]
                vs = vs + np.where(k % 7 == 0, 1000, 0)
            else:
                keep = k % 10 != 0
                k, vs = k[keep], vs[keep]
            return pa.table({"o_orderkey": pa.array(k),
                             "cents": pa.array(vs)})
        return fn

    old = ds.map_batches(prep(False), batch_format="pyarrow",
                         zero_copy_batch=True)
    new = ds.map_batches(prep(True), batch_format="pyarrow",
                         zero_copy_batch=True)
    return snapshot_diff(old, new, "o_orderkey", "cents")


def _q_orders_price_ranked(sf_dir: str):
    """GLOBAL ORDER BY via Ray's distributed range-partitioned sort
    (``Dataset.sort`` — the one wide primitive no other query needed):
    every order ranked by fixed-point price DESC with key ASC
    tie-break. After the sort, block order IS global order, so the
    driver enumerates positions while collecting in order — the pos
    column is what lets the hash oracle verify the ORDER, not just the
    content (the driver compare is row-order-insensitive). Top-k/
    pagination shapes use the cheaper per-block prune (orders_page);
    this is the full-table sorted-export path (sorted runs for
    binary-searchable layouts)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "cents": _scaled_i64(
                batch["o_totalprice"].to_numpy(zero_copy_only=False),
                100)})

    s = (ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)
         .sort(["cents", "o_orderkey"], descending=[True, False]))
    t = _collect(s, pa.schema([("o_orderkey", pa.int64()),
                               ("cents", pa.int64())]))
    return pa.table({
        "pos": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)),
        "o_orderkey": t["o_orderkey"], "cents": t["cents"]})


def _q_order_upsert_apply(sf_dir: str):
    """MERGE / upsert apply (the CDC-apply dual of order_snapshot_diff):
    a change feed (bumped prices for keys %7==0, deletes for keys
    %9==0 — delete wins on overlap so keys stay unique) applied to the
    old snapshot via pipelines/diff.py::upsert_snapshot — ONE anti-join
    exchange (changes side projected to keys) plus a streaming union;
    no side ever materializes."""
    from bigdime_ray.pipelines.diff import upsert_snapshot
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep_old(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vs = np.floor(batch["o_totalprice"]
                      .to_numpy(zero_copy_only=False) * 100
                      + 0.5).astype(np.int64)
        keep = k % 10 != 0
        return pa.table({"k": pa.array(k[keep]),
                         "cents": pa.array(vs[keep])})

    def prep_changes(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vs = np.floor(batch["o_totalprice"]
                      .to_numpy(zero_copy_only=False) * 100
                      + 0.5).astype(np.int64)
        keep = (k % 7 == 0) | (k % 9 == 0)
        k, vs = k[keep], vs[keep]
        return pa.table({"k": pa.array(k),
                         "cents": pa.array(vs + 1000),
                         "deleted": pa.array((k % 9 == 0)
                                             .astype(np.int64))})

    old = ds.map_batches(prep_old, batch_format="pyarrow",
                         zero_copy_batch=True)
    ch = ds.map_batches(prep_changes, batch_format="pyarrow",
                        zero_copy_batch=True)
    out = upsert_snapshot(old, ch, "k", delete_col="deleted")
    return _collect(out, pa.schema([("k", pa.int64()),
                                    ("cents", pa.int64())]))


def _q_table_row_counts(sf_dir: str):
    """COUNT(*) from parquet footers ONLY (zero data rows read) for
    every testdata table — the metadata-pushdown counting pattern a
    100 TB table relies on (sources/tables.py::metadata_row_counts)."""
    import os as _os
    from bigdime_ray.sources.tables import metadata_row_counts
    t = metadata_row_counts(sf_dir)
    names = [_os.path.basename(p) for p in t["path"].to_pylist()]
    return pa.table({"file": pa.array(names, type=pa.string()),
                     "rows": t["rows"]})


def _q_order_price_share(sf_dir: str):
    """RATIO_TO_REPORT window shape: each order's share of its
    priority group's revenue in exact integer parts-per-million
    (v·10⁶ // group total — engine-identical floor division). Totals
    broadcast once; the fact rows never shuffle
    (pipelines/frequency.py::group_share)."""
    from bigdime_ray.pipelines.frequency import group_share
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "o_orderpriority": batch["o_orderpriority"],
                         "cents": _scaled_i64(v, 100)})

    out = group_share(ds.map_batches(prep, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      "o_orderpriority", "cents")
    return out.map_batches(
        lambda b: b.select(["o_orderkey", "share_ppm"]),
        batch_format="pyarrow")


def _q_revenue_by_mktsegment(sf_dir: str):
    """Fact×dim broadcast join as a reusable operator
    (pipelines/join.py::broadcast_join — searchsorted LUT, unique-key
    validated, no shuffle of either side), then segment revenue via
    block partials + a 5-row groupby."""
    from ray.data.aggregate import Sum
    from bigdime_ray.pipelines.join import broadcast_join
    orders = _read(sf_dir, "orders", columns=["o_custkey",
                                              "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey",
                                              "c_mktsegment"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": batch["o_custkey"],
                         "cents": _scaled_i64(v, 100)})

    joined = broadcast_join(
        orders.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True),
        cust, "o_custkey", "c_custkey")

    def part(batch: pa.Table) -> pa.Table:
        seg = batch["c_mktsegment"]
        uniq = pc.unique(seg)
        code = pc.index_in(seg, uniq).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = batch["cents"].to_numpy(zero_copy_only=False)
        g = len(uniq)
        n = np.bincount(code, minlength=g).astype(np.int64)
        s = np.zeros(g, dtype=np.int64)
        np.add.at(s, code, v)
        return pa.table({"c_mktsegment": uniq, "n": pa.array(n),
                         "s": pa.array(s)})

    return (joined.map_batches(part, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("c_mktsegment")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="s")))


def _q_order_price_outliers(sf_dir: str):
    """Tukey-fence data-quality screen per priority
    (pipelines/frequency.py::grouped_iqr_outliers): quartiles exact
    to denominator 4, fences to denominator 8, so the whole test is
    integer comparisons — engine-identical."""
    from bigdime_ray.pipelines.frequency import grouped_iqr_outliers
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderpriority": batch["o_orderpriority"],
                         "cents": _scaled_i64(v, 100)})

    return grouped_iqr_outliers(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        "o_orderpriority", "cents")


def _q_events_hourly_dense(sf_dir: str):
    """Gap-filled hourly series per user: the tumbling-window
    aggregate densified so every user covers every hour between their
    first and last event (pipelines/stream.py::gap_fill_windows) —
    the gapless per-entity time series a training pipeline consumes."""
    from ray.data.aggregate import Sum
    from bigdime_ray.pipelines.stream import gap_fill_windows
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    US_PER_H = 3_600_000_000
    SHIFT = np.int64(1) << np.int64(24)

    def part(batch: pa.Table) -> pa.Table:
        t = (batch["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").view(np.int64))
        if len(t) and t.min() < 0:
            raise ValueError("hourly packing assumes ts >= 1970")
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keys = uid * SHIFT + t // US_PER_H
        val_s = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                         * 10_000 + 0.5).astype(np.int64)
        uniq, inv = np.unique(keys, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, val_s)
        return pa.table({"user_id": pa.array(uniq // SHIFT),
                         "h": pa.array(uniq % SHIFT),
                         "cnt": pa.array(cnt), "total": pa.array(s)})

    agg = (ds.map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["user_id", "h"])
           .aggregate(Sum("cnt", alias_name="cnt"),
                      Sum("total", alias_name="total")))
    return gap_fill_windows(agg, "user_id", "h", ["cnt", "total"])


def _q_top_words_by_source(sf_dir: str):
    """QUALIFY shape: 5 most frequent words per source (ties broken by
    word, so fully deterministic). Block-local (source, word) counts
    via Arrow's C++ group_by, one narrow (source, word, cnt) shuffle,
    then the per-bucket top-k merge (stages/topk.py) — the driver never
    sees the vocabulary, only ≤ sources × 5 rows."""
    from ray.data.aggregate import Sum
    from bigdime_ray.stages.topk import grouped_topk
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def part(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
        lens = (pc.fill_null(pc.list_value_length(words), 0)
                .to_numpy(zero_copy_only=False).astype(np.int64))
        flat = pc.list_flatten(words)
        src = pc.take(batch["source"], pa.array(
            np.repeat(np.arange(len(lens), dtype=np.int64), lens)))
        t = pa.table({"source": src, "word": flat})
        t = t.filter(pc.not_equal(t["word"], ""))  # split artifacts
        g = t.group_by(["source", "word"]).aggregate([("word", "count")])
        return pa.table({"source": g["source"], "word": g["word"],
                         "cnt": pc.cast(g["word_count"], pa.int64())})

    counts = (ds.map_batches(part, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["source", "word"])
              .aggregate(Sum("cnt", alias_name="cnt")))

    # mixed sort directions (cnt DESC, word ASC) via a negated column
    def neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "neg_cnt", pc.negate(batch["cnt"]))

    top = grouped_topk(counts.map_batches(neg, batch_format="pyarrow",
                                          zero_copy_batch=True),
                       ["source"], ["neg_cnt", "word"], k=5)
    return top.map_batches(
        lambda b: b.select(["source", "word", "cnt"]),
        batch_format="pyarrow")


def _q_late_shipment_orders(sf_dir: str):
    """TPC-H Q4 shape — EXISTS with a CROSS-TABLE predicate: orders
    with ANY lineitem shipped ≥ 60 days after the order date, counted
    per priority. The EXISTS collapses to a per-order MAX(l_shipdate)
    (block pre-agg, ≤ orders×blocks rows to the groupby) joined
    co-partitioned back to orders; the date test then runs on int64 µs.
    Empty-block discipline at the groupby→join seam
    (stages/shuffle.py::drop_empty_blocks + materialize)."""
    from ray.data.aggregate import Max, Sum
    from bigdime_ray.stages.shuffle import drop_empty_blocks
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def part(batch: pa.Table) -> pa.Table:
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = (batch["l_shipdate"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").view(np.int64))
        uniq, inv = np.unique(k, return_inverse=True)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, t)
        return pa.table({"l_orderkey": pa.array(uniq),
                         "max_ship_us": pa.array(mx)})

    maxship = (li.map_batches(part, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("l_orderkey")
               .aggregate(Max("max_ship_us", alias_name="max_ship_us")))
    maxship = drop_empty_blocks(maxship).materialize()

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])

    def prep(batch: pa.Table) -> pa.Table:
        d = (batch["o_orderdate"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").view(np.int64))
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "odate_us": pa.array(d),
                         "o_orderpriority": batch["o_orderpriority"]})

    joined = orders.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .join(maxship, join_type="inner", num_partitions=16,
              on=("o_orderkey",), right_on=("l_orderkey",))
    SIXTY_D_US = 60 * 86_400 * 1_000_000

    def late(batch: pa.Table) -> pa.Table:
        keep = (batch["max_ship_us"].to_numpy(zero_copy_only=False)
                >= batch["odate_us"].to_numpy(zero_copy_only=False)
                + SIXTY_D_US)
        pr = batch.filter(pa.array(keep))["o_orderpriority"]
        uniq = pc.unique(pr)
        code = pc.index_in(pr, uniq).to_numpy(zero_copy_only=False)
        n = np.bincount(code.astype(np.int64),
                        minlength=len(uniq)).astype(np.int64)
        return pa.table({"o_orderpriority": uniq, "n": pa.array(n)})

    return (joined.map_batches(late, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("o_orderpriority")
            .aggregate(Sum("n", alias_name="n")))


def _q_doc_decile_stats(sf_dir: str):
    """GLOBAL NTILE(10) distributed (the existing ``documents_ntile``
    is per-partition): global rank = C(v) + rank-within-value, where
    C(v) (#rows with n_chars < v) comes from a value-histogram pass
    pulled once and broadcast (distinct lengths ≪ rows), and the
    within-value rank comes from ONE bucketed exchange keyed by
    n_chars (equal values co-locate). SQL NTILE fill semantics (first
    n%k tiles one longer) reproduced exactly; each bucket emits ≤ 10
    partial rows."""
    import pandas as pd
    import ray as _ray
    from ray.data.aggregate import Sum
    from bigdime_ray.stages.shuffle import add_hash_bucket
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def vc(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = (ds.map_batches(vc, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values("v"))
    vals = hist["v"].to_numpy().astype(np.int64)
    cnts = hist["cnt"].to_numpy().astype(np.int64)
    before = np.r_[0, np.cumsum(cnts)[:-1]]
    total = int(cnts.sum())
    ref = _ray.put((vals, before))
    K = 10
    size, rem = total // K, total % K

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        v = g["n_chars"].to_numpy().astype(np.int64)
        d = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((d, v))
        v, d = v[order], d[order]
        n = len(v)
        starts = np.nonzero(np.r_[True, v[1:] != v[:-1]])[0]
        sizes = np.diff(np.r_[starts, n])
        within = (np.arange(n, dtype=np.int64)
                  - np.repeat(starts, sizes))
        bvals, bbefore = _ray.get(ref)
        base = bbefore[np.searchsorted(bvals, v)]
        rank = base + within  # 0-based global rank
        # SQL NTILE: first `rem` tiles hold size+1 rows
        cut = rem * (size + 1)
        tile = np.where(rank < cut, rank // (size + 1) + 1,
                        rem + (rank - cut) // max(size, 1) + 1)
        t_u, inv = np.unique(tile, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(t_u), dtype=np.int64)
        np.add.at(s, inv, v)
        return pd.DataFrame({"decile": t_u, "n": cnt, "s": s})

    return (add_hash_bucket(ds, "n_chars", 32).groupby("__bucket")
            .map_groups(kernel, batch_format="pandas")
            .groupby("decile").aggregate(Sum("n", alias_name="n"),
                                         Sum("s", alias_name="s")))


def _q_revenue_by_dow(sf_dir: str):
    """Calendar feature extraction: revenue by DAY OF WEEK
    (Sunday=0, DuckDB's dayofweek convention — epoch day 0 was a
    Thursday, hence the +4 bias). One map pass, ≤ 7 rows per block to
    the groupby."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    US_PER_DAY = 86_400 * 1_000_000

    def part(batch: pa.Table) -> pa.Table:
        d = (batch["o_orderdate"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").view(np.int64))
        dow = (d // US_PER_DAY + 4) % 7
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        vs = np.floor(v * 100 + 0.5).astype(np.int64)
        n = np.bincount(dow, minlength=7).astype(np.int64)
        s = np.zeros(7, dtype=np.int64)
        np.add.at(s, dow, vs)
        keep = n > 0
        return pa.table({"dow": pa.array(np.arange(7)[keep]),
                         "n": pa.array(n[keep]), "s": pa.array(s[keep])})

    return (ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("dow").aggregate(Sum("n", alias_name="n"),
                                      Sum("s", alias_name="s")))


def _q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 shape: revenue from lineitems whose SUPPLIER and
    ordering CUSTOMER share a nation, per nation name, for one order
    year. One large-large join (lineitem ⋈ orders, co-partitioned);
    the supplier→nation and customer→nation lookups are two
    `broadcast_join` LUT stages hanging off it (dim tables never
    shuffle); the year filter is PUSHED INTO the orders parquet read;
    the nation-name LUT applies to the ≤|nations|-row aggregate."""
    import datetime as _dt
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum
    from bigdime_ray.pipelines.join import broadcast_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_suppkey": batch["l_suppkey"],
                         "rev_s": _scaled_i64(ep * (1.0 - disc), 1_000)})

    li = li.map_batches(revenue, batch_format="pyarrow",
                        zero_copy_batch=True)
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=((pads.field("o_orderdate")
                 >= _dt.datetime(1996, 1, 1))
                & (pads.field("o_orderdate")
                   < _dt.datetime(1997, 1, 1))))
    joined = li.join(orders, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"])
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"])
    j2 = broadcast_join(joined, supp, "l_suppkey", "s_suppkey")
    j3 = broadcast_join(j2, cust, "o_custkey", "c_custkey")

    def local_rev(batch: pa.Table) -> pa.Table:
        sn = batch["s_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = sn == cn
        sn = sn[keep]
        rv = batch["rev_s"].to_numpy(zero_copy_only=False)[keep]
        uniq, inv = np.unique(sn, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, rv)
        return pa.table({"nationkey": pa.array(uniq),
                         "revenue": pa.array(s)})

    agg = (j3.map_batches(local_rev, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("nationkey")
           .aggregate(Sum("revenue", alias_name="revenue")))
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    named = broadcast_join(agg, nation, "nationkey", "n_nationkey")
    return named.map_batches(lambda b: b.select(["n_name", "revenue"]),
                             batch_format="pyarrow")


def _q_train_val_split_counts(sf_dir: str):
    """Deterministic hash train/val split (retry-safe — a re-executed
    block can never re-roll rows into the other split), counted per
    (source, split); pipelines/curate.py::train_val_split."""
    from ray.data.aggregate import Sum
    from bigdime_ray.pipelines.curate import train_val_split
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    sp = train_val_split(ds)

    def part(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch["source"],
                      "split": batch["split"]})
        g = t.group_by(["source", "split"]).aggregate(
            [("split", "count")])
        return pa.table({"source": g["source"], "split": g["split"],
                         "n": pc.cast(g["split_count"], pa.int64())})

    return (sp.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["source", "split"])
            .aggregate(Sum("n", alias_name="n")))


def _q_user_distinct_value_sum(sf_dir: str):
    """SUM(DISTINCT x) per group: global (user, value) pair dedupe via
    one pair-grain groupby (block-local dedupe first, so ≤ distinct
    pairs per block travel), then the per-user sum over the deduped
    pairs — two small exchanges, never a row-level one."""
    from ray.data.aggregate import Count, Sum
    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def pairs(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        vs = np.floor(v * 10_000 + 0.5).astype(np.int64)
        # block-local pair dedupe: one lexsort
        order = np.lexsort((vs, u))
        u, vs = u[order], vs[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (vs[1:] != vs[:-1])]
        return pa.table({"user_id": pa.array(u[keep]),
                         "vs": pa.array(vs[keep])})

    deduped = (ds.map_batches(pairs, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby(["user_id", "vs"])
               .aggregate(Count(alias_name="cnt")))  # keys dedupe; cnt unused

    def part(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vs = batch["vs"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(u, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, vs)
        return pa.table({"user_id": pa.array(uniq), "s": pa.array(s)})

    return (deduped.map_batches(part, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("user_id").aggregate(Sum("s", alias_name="s")))


def _q_monthly_revenue_delta(sf_dir: str):
    """Month-over-month change — a window function OVER AN AGGREGATE
    (LAG on the monthly rollup): the heavy work is the same bounded
    monthly aggregate as `monthly_revenue`; the LAG runs on its
    ≤|months|-row result, which is exactly where a 100 TB engine wants
    the serial step."""
    m = _q_monthly_revenue(sf_dir).to_pandas().sort_values("month")
    s = m["s"].to_numpy().astype(np.int64)
    delta = s - np.r_[0, s[:-1]]
    return pa.table({"month": pa.array(m["month"],
                                       type=pa.timestamp("us")),
                     "s": pa.array(s), "delta": pa.array(delta)})


def _q_churned_users(sf_dir: str):
    """Retention shape: users active in the first week of the event
    log but silent on the final day — the time-scoped EXCEPT. Same
    one-packed-exchange machinery as the type-scoped sibling
    (`users_purchase_no_error`): two window-presence flags per user."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    US_D = 86_400 * 1_000_000
    w1_lo = np.datetime64("2024-01-01", "us").astype(np.int64)
    w1_hi = w1_lo + 7 * US_D
    w4_lo = np.datetime64("2024-01-30", "us").astype(np.int64)
    w4_hi = w4_lo + 1 * US_D

    def extract(batch: pa.Table):
        keys = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = (batch["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").view(np.int64))
        a = ((t >= w1_lo) & (t < w1_hi)).astype(np.int64)
        b = ((t >= w4_lo) & (t < w4_hi)).astype(np.int64)
        return keys, [a, b]

    keys, (a, b) = grouped_int_sums_exchange(ds, extract, 2)
    out = np.sort(keys[(a > 0) & (b == 0)])
    return pa.table({"user_id": pa.array(out, type=pa.int64())})


def _q_user_event_flags(sf_dir: str):
    """BOOL_OR / BOOL_AND per group as 0/1 int64 flags: has_error =
    any error event; all_positive = every event value > 0. Booleans
    derive from the same two packed int sums (count of error rows,
    count of non-positive rows) — no dedicated boolean aggregate
    machinery needed."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange
    ds = _read(sf_dir, "events", columns=["user_id", "event_type",
                                          "value"])

    def extract(batch: pa.Table):
        keys = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        err = pc.equal(batch["event_type"], "error") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        nonpos = (batch["value"].to_numpy(zero_copy_only=False)
                  <= 0.0).astype(np.int64)
        return keys, [err, nonpos]

    keys, (err, nonpos) = grouped_int_sums_exchange(ds, extract, 2)
    order = np.argsort(keys)
    return pa.table({
        "user_id": pa.array(keys[order]),
        "has_error": pa.array((err[order] > 0).astype(np.int64)),
        "all_positive": pa.array((nonpos[order] == 0).astype(np.int64))})


def queries() -> dict[str, Callable[[str], Any]]:
    """Registry of every implemented pipeline (SURVEY §2C).

    Ordered ORACLE-FIRST (VERDICT r3 #2): every entry with a DuckDB
    oracle in :func:`oracle_sql` precedes the rows-only-by-design
    entries, so a capped prefix sample of the registry exercises only
    oracle-checked queries. The reorder is computed from oracle_sql()
    itself, so it cannot drift as entries are added.

    The oracle-backed prefix additionally ROTATES each round
    (VERDICT r4 #8): the driver samples a fixed-size prefix, so a
    deterministic rotation — seeded by ``BIGDIME_ORACLE_ROTATE`` when
    set, else by the number of completed rounds on disk
    (``CORRECTNESS_r*.json``) — makes successive rounds cover a
    different subset while every key stays present and addressable."""
    q = _registry()
    with_sql = oracle_sql()
    sql_keys = [k for k in q if k in with_sql]
    seed_env = os.environ.get("BIGDIME_ORACLE_ROTATE")
    here = os.path.dirname(os.path.abspath(__file__))
    seed = int(seed_env) if seed_env else len(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    if sql_keys:
        off = (seed * 37) % len(sql_keys)
        sql_keys = sql_keys[off:] + sql_keys[:off]
    out = {k: q[k] for k in sql_keys}
    out.update((k, v) for k, v in q.items() if k not in with_sql)
    return out


def _registry() -> dict[str, Callable[[str], Any]]:
    return {
        "record_count_per_source": _q_record_count_per_source,
        "checksum_per_source": _q_checksum_per_source,
        "ntok_consistency_violations": _q_ntok_consistency,
        "list_range_violations": _q_list_range_check,
        "duplicate_keys": _q_duplicate_keys,
        "referential_violations": _q_referential_violations,
        "column_stats": _q_column_stats,
        "per_source_stats_salted": _q_per_source_stats_salted,
        "exact_dedup_groups": _q_exact_dedup,
        "exact_dedup_normalized": _q_exact_dedup_normalized,
        "ngram_jaccard_dedup_pairs": _q_ngram_jaccard_dedup,
        "minhash_dedup_pairs": _q_minhash_dedup,
        "simhash_dedup_pairs": _q_simhash_dedup,
        "embedding_near_dup_pairs": _q_embedding_near_dup,
        "knn_cosine_top10": _q_knn_top10,
        "knn_cosine_ivf": _q_knn_ivf,
        "knn_cosine_hnsw": _q_knn_hnsw,
        "token_count": _q_token_count,
        "token_count_bpe": _q_token_count_bpe,
        "curated_documents": _q_curated_documents,
        "document_frequency": _q_document_frequency,
        "document_fingerprints": _q_document_fingerprints,
        "pack_sequences": _q_pack_sequences,
        "text_analysis": _q_text_analysis,
        "events_hourly_window": _q_events_hourly,
        "pricing_summary": _q_pricing_summary,
        "top_orders_by_revenue": _q_top_orders,
        "revenue_by_orderpriority": _q_revenue_by_orderpriority,
        "revenue_by_status_string_join": _q_revenue_by_status_string_join,
        "customer_order_coverage": _q_customer_order_coverage,
        "validation_suite_synthetic": _q_validation_suite,
        "tdigest_quantiles": _q_tdigest_quantiles,
        "grouped_topk": _q_grouped_topk,
        "events_running_sum": _q_running_sum,
        "events_lag_delta": _q_lag_delta,
        "latest_event_per_user": _q_latest_event,
        "documents_ntile": _q_ntile,
        "embedding_centroids": _q_embedding_centroids,
        "event_type_pivot": _q_event_pivot,
        "events_rolling_sum": _q_rolling_sum,
        "events_rolling_rows_sum": _q_rolling_rows,
        "events_rolling_rows_max": _q_rolling_rows_max,
        "quantity_discount_corr": _q_quantity_discount_corr,
        "customer_order_full_outer": _q_customer_order_full_outer,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "documents_redacted": _q_redact,
        "documents_html_extracted": _q_html_extract,
        "documents_html_stats": _q_html_stats,
        "warc_ingest": _q_warc_ingest,
        "documents_paragraph_dedup": _q_paragraph_dedup,
        "documents_substring_dedup": _q_substring_dedup,
        "dsir_scores": _q_dsir_scores,
        "gopher_quality": _q_gopher_quality,
        "c4_filters": _q_c4_filters,
        "compression_signals": _q_compression_signals,
        "documents_url_components": _q_url_components,
        "documents_url_canonical": _q_url_canonical,
        "host_pagerank": _q_host_pagerank,
        "host_hits": _q_host_hits,
        "host_degrees": _q_host_degrees,
        "host_pagerank_seeded": _q_host_pagerank_seeded,
        "events_sessions": _q_sessions,
        "heavy_hitters": _q_heavy_hitters,
        "distinct_count": _q_distinct_count,
        "events_asof_join": _q_asof_join,
        "events_asof_join_next": _q_asof_join_next,
        "events_asof_join_windowed": _q_asof_join_windowed,
        "events_interval_overlap": _q_interval_overlap,
        "customers_without_orders": _q_customers_without_orders,
        "parts_with_heavy_orders": _q_parts_with_heavy_orders,
        "doc_length_moments": _q_doc_length_moments,
        "shipping_priority": _q_shipping_priority,
        "quantity_discount_comoments": _q_quantity_discount_comoments,
        "doc_tfidf": _q_doc_tfidf,
        "doc_rank_by_length": _q_doc_rank_by_length,
        "doc_ids_by_source": _q_doc_ids_by_source,
        "doc_lengths_by_source": _q_doc_lengths_by_source,
        "monthly_revenue": _q_monthly_revenue,
        "conditional_agg": _q_conditional_agg,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "customer_order_counts": _q_customer_order_counts,
        "mode_lang_by_source": _q_mode_lang_by_source,
        "user_first_last_value": _q_user_first_last_value,
        "users_purchase_no_error": _q_users_purchase_no_error,
        "funnel_conversion": _q_funnel_conversion,
        "weighted_avg_price": _q_weighted_avg_price,
        "top_supplier": _q_top_supplier,
        "brand_quantity_revenue": _q_brand_quantity_revenue,
        "wealthy_inactive_customers": _q_wealthy_inactive_customers,
        "props_value_by_type": _q_props_value_by_type,
        "order_price_mad": _q_order_price_mad,
        "order_price_quantiles_disc": _q_order_price_quantiles_disc,
        "order_cube": _q_order_cube,
        "users_purchase_and_error": _q_users_purchase_and_error,
        "customers_without_orders_ll": _q_customers_without_orders_ll,
        "events_lag_lead": _q_events_lag_lead,
        "embedding_dim_sums": _q_embedding_dim_sums,
        "embedding_norms_by_label": _q_embedding_norms_by_label,
        "fuzzy_doc_pairs": _q_fuzzy_doc_pairs,
        "word_bigrams": _q_word_bigrams,
        "decontaminate_trigram": _q_decontaminate,
        "token_decontaminate": _q_token_decontaminate,
        "doc_repetition": _q_doc_repetition,
        "doc_keyword_classifier": _q_doc_keyword_classifier,
        "vocabulary_jaccard": _q_vocabulary_jaccard,
        "doc_lm_scores": _q_doc_lm_scores,
        "bpe_merges": _q_bpe_merges,
        "bpe_encoded_lengths": _q_bpe_encoded_lengths,
        "ops_maintenance_cycle": _q_ops_maintenance_cycle,
        "lineitem_metrics_long": _q_lineitem_metrics_long,
        "user_event_entropy": _q_user_event_entropy,
        "approx_distinct_users": _q_approx_distinct_users,
        "user_time_weighted_value": _q_user_time_weighted_value,
        "session_funnel": _q_session_funnel,
        "event_dow_chi2": _q_event_dow_chi2,
        "label_centroid_dots": _q_label_centroid_dots,
        "embedding_gram": _q_embedding_gram,
        "embedding_cov_fixed": _q_embedding_cov_fixed,
        "kmeans_clusters": _q_kmeans_clusters,
        "pq_topk": _q_pq_topk,
        "pq_ivf_topk": _q_pq_ivf_topk,
        "nation_trade_flows": _q_nation_trade_flows,
        "order_snapshot_diff": _q_order_snapshot_diff,
        "order_upsert_apply": _q_order_upsert_apply,
        "orders_price_ranked": _q_orders_price_ranked,
        "table_row_counts": _q_table_row_counts,
        "order_price_share": _q_order_price_share,
        "revenue_by_mktsegment": _q_revenue_by_mktsegment,
        "order_price_outliers": _q_order_price_outliers,
        "events_hourly_dense": _q_events_hourly_dense,
        "top_words_by_source": _q_top_words_by_source,
        "late_shipment_orders": _q_late_shipment_orders,
        "doc_decile_stats": _q_doc_decile_stats,
        "revenue_by_dow": _q_revenue_by_dow,
        "local_supplier_revenue": _q_local_supplier_revenue,
        "train_val_split_counts": _q_train_val_split_counts,
        "user_distinct_value_sum": _q_user_distinct_value_sum,
        "monthly_revenue_delta": _q_monthly_revenue_delta,
        "churned_users": _q_churned_users,
        "user_event_flags": _q_user_event_flags,
        "user_value_pivot": _q_user_value_pivot,
        "totalprice_histogram": _q_totalprice_histogram,
        "orders_page": _q_orders_page,
        "order_rollup": _q_order_rollup,
        "grouped_median": _q_grouped_median,
        "order_price_quantiles": _q_order_price_quantiles,
        "revenue_by_region": _q_revenue_by_region,
        "media_features": _q_media_features,
        "media_near_dup_pairs": _q_media_near_dup_pairs,
        "media_triage": _q_media_triage,
        "stratified_sample": _q_stratified_sample,
        "temperature_mix": _q_temperature_mix,
        "events_hopping_window": _q_hopping_window,
    }


_CENTROID_SQL = (
    "SELECT CAST(label AS BIGINT) AS label, "
    "CAST(COUNT(*) AS BIGINT) AS n, "
    + ", ".join(
        f"CAST(SUM(CAST(FLOOR(CAST(embedding[{j + 1}] AS DOUBLE) * 10000"
        f" + 0.5) AS BIGINT)) AS BIGINT) AS s_{j}" for j in range(64))
    + " FROM embeddings GROUP BY label")


# The same URI grammar as functions/html.py::URL_RE with positional
# groups (1=scheme 2=host 3=path 4=query) for DuckDB regexp_extract.
URL_SQL_RE = r"^([a-z][a-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?"
# mirror of functions/html.py::_CANON_URL_RE (case-tolerant scheme)
_CANON_SQL_RE = (r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"
                 r"(?:\?([^#]*))?")

# Shared HTML-synthesis CTE for the documents_html_* oracles — must stay
# token-for-token the mirror of functions/html.py::synthesize_html.
_HTML_SYNTH_SQL = (
    "WITH h AS (SELECT doc_id, "
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
    "'</title><style>body { color: #222; }</style>' || "
    "'<script type=\"text/javascript\">if (1 < 2) "
    "{ alert(\"x&y\"); }</script>' || "
    "'</head><body><!-- header boilerplate --><h1>Doc ' || "
    "CAST(doc_id AS VARCHAR) || '</h1><p>' || "
    "replace(text, 'table', '<b>table</b>') || "
    "'</p><div class=\"footer\"><a href=\"/d/' || "
    "CAST(doc_id AS VARCHAR) || "
    "'\">next &amp; prev</a>&nbsp;&lt;end&gt;</div></body></html>' "
    "AS html FROM documents) ")

# The extraction chain (mirror of functions/html.py::strip_html: blocks,
# comments, tags→space, entities with &amp; last, whitespace collapse).
_HTML_STRIP_SQL = (
    "trim(regexp_replace("
    "replace(replace(replace(replace(replace(replace(replace("
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "html, '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'), "
    "'(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'), "
    "'(?s)<!--.*?-->', ' ', 'g'), "
    "'<[^>]*>', ' ', 'g'), "
    "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', chr(39)), "
    "'&apos;', chr(39)), '&nbsp;', ' '), '&amp;', '&'), "
    "'\\s+', ' ', 'g'))")


def oracle_sql() -> dict[str, str]:
    return {
        "record_count_per_source":
            "SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source",
        "checksum_per_source":
            f"SELECT source, CAST(SUM((doc_id * {_CHK_MUL}) % {_CHK_MOD}) "
            "AS BIGINT) AS checksum FROM documents GROUP BY source",
        "ntok_consistency_violations":
            "SELECT doc_id, n_chars AS declared, LENGTH(text) AS actual "
            "FROM documents WHERE n_chars <> LENGTH(text)",
        "list_range_violations":
            "SELECT vec_id FROM embeddings WHERE len(embedding) <> 64 OR "
            "len(list_filter(embedding, x -> x < -16.0 OR x > 16.0)) > 0",
        "duplicate_keys":
            "SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem "
            "GROUP BY l_orderkey HAVING COUNT(*) > 1",
        "referential_violations":
            "SELECT DISTINCT l_orderkey FROM lineitem "
            "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)",
        "column_stats":
            "SELECT col_name, CAST(FLOOR(min_v * 10000 + 0.5) AS BIGINT) AS "
            "min_v, CAST(FLOOR(max_v * 10000 + 0.5) AS BIGINT) AS max_v, "
            "CAST(FLOOR(sum7 / 1000.0 / cnt + 0.5) AS BIGINT) AS mean_v, "
            "cnt FROM ("
            "SELECT 'l_quantity' AS col_name, MIN(l_quantity) AS min_v, "
            "MAX(l_quantity) AS max_v, SUM(CAST(FLOOR(l_quantity * 10000000 "
            "+ 0.5) AS BIGINT)) AS sum7, "
            "COUNT(*) AS cnt FROM lineitem UNION ALL "
            "SELECT 'l_extendedprice', MIN(l_extendedprice), "
            "MAX(l_extendedprice), SUM(CAST(FLOOR(l_extendedprice * 10000000 "
            "+ 0.5) AS BIGINT)), COUNT(*) "
            "FROM lineitem UNION ALL "
            "SELECT 'l_discount', MIN(l_discount), MAX(l_discount), "
            "SUM(CAST(FLOOR(l_discount * 10000000 + 0.5) AS BIGINT)), "
            "COUNT(*) FROM lineitem)",
        "per_source_stats_salted":
            "SELECT source, COUNT(*) AS cnt, "
            "CAST(SUM(n_chars) AS BIGINT) AS vsum, "
            "MIN(n_chars) AS vmin, MAX(n_chars) AS vmax "
            "FROM documents GROUP BY source",
        "exact_dedup_groups":
            "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS cnt "
            "FROM documents GROUP BY text",
        "exact_dedup_normalized":
            "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS cnt "
            "FROM documents "
            "GROUP BY lower(regexp_replace(text, '\\s+', ' ', 'g'))",
        "knn_cosine_top10":
            "SELECT vec_id, ROW_NUMBER() OVER (ORDER BY "
            "list_cosine_similarity(embedding, (SELECT embedding FROM "
            "embeddings WHERE vec_id = 0)) DESC, vec_id) AS rnk "
            "FROM embeddings ORDER BY rnk LIMIT 10",
        "token_count":
            "SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) "
            "AS n_ws_tokens FROM documents",
        "token_count_bpe":
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]')) AS BIGINT) "
            "AS n_word_tokens FROM documents",
        "curated_documents":
            "SELECT doc_id, n_chars FROM documents "
            "WHERE length(text) BETWEEN 50 AND 100000 AND doc_id IN ("
            "SELECT MIN(doc_id) FROM documents "
            "WHERE length(text) BETWEEN 50 AND 100000 GROUP BY text)",
        "document_frequency":
            "SELECT w AS word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) "
            "AS df FROM (SELECT doc_id, unnest(string_split_regex("
            "lower(text), '\\s+')) AS w FROM documents) "
            "WHERE w <> '' GROUP BY w "
            "HAVING COUNT(DISTINCT doc_id) >= 5",
        "events_hourly_window":
            "SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS cnt, "
            "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS total FROM events GROUP BY 1, 2",
        "pricing_summary":
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(FLOOR(l_quantity * 1000 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS sum_qty, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000 "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS sum_rev, "
            "CAST(FLOOR(SUM(CAST(FLOOR(l_discount * 1000000 + 0.5) AS "
            "BIGINT)) / 1000.0 / COUNT(*) + 0.5) AS BIGINT) AS avg_disc,"
            " COUNT(*) AS cnt "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus",
        "top_orders_by_revenue":
            "SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_extendedprice * "
            "(1 - l_discount) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue "
            "FROM lineitem GROUP BY l_orderkey "
            "ORDER BY revenue DESC, l_orderkey LIMIT 10",
        "revenue_by_orderpriority":
            "SELECT o_orderpriority, CAST(SUM(CAST(FLOOR(l_extendedprice * "
            "(1 - l_discount) * 1000 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue, COUNT(*) AS cnt "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority",
        "revenue_by_status_string_join":
            "SELECT o_orderstatus, CAST(SUM(CAST(FLOOR(l_extendedprice * "
            "(1 - l_discount) * 1000 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue, COUNT(*) AS cnt "
            "FROM lineitem JOIN orders ON "
            "('O' || CAST(l_orderkey AS VARCHAR)) = "
            "('O' || CAST(o_orderkey AS VARCHAR)) "
            "GROUP BY o_orderstatus",
        "customer_order_coverage":
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(COUNT(o_orderkey) AS BIGINT) AS n_matched "
            "FROM customer LEFT JOIN orders ON "
            "('C' || CAST(c_custkey AS VARCHAR)) = "
            "('C' || CAST(o_custkey AS VARCHAR)) "
            "GROUP BY c_mktsegment",
        "grouped_topk":
            "SELECT l_orderkey, l_linenumber FROM ("
            "SELECT l_orderkey, l_linenumber, ROW_NUMBER() OVER ("
            "PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn "
            "FROM lineitem) WHERE rn <= 2",
        "events_running_sum":
            "SELECT user_id, event_id, CAST(FLOOR(SUM(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) * 10000 + 0.5) "
            "AS BIGINT) AS running_total FROM events",
        "embedding_centroids": _CENTROID_SQL,
        "documents_ntile":
            "SELECT doc_id, lang, CAST(NTILE(4) OVER (PARTITION BY lang "
            "ORDER BY n_chars, doc_id) AS BIGINT) AS tile FROM documents",
        "event_type_pivot":
            "SELECT user_id, "
            "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_click, "
            "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_view, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_purchase, "
            "CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_signup, "
            "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_error "
            "FROM events GROUP BY user_id",
        "latest_event_per_user":
            "SELECT user_id, ts, event_id FROM ("
            "SELECT user_id, ts, event_id, ROW_NUMBER() OVER ("
            "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM events) WHERE rn = 1",
        "events_lag_delta":
            "SELECT user_id, event_id, COALESCE(CAST(date_diff("
            "'microsecond', LAG(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id), ts) AS BIGINT), -1) AS delta_us "
            "FROM events",
        "events_rolling_sum":
            "SELECT user_id, event_id, CAST(SUM(CAST(FLOOR(value * 10000"
            " + 0.5) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS window_total FROM events",
        "events_rolling_rows_sum":
            "SELECT user_id, event_id, CAST(SUM(CAST(FLOOR(value * 10000"
            " + 0.5) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts,"
            " event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS rows_total FROM events",
        "events_rolling_rows_max":
            "SELECT user_id, event_id, CAST(MAX(CAST(FLOOR(value * 10000"
            " + 0.5) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts,"
            " event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS rows_ext FROM events",
        "quantity_discount_corr":
            "WITH m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) "
            "AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx, "
            "SUM(y*y) AS syy, SUM(x*y) AS sxy FROM (SELECT l_returnflag,"
            " CAST(FLOOR(l_quantity * 1 + 0.5) AS BIGINT) AS x, "
            "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS y "
            "FROM lineitem) GROUP BY l_returnflag) "
            "SELECT l_returnflag, n, CASE WHEN "
            "sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * "
            "(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - "
            "CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) > 0.0 THEN "
            "CAST(FLOOR((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - "
            "CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / "
            "sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * "
            "(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - "
            "CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) "
            "* 1000000 + 0.5) AS BIGINT) ELSE 0 END AS corr_micro "
            "FROM m",
        "customer_order_full_outer":
            "WITH l AS (SELECT CAST(c_custkey AS VARCHAR) AS cust_l, "
            "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS "
            "acctbal_cents FROM customer WHERE c_acctbal >= 9000), "
            "r AS (SELECT CAST(o_custkey AS VARCHAR) AS cust_r, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders "
            "WHERE o_totalprice >= 470000 GROUP BY o_custkey) "
            "SELECT COALESCE(cust_l, cust_r) AS cust_key, acctbal_cents,"
            " n_orders FROM l FULL OUTER JOIN r ON cust_l = cust_r",
        "distinct_users_by_type":
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) "
            "AS n_distinct FROM events GROUP BY event_type",
        "documents_redacted":
            "SELECT doc_id, regexp_replace(regexp_replace(text, "
            "'\\d{3,}', '[REDACTED]', 'g'), '\\b(key|hash)\\b', "
            "'[REDACTED]', 'g') AS text, "
            "CAST(len(regexp_extract_all(text, '\\d{3,}')) + "
            "len(regexp_extract_all(text, '\\b(key|hash)\\b')) "
            "AS BIGINT) AS n_redactions FROM documents",
        "documents_html_extracted":
            _HTML_SYNTH_SQL +
            "SELECT doc_id, " + _HTML_STRIP_SQL + " AS text FROM h",
        "warc_ingest":
            _HTML_SYNTH_SQL +
            "SELECT doc_id, " + _HTML_STRIP_SQL + " AS text FROM h",
        "documents_paragraph_dedup":
            "WITH l AS ("
            "SELECT doc_id, 0 AS ord, 'shared-' || lang AS line "
            "FROM documents "
            "UNION ALL SELECT doc_id, 1, text FROM documents "
            "UNION ALL SELECT doc_id, 2, 'footer-' || source "
            "FROM documents), "
            "c AS (SELECT line, COUNT(*) AS cnt, MIN(doc_id) AS keeper "
            "FROM l GROUP BY line) "
            "SELECT l.doc_id, COALESCE(string_agg(l.line, chr(10) "
            "ORDER BY l.ord) FILTER (WHERE c.cnt < 2 OR "
            "l.doc_id = c.keeper), '') AS text, "
            "CAST(3 - COUNT(*) FILTER (WHERE c.cnt < 2 OR "
            "l.doc_id = c.keeper) AS BIGINT) AS n_dropped "
            "FROM l JOIN c USING (line) GROUP BY l.doc_id",
        "c4_filters":
            "WITH t2 AS (SELECT doc_id, text || '.' || chr(10) || "
            "'short line.' || chr(10) || "
            "'Another perfectly fine sentence appears here.' || "
            "chr(10) || 'Is this a well formed closing question now?' "
            "|| "
            "CASE WHEN doc_id % 3 = 0 THEN chr(10) || "
            "'Please enable javascript to continue reading this.' "
            "ELSE '' END || "
            "CASE WHEN doc_id % 7 = 0 THEN chr(10) || "
            "'Classic lorem ipsum filler appears here.' ELSE '' END || "
            "CASE WHEN doc_id % 11 = 0 THEN chr(10) || "
            "'A stray { brace lives on this page.' ELSE '' END "
            "AS text FROM documents), "
            "l AS (SELECT doc_id, ln, ord, "
            "((ln LIKE '%.' OR ln LIKE '%!' OR ln LIKE '%?' OR "
            "ln LIKE '%\"') AND len(list_filter("
            "string_split_regex(ln, '\\s+'), x -> x <> '')) >= 5 AND "
            "NOT contains(lower(ln), 'javascript')) AS keep FROM "
            "(SELECT doc_id, UNNEST(string_split(text, chr(10))) AS "
            "ln, UNNEST(generate_series(1, len(string_split(text, "
            "chr(10))))) AS ord FROM t2)), "
            "ka AS (SELECT doc_id, "
            "COALESCE(string_agg(ln, chr(10) ORDER BY ord) "
            "FILTER (WHERE keep), '') AS text, "
            "CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS nk, "
            "CAST(COUNT(*) AS BIGINT) AS nl FROM l GROUP BY doc_id) "
            "SELECT t2.doc_id, ka.text, ka.nk AS n_kept_lines, "
            "ka.nl - ka.nk AS n_dropped_lines, "
            "(ka.nk >= 3 AND NOT contains(lower(t2.text), "
            "'lorem ipsum') AND NOT contains(t2.text, '{')) "
            "AS c4_keep FROM t2 JOIN ka ON ka.doc_id = t2.doc_id",
        "gopher_quality":
            "WITH t2 AS (SELECT doc_id, "
            "CASE WHEN doc_id % 3 = 0 THEN '- bullet intro line' || "
            "chr(10) ELSE '' END || text || "
            "CASE WHEN doc_id % 4 = 0 THEN chr(10) || "
            "'teaser ends here...' ELSE '' END || "
            "CASE WHEN doc_id % 5 = 0 THEN chr(10) || "
            "'### symbol ... wall ...' ELSE '' END AS text "
            "FROM documents), "
            "w AS (SELECT doc_id, w FROM (SELECT doc_id, "
            "UNNEST(string_split_regex(text, '\\s+')) AS w FROM t2) "
            "WHERE w <> ''), "
            "wa AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nw, "
            "CAST(SUM(length(w)) AS BIGINT) AS nc, "
            "CAST(COUNT(*) FILTER (WHERE regexp_matches(w, "
            "'[a-zA-Z]')) AS BIGINT) AS na, "
            "CAST(COUNT(DISTINCT CASE WHEN lower(w) IN ('the', 'be', "
            "'to', 'of', 'and', 'that', 'have', 'with') THEN lower(w) "
            "END) AS BIGINT) AS ns FROM w GROUP BY doc_id), "
            "l AS (SELECT doc_id, UNNEST(string_split(text, chr(10))) "
            "AS ln FROM t2), "
            "la AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nl, "
            "CAST(COUNT(*) FILTER (WHERE ln LIKE '- %' OR ln LIKE "
            "'• %' OR ln LIKE '* %') AS BIGINT) AS nb, "
            "CAST(COUNT(*) FILTER (WHERE ln LIKE '%...' OR ln LIKE "
            "'%…') AS BIGINT) AS ne FROM l GROUP BY doc_id), "
            "sy AS (SELECT doc_id, CAST(length(text) - "
            "length(replace(text, '#', '')) + (length(text) - "
            "length(replace(text, '...', ''))) // 3 + length(text) - "
            "length(replace(text, '…', '')) AS BIGINT) AS nsym "
            "FROM t2) "
            "SELECT t2.doc_id, t2.text, "
            "COALESCE(wa.nw, 0) AS n_words, "
            "COALESCE(wa.nc, 0) AS n_chars, "
            "COALESCE(wa.na, 0) AS n_alpha_words, "
            "COALESCE(wa.ns, 0) AS n_stopword_types, "
            "la.nl AS n_lines, la.nb AS n_bullet_lines, "
            "la.ne AS n_ellipsis_lines, sy.nsym AS n_symbols, "
            "(COALESCE(wa.nw, 0) >= 50 AND COALESCE(wa.nw, 0) <= "
            "100000 AND 3 * COALESCE(wa.nw, 0) <= COALESCE(wa.nc, 0) "
            "AND COALESCE(wa.nc, 0) <= 10 * COALESCE(wa.nw, 0) AND "
            "10 * sy.nsym <= COALESCE(wa.nw, 0) AND "
            "10 * la.nb <= la.nl AND 10 * la.ne <= 3 * la.nl AND "
            "10 * COALESCE(wa.na, 0) >= 8 * COALESCE(wa.nw, 0) AND "
            "COALESCE(wa.ns, 0) >= 2) AS gopher_pass "
            "FROM t2 LEFT JOIN wa ON wa.doc_id = t2.doc_id "
            "JOIN la ON la.doc_id = t2.doc_id "
            "JOIN sy ON sy.doc_id = t2.doc_id",
        "dsir_scores":
            "WITH tok AS (SELECT doc_id, lang, w FROM "
            "(SELECT doc_id, lang, "
            "UNNEST(string_split_regex(lower(text), '\\s+')) AS w "
            "FROM documents) WHERE w <> ''), "
            "tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS ct "
            "FROM tok WHERE lang = 'en' GROUP BY w), "
            "rc AS (SELECT t.w, CAST(COUNT(*) AS BIGINT) AS cr "
            "FROM tok t JOIN tc ON tc.w = t.w GROUP BY t.w), "
            "wt AS (SELECT tc.w, CAST((CAST(tc.ct + 1 AS HUGEINT) * "
            "1000000) // (rc.cr + 1) AS BIGINT) AS wgt "
            "FROM tc JOIN rc ON rc.w = tc.w) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(SUM(wt.wgt), 0) AS BIGINT) AS dsir_score_fp "
            "FROM documents d LEFT JOIN tok t ON t.doc_id = d.doc_id "
            "LEFT JOIN wt ON wt.w = t.w GROUP BY d.doc_id",
        "documents_substring_dedup":
            "WITH docs AS (SELECT doc_id, text, length(text) AS l "
            "FROM documents), "
            "p AS (SELECT doc_id, text, "
            f"unnest(generate_series(0, l - {_SUBSTR_K})) AS pos "
            f"FROM docs WHERE l >= {_SUBSTR_K}), "
            "win AS ("
            "SELECT doc_id, pos, CAST("
            f"{_SUBSTR_K} AS BIGINT) AS wlen, "
            f"substring(text, CAST(pos AS INT) + 1, {_SUBSTR_K}) AS s "
            "FROM p "
            "UNION ALL SELECT doc_id, 0, CAST(l AS BIGINT), text "
            f"FROM docs WHERE l < {_SUBSTR_K}), "
            "rep AS (SELECT s, MIN(doc_id) AS keeper FROM win "
            "GROUP BY s HAVING COUNT(*) >= 2), "
            "flag AS (SELECT w.doc_id, w.pos, w.pos + w.wlen AS e "
            "FROM win w JOIN rep r ON w.s = r.s "
            "AND w.doc_id <> r.keeper), "
            "isl AS (SELECT doc_id, pos, e, "
            "MAX(e) OVER (PARTITION BY doc_id ORDER BY pos "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax "
            "FROM flag) "
            "SELECT d.doc_id, "
            "CAST(COUNT(i.pos) AS BIGINT) AS n_dup_windows, "
            "CAST(COALESCE(SUM(GREATEST(0, i.e - "
            "GREATEST(i.pos, COALESCE(i.pmax, 0)))), 0) AS BIGINT) "
            "AS n_masked_chars "
            "FROM docs d LEFT JOIN isl i ON i.doc_id = d.doc_id "
            "GROUP BY d.doc_id",
        "documents_url_components":
            "WITH u AS (SELECT doc_id, 'https://' || source || "
            "'.example.org/d/' || CAST(doc_id AS VARCHAR) || "
            "CASE WHEN doc_id % 4 = 0 THEN '?ref=' || lang ELSE '' END "
            "AS url FROM documents), "
            "p AS (SELECT doc_id, url, "
            "regexp_extract(url, '" + URL_SQL_RE + "', 1) AS scheme, "
            "regexp_extract(url, '" + URL_SQL_RE + "', 2) AS host, "
            "regexp_extract(url, '" + URL_SQL_RE + "', 3) AS path, "
            "regexp_extract(url, '" + URL_SQL_RE + "', 4) AS url_query "
            "FROM u) "
            "SELECT doc_id, url, scheme, host, path, url_query, "
            "CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) = '' "
            "THEN host ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) "
            "END AS host_sld FROM p",
        "documents_url_canonical":
            "WITH u AS (SELECT doc_id, "
            "CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' "
            "ELSE 'http://WWW.' END || source || '.Example.ORG' || "
            "CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END || "
            "CASE WHEN doc_id % 4 = 0 THEN '' "
            "ELSE '/Articles/' || CAST(doc_id AS VARCHAR) END || "
            "'?utm_source=feed' || "
            "CASE WHEN doc_id % 3 = 0 THEN '&fbclid=track' "
            "ELSE '' END || "
            "CASE WHEN doc_id % 6 = 0 THEN '' "
            "ELSE '&id=' || CAST(doc_id % 50 AS VARCHAR) END || "
            "CASE WHEN doc_id % 5 = 0 THEN '#sec-' || lang "
            "ELSE '' END AS url FROM documents), "
            "p AS (SELECT doc_id, url, "
            "lower(regexp_extract(url, '" + _CANON_SQL_RE + "', 1)) "
            "AS scheme, "
            "lower(regexp_extract(url, '" + _CANON_SQL_RE + "', 2)) "
            "AS host0, "
            "regexp_extract(url, '" + _CANON_SQL_RE + "', 3) AS path0, "
            "regexp_extract(url, '" + _CANON_SQL_RE + "', 4) AS q0 "
            "FROM u), "
            "c AS (SELECT doc_id, url, scheme, "
            "CASE WHEN scheme = 'https' THEN "
            "regexp_replace(host0, ':443$', '') "
            "WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', "
            "'') ELSE host0 END AS host, "
            "CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path, "
            "array_to_string(list_filter(string_split(q0, '&'), "
            "x -> x <> '' AND NOT regexp_matches(x, "
            "'^(utm_[^=]*|fbclid|gclid)(=|$)')), '&') AS q FROM p) "
            "SELECT doc_id, url, scheme || '://' || host || path || "
            "CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canon "
            "FROM c",
        "host_pagerank": _pagerank_oracle_sql(_PAGERANK_ITERS),
        "host_hits": _hits_oracle_sql(_HITS_ITERS),
        "host_pagerank_seeded": _ppr_oracle_sql(_PAGERANK_ITERS),
        "host_degrees":
            _HOST_EDGES_SQL +
            ", od AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) "
            "AS d FROM e GROUP BY src), "
            "id AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS d "
            "FROM e GROUP BY dst) "
            "SELECT nodes.node, COALESCE(od.d, 0) AS out_deg, "
            "COALESCE(id.d, 0) AS in_deg FROM nodes "
            "LEFT JOIN od ON od.node = nodes.node "
            "LEFT JOIN id ON id.node = nodes.node",
        "documents_html_stats":
            _HTML_SYNTH_SQL +
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(html, '(?i)<[a-z/!][^>]*>')) "
            "AS BIGINT) AS n_tags, "
            "CAST(len(regexp_extract_all(html, '(?i)<a\\b')) AS BIGINT) "
            "AS n_links, "
            "CAST(length(" + _HTML_STRIP_SQL + ") AS BIGINT) AS text_len, "
            "CAST(FLOOR(CAST(len(regexp_extract_all(html, '(?i)<a\\b')) "
            "AS DOUBLE) * 1000.0 / CAST(GREATEST(length(" +
            _HTML_STRIP_SQL + "), 1) AS DOUBLE) * 1000000.0 + 0.5) "
            "AS BIGINT) AS link_density_micro FROM h",
        "events_sessions":
            "WITH g AS (SELECT user_id, ts, CASE WHEN "
            "ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > "
            "INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT user_id, ts, CAST(SUM(brk) OVER (PARTITION BY "
            "user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS session_id FROM g) "
            "SELECT user_id, session_id, COUNT(*) AS n_events, "
            "MIN(ts) AS session_start, MAX(ts) AS session_end "
            "FROM s GROUP BY 1, 2",
        "heavy_hitters":
            "SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 40",
        "distinct_count":
            "SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS cnt "
            "FROM lineitem",
        "events_asof_join":
            "WITH p AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts, MAX(event_id) AS cid FROM events "
            "WHERE event_type = 'click' GROUP BY user_id, ts) "
            "SELECT p.user_id, p.ts, p.event_id, "
            "CAST(c.cid AS DOUBLE) AS click_event_id "
            "FROM p ASOF LEFT JOIN c "
            "ON p.user_id = c.user_id AND p.ts >= c.ts",
        "events_asof_join_next":
            "WITH p AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts, MAX(event_id) AS cid FROM events "
            "WHERE event_type = 'click' GROUP BY user_id, ts) "
            "SELECT p.user_id, p.ts, p.event_id, "
            "CAST(c.cid AS DOUBLE) AS next_click_id "
            "FROM p ASOF LEFT JOIN c "
            "ON p.user_id = c.user_id AND p.ts <= c.ts",
        "events_asof_join_windowed":
            "WITH p AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts, MAX(event_id) AS cid FROM events "
            "WHERE event_type = 'click' GROUP BY user_id, ts) "
            "SELECT user_id, ts, event_id, click_event_id FROM ("
            "SELECT p.user_id, p.ts, p.event_id, "
            "CAST(c.cid AS DOUBLE) AS click_event_id, "
            "ROW_NUMBER() OVER (PARTITION BY p.event_id "
            "ORDER BY c.ts DESC NULLS LAST) AS rn "
            "FROM p LEFT JOIN c ON p.user_id = c.user_id "
            "AND c.ts <= p.ts "
            "AND c.ts >= p.ts - INTERVAL 2 HOUR) WHERE rn = 1",
        "events_interval_overlap":
            "WITH iv AS (SELECT user_id, ts AS lo, "
            "ts + INTERVAL 2 HOUR AS hi FROM events "
            "WHERE event_type = 'purchase'), "
            "ev AS (SELECT user_id, event_id, ts FROM events "
            "WHERE event_type = 'click') "
            "SELECT ev.user_id, ev.ts, ev.event_id, "
            "CAST(COUNT(iv.lo) AS BIGINT) AS n_active "
            "FROM ev LEFT JOIN iv ON ev.user_id = iv.user_id "
            "AND ev.ts BETWEEN iv.lo AND iv.hi "
            "GROUP BY ev.user_id, ev.ts, ev.event_id",
        "customers_without_orders":
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders)",
        "parts_with_heavy_orders":
            "SELECT p_partkey, p_brand FROM part WHERE p_partkey IN "
            "(SELECT l_partkey FROM lineitem WHERE l_quantity > 45)",
        "doc_length_moments":
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(n_chars) AS BIGINT) AS s, "
            "CAST(SUM(CAST(n_chars AS BIGINT) * n_chars) AS BIGINT) "
            "AS ss FROM documents GROUP BY source",
        "shipping_priority":
            "SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_extendedprice * "
            "(1 - l_discount) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS "
            "revenue, o_orderdate, o_orderpriority "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1998-06-01' "
            "AND l_shipdate > TIMESTAMP '1998-06-01' "
            "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue DESC, l_orderkey LIMIT 10",
        "quantity_discount_comoments":
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,"
            " CAST(SUM(x * x) AS BIGINT) AS sxx, "
            "CAST(SUM(y * y) AS BIGINT) AS syy, "
            "CAST(SUM(x * y) AS BIGINT) AS sxy FROM ("
            "SELECT l_returnflag, "
            "CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS x, "
            "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS y "
            "FROM lineitem) GROUP BY l_returnflag",
        "doc_tfidf":
            "WITH toks AS (SELECT doc_id, unnest(string_split_regex("
            "lower(text), '\\s+')) AS w FROM documents), "
            "tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM toks WHERE w <> '' GROUP BY doc_id, w), "
            "df AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) "
            "AS df FROM toks WHERE w <> '' GROUP BY w "
            "HAVING COUNT(DISTINCT doc_id) >= 2), "
            "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents) "
            "SELECT tf.doc_id, tf.w AS word, tf.tf, df.df, "
            "CAST(FLOOR(tf.tf * ln(n.n / df.df) * 1000000 + 0.5) "
            "AS BIGINT) AS score_s FROM tf, df, n WHERE tf.w = df.w",
        "doc_rank_by_length":
            "SELECT source, doc_id, n_chars, "
            "CAST(RANK() OVER (PARTITION BY source ORDER BY n_chars "
            "DESC) AS BIGINT) AS rank, "
            "CAST(DENSE_RANK() OVER (PARTITION BY source ORDER BY "
            "n_chars DESC) AS BIGINT) AS dense_rank, "
            "CAST(FLOOR(PERCENT_RANK() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC) * 1000000 + 0.5) AS BIGINT) "
            "AS pr_s, "
            "CAST(FLOOR(CUME_DIST() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC) * 1000000 + 0.5) AS BIGINT) "
            "AS cd_s FROM documents",
        "doc_ids_by_source":
            "SELECT source, string_agg(CAST(doc_id AS VARCHAR), ',' "
            "ORDER BY doc_id) AS agg FROM documents GROUP BY source",
        "monthly_revenue":
            "SELECT date_trunc('month', o_orderdate) AS month, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS s FROM orders "
            "GROUP BY date_trunc('month', o_orderdate)",
        "conditional_agg":
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(CASE WHEN CAST(FLOOR(l_quantity*1000+0.5) AS "
            "BIGINT) > 25000 THEN 1 ELSE 0 END) AS BIGINT) AS heavy_cnt, "
            "CAST(SUM(CASE WHEN CAST(FLOOR(l_discount*1000000+0.5) AS "
            "BIGINT) > 50000 THEN CAST(FLOOR(l_extendedprice*"
            "(1-l_discount)*1000+0.5) AS BIGINT) ELSE 0 END) AS BIGINT) "
            "AS disc_rev_s FROM lineitem GROUP BY l_returnflag",
        "small_quantity_revenue":
            "SELECT CAST(COALESCE(SUM(CAST(FLOOR(l.l_extendedprice*100"
            "+0.5) AS BIGINT)), 0) AS BIGINT) AS revenue_s, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem l JOIN "
            "(SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS pn, "
            "CAST(SUM(CAST(FLOOR(l_quantity*1000+0.5) AS BIGINT)) AS "
            "BIGINT) AS sq FROM lineitem GROUP BY l_partkey) p "
            "ON l.l_partkey = p.pk "
            "WHERE CAST(FLOOR(l.l_quantity*1000+0.5) AS BIGINT)*5*p.pn "
            "< p.sq",
        "customer_order_counts":
            "SELECT order_count, CAST(COUNT(*) AS BIGINT) AS "
            "num_customers FROM (SELECT c.c_custkey, "
            "CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_count "
            "FROM customer c LEFT JOIN orders o "
            "ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey) "
            "GROUP BY order_count",
        "mode_lang_by_source":
            "SELECT source, lang AS mode, cnt FROM (SELECT source, "
            "lang, CAST(COUNT(*) AS BIGINT) AS cnt, ROW_NUMBER() OVER "
            "(PARTITION BY source ORDER BY COUNT(*) DESC, lang) AS rn "
            "FROM documents GROUP BY source, lang) WHERE rn = 1",
        "user_first_last_value":
            "SELECT user_id, CAST(FLOOR(FIRST(value ORDER BY ts, "
            "event_id)*10000+0.5) AS BIGINT) AS first_v, "
            "CAST(FLOOR(LAST(value ORDER BY ts, event_id)*10000+0.5) "
            "AS BIGINT) AS last_v FROM events GROUP BY user_id",
        "users_purchase_no_error":
            "SELECT user_id FROM events WHERE event_type = 'purchase' "
            "AND value > 90 EXCEPT SELECT user_id FROM events "
            "WHERE event_type = 'error' AND value > 90",
        "funnel_conversion":
            "SELECT user_id, s AS signup_ts, c AS click_ts, "
            "p AS purchase_ts FROM ("
            "SELECT user_id, "
            "MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s, "
            "MIN(CASE WHEN event_type = 'click' THEN ts END) AS c, "
            "MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p "
            "FROM events GROUP BY user_id) "
            "WHERE s < c AND c < p",
        "weighted_avg_price":
            "SELECT l_returnflag, CAST(SUM(CAST(FLOOR(l_extendedprice"
            "*100+0.5) AS BIGINT)*CAST(FLOOR(l_quantity+0.5) AS BIGINT"
            ")) AS BIGINT) AS num_s, CAST(SUM(CAST(FLOOR(l_quantity"
            "+0.5) AS BIGINT)) AS BIGINT) AS den, CAST(SUM(CAST(FLOOR("
            "l_extendedprice*100+0.5) AS BIGINT)*CAST(FLOOR(l_quantity"
            "+0.5) AS BIGINT)) * 10000 // SUM(CAST(FLOOR(l_quantity"
            "+0.5) AS BIGINT)) AS BIGINT) AS wavg_micro "
            "FROM lineitem GROUP BY l_returnflag",
        "top_supplier":
            "WITH rev AS (SELECT l_suppkey, CAST(SUM(CAST(FLOOR("
            "l_extendedprice*(1-l_discount)*1000+0.5) AS BIGINT)) AS "
            "BIGINT) AS total_rev FROM lineitem WHERE l_shipdate >= "
            "TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP "
            "'1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total_rev FROM supplier "
            "JOIN rev ON s_suppkey = l_suppkey "
            "WHERE total_rev = (SELECT MAX(total_rev) FROM rev)",
        "brand_quantity_revenue":
            "SELECT CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)"
            "*1000+0.5) AS BIGINT)) AS BIGINT) AS rev_s, "
            "CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE "
            "(p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity "
            "BETWEEN 1 AND 11) OR (p_brand = 'Brand#2' AND p_size <= "
            "25 AND l_quantity BETWEEN 10 AND 20) OR (p_brand = "
            "'Brand#3' AND p_size <= 35 AND l_quantity BETWEEN 20 "
            "AND 30)",
        "wealthy_inactive_customers":
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(COUNT(*) AS BIGINT) AS numcust, "
            "CAST(SUM(CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT)) AS "
            "BIGINT) AS totacctbal_s FROM customer WHERE "
            "CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT) * (SELECT "
            "COUNT(*) FROM customer WHERE c_acctbal > 0.0) > (SELECT "
            "SUM(CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT)) FROM "
            "customer WHERE c_acctbal > 0.0) AND c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > "
            "300000.0) GROUP BY c_nationkey",
        "props_value_by_type":
            "SELECT event_type, CAST(SUM(COALESCE(TRY_CAST("
            "regexp_extract(props, '\"k\":\\s*(-?\\d+)', 1) AS BIGINT)"
            ", 0)) AS BIGINT) AS s, CAST(SUM(CASE WHEN TRY_CAST("
            "regexp_extract(props, '\"k\":\\s*(-?\\d+)', 1) AS BIGINT)"
            " IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_present, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM events "
            "GROUP BY event_type",
        "user_value_pivot":
            "SELECT user_id, "
            + ", ".join(
                f"CAST(SUM(CASE WHEN event_type = '{t}' THEN "
                f"CAST(FLOOR(value*10000+0.5) AS BIGINT) ELSE 0 END) "
                f"AS BIGINT) AS s_{t}"
                for t in ["click", "view", "purchase", "signup",
                          "error"])
            + " FROM events GROUP BY user_id",
        "totalprice_histogram":
            "SELECT CAST(FLOOR(o_totalprice/20000.0) AS BIGINT) AS "
            "bucket, CAST(COUNT(*) AS BIGINT) AS n FROM orders "
            "GROUP BY bucket",
        "orders_page":
            "SELECT o_orderkey, CAST(FLOOR(o_totalprice*100+0.5) AS "
            "BIGINT) AS price_s FROM orders "
            "ORDER BY price_s DESC, o_orderkey LIMIT 20 OFFSET 40",
        "order_price_mad":
            "SELECT o_orderpriority, CAST(FLOOR(4 * mad(CAST(FLOOR("
            "o_totalprice * 100 + 0.5) AS BIGINT)) + 0.5) AS BIGINT) "
            "AS mad4 FROM orders GROUP BY o_orderpriority",
        "order_price_quantiles_disc":
            "SELECT o_orderpriority, "
            + ", ".join(
                f"CAST(quantile_disc(CAST(FLOOR(o_totalprice * 100 "
                f"+ 0.5) AS BIGINT), {q}) AS BIGINT) AS q{p}"
                for q, p in ((0.25, 25), (0.5, 50), (0.75, 75)))
            + " FROM orders GROUP BY o_orderpriority",
        "order_cube":
            "SELECT COALESCE(o_orderpriority, '(all)') AS "
            "o_orderpriority, COALESCE(o_orderstatus, '(all)') AS "
            "o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS s FROM orders "
            "GROUP BY CUBE(o_orderpriority, o_orderstatus)",
        "users_purchase_and_error":
            "SELECT user_id FROM events WHERE event_type = 'purchase' "
            "AND value > 90 INTERSECT SELECT user_id FROM events "
            "WHERE event_type = 'error' AND value > 90",
        "customers_without_orders_ll":
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders)",
        "churned_users":
            "SELECT user_id FROM events WHERE ts >= TIMESTAMP "
            "'2024-01-01' AND ts < TIMESTAMP '2024-01-08' "
            "EXCEPT SELECT user_id FROM events WHERE ts >= TIMESTAMP "
            "'2024-01-30' AND ts < TIMESTAMP '2024-01-31'",
        "user_event_flags":
            "SELECT user_id, CAST(BOOL_OR(event_type = 'error') AS "
            "BIGINT) AS has_error, CAST(BOOL_AND(value > 0) AS "
            "BIGINT) AS all_positive FROM events GROUP BY user_id",
        "user_distinct_value_sum":
            "SELECT user_id, CAST(SUM(DISTINCT CAST(FLOOR(value * "
            "10000 + 0.5) AS BIGINT)) AS BIGINT) AS s FROM events "
            "GROUP BY user_id",
        "monthly_revenue_delta":
            "WITH m AS (SELECT date_trunc('month', o_orderdate) AS "
            "month, CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS "
            "BIGINT)) AS BIGINT) AS s FROM orders GROUP BY month) "
            "SELECT month, s, s - COALESCE(LAG(s) OVER (ORDER BY "
            "month), 0) AS delta FROM m",
        "train_val_split_counts":
            f"SELECT source, CASE WHEN ((doc_id * {_CHK_MUL}) % "
            f"{_CHK_MOD}) % 1000 < 100 THEN 'val' ELSE 'train' END AS "
            "split, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
            "GROUP BY 1, 2",
        "local_supplier_revenue":
            "SELECT n_name, CAST(SUM(CAST(FLOOR(l_extendedprice * "
            "(1 - l_discount) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS "
            "revenue FROM customer, orders, lineitem, supplier, nation "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name",
        "late_shipment_orders":
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM orders WHERE EXISTS (SELECT 1 FROM lineitem WHERE "
            "l_orderkey = o_orderkey AND l_shipdate >= o_orderdate "
            "+ INTERVAL 60 DAY) GROUP BY o_orderpriority",
        "doc_decile_stats":
            "WITH t AS (SELECT n_chars, NTILE(10) OVER (ORDER BY "
            "n_chars, doc_id) AS d FROM documents) "
            "SELECT CAST(d AS BIGINT) AS decile, CAST(COUNT(*) AS "
            "BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS s FROM t "
            "GROUP BY d",
        "revenue_by_dow":
            "SELECT CAST(dayofweek(o_orderdate) AS BIGINT) AS dow, "
            "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(CAST(FLOOR("
            "o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s "
            "FROM orders GROUP BY dow",
        "top_words_by_source":
            "WITH w AS (SELECT source, w FROM (SELECT source, "
            "UNNEST(string_split_regex(lower(text), '\\s+')) AS w "
            "FROM documents) WHERE w <> ''), "
            "c AS (SELECT source, w AS word, CAST(COUNT(*) AS BIGINT) "
            "AS cnt FROM w GROUP BY 1, 2) "
            "SELECT source, word, cnt FROM c QUALIFY ROW_NUMBER() "
            "OVER (PARTITION BY source ORDER BY cnt DESC, word) <= 5",
        "revenue_by_mktsegment":
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))"
            " AS BIGINT) AS s FROM orders JOIN customer "
            "ON o_custkey = c_custkey GROUP BY c_mktsegment",
        "order_price_outliers":
            "WITH b AS (SELECT o_orderpriority AS p, CAST(FLOOR("
            "o_totalprice * 100 + 0.5) AS BIGINT) AS vs FROM orders), "
            "q AS (SELECT p, CAST(FLOOR(quantile_cont(vs, 0.25) * 4 "
            "+ 0.5) AS BIGINT) AS q14, CAST(FLOOR(quantile_cont(vs, "
            "0.75) * 4 + 0.5) AS BIGINT) AS q34 FROM b GROUP BY p) "
            "SELECT b.p AS o_orderpriority, "
            "CAST(SUM(CASE WHEN 8 * vs < 2 * q14 - 3 * (q34 - q14) "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_low, "
            "CAST(SUM(CASE WHEN 8 * vs > 2 * q34 + 3 * (q34 - q14) "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_high, "
            "CAST(SUM(CASE WHEN 8 * vs < 2 * q14 - 3 * (q34 - q14) "
            "OR 8 * vs > 2 * q34 + 3 * (q34 - q14) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_outliers "
            "FROM b JOIN q ON b.p = q.p GROUP BY b.p",
        "events_hourly_dense":
            "WITH a AS (SELECT user_id, CAST(date_diff('hour', "
            "TIMESTAMP '1970-01-01', date_trunc('hour', ts)) AS "
            "BIGINT) AS h, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS "
            "BIGINT) AS total FROM events GROUP BY 1, 2), "
            "mm AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM a "
            "GROUP BY user_id), "
            "r AS (SELECT user_id, UNNEST(generate_series(lo, hi)) AS "
            "h FROM mm) "
            "SELECT r.user_id, r.h, COALESCE(a.cnt, 0) AS cnt, "
            "COALESCE(a.total, 0) AS total FROM r LEFT JOIN a "
            "USING (user_id, h)",
        "embedding_dim_sums":
            "SELECT CAST(ord - 1 AS BIGINT) AS dim, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * 1000000 + 0.5) "
            "AS BIGINT)) AS BIGINT) AS s FROM (SELECT "
            "UNNEST(embedding) AS val, generate_subscripts(embedding, "
            "1) AS ord FROM embeddings) GROUP BY dim",
        "embedding_norms_by_label":
            "SELECT CAST(label AS BIGINT) AS label, "
            "CAST(SUM(sq) AS BIGINT) AS sq_s, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM (SELECT label, "
            "list_sum(list_transform(embedding, x -> "
            "CAST(FLOOR(CAST(x AS DOUBLE)*10000+0.5) AS BIGINT) * "
            "CAST(FLOOR(CAST(x AS DOUBLE)*10000+0.5) AS BIGINT))) AS "
            "sq FROM embeddings) GROUP BY label",
        "fuzzy_doc_pairs":
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist "
            "FROM documents a JOIN documents b ON a.source = b.source "
            "AND a.doc_id < b.doc_id "
            "WHERE levenshtein(a.text, b.text) <= 20",
        "word_bigrams":
            "WITH w AS (SELECT doc_id, ord, w FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(text), '\\s+')) AS w, "
            "generate_subscripts(string_split_regex(lower(text), "
            "'\\s+'), 1) AS ord FROM documents) WHERE w <> ''), "
            "b AS (SELECT w AS w1, LEAD(w) OVER (PARTITION BY doc_id "
            "ORDER BY ord) AS w2 FROM w) "
            "SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM b "
            "WHERE w2 IS NOT NULL GROUP BY w1, w2 "
            "HAVING COUNT(*) >= 3",
        "decontaminate_trigram":
            f"WITH w AS (SELECT doc_id, ord, w FROM (SELECT doc_id, "
            f"unnest(string_split_regex(lower(text), '\\s+')) AS w, "
            f"generate_subscripts(string_split_regex(lower(text), "
            f"'\\s+'), 1) AS ord FROM documents) WHERE w <> ''), "
            f"g AS (SELECT doc_id, w || ' ' || LEAD(w, 1) OVER dw || "
            f"' ' || LEAD(w, 2) OVER dw AS ng FROM w WINDOW dw AS "
            f"(PARTITION BY doc_id ORDER BY ord)), "
            f"ev AS (SELECT DISTINCT ng FROM g WHERE ((doc_id * "
            f"{_CHK_MUL}) % {_CHK_MOD}) % 1000 < 20 AND ng IS NOT "
            f"NULL), "
            f"tr AS (SELECT doc_id, ng FROM g WHERE ((doc_id * "
            f"{_CHK_MUL}) % {_CHK_MOD}) % 1000 >= 20 AND ng IS NOT "
            f"NULL) "
            f"SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
            f"CAST(SUM(CASE WHEN ng IN (SELECT ng FROM ev) THEN 1 "
            f"ELSE 0 END) AS BIGINT) AS n_hits "
            f"FROM tr GROUP BY doc_id",
        "doc_repetition":
            "WITH w AS (SELECT doc_id, ord, w FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(text), '\\s+')) AS w, "
            "generate_subscripts(string_split_regex(lower(text), "
            "'\\s+'), 1) AS ord FROM documents) WHERE w <> ''), "
            "t AS (SELECT doc_id, w || ' ' || LEAD(w, 1) OVER dw || "
            "' ' || LEAD(w, 2) OVER dw AS tg FROM w WINDOW dw AS "
            "(PARTITION BY doc_id ORDER BY ord)) "
            "SELECT doc_id, CAST(COUNT(tg) AS BIGINT) AS n_grams, "
            "CAST(COUNT(DISTINCT tg) AS BIGINT) AS n_distinct, "
            "CAST((COUNT(tg) - COUNT(DISTINCT tg)) * 1000000 // "
            "COUNT(tg) AS BIGINT) AS rep_ppm FROM t WHERE tg IS NOT "
            "NULL GROUP BY doc_id",
        "vocabulary_jaccard":
            "WITH sw AS (SELECT DISTINCT source, w FROM (SELECT "
            "source, unnest(string_split_regex(lower(text), '\\s+')) "
            "AS w FROM documents) WHERE w <> ''), "
            "sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM "
            "sw GROUP BY 1), "
            "ix AS (SELECT a.source AS source_a, b.source AS source_b,"
            " CAST(COUNT(*) AS BIGINT) AS inter FROM sw a JOIN sw b ON"
            " a.w = b.w AND a.source < b.source GROUP BY 1, 2) "
            "SELECT source_a, source_b, inter, "
            "na.n + nb.n - inter AS uni, "
            "CAST(inter * 1000000 // (na.n + nb.n - inter) AS BIGINT) "
            "AS jaccard_ppm FROM ix "
            "JOIN sz na ON na.source = source_a "
            "JOIN sz nb ON nb.source = source_b",
        "doc_lm_scores":
            "WITH w AS (SELECT doc_id, ord, w FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(text), '\\s+')) AS w, "
            "generate_subscripts(string_split_regex(lower(text), "
            "'\\s+'), 1) AS ord FROM documents) WHERE w <> ''), "
            "b AS (SELECT doc_id, w AS w1, LEAD(w) OVER (PARTITION BY "
            "doc_id ORDER BY ord) AS w2 FROM w), "
            "bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM b WHERE w2 IS NOT NULL GROUP BY 1, 2), "
            "c1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1 FROM bg "
            "GROUP BY 1) "
            "SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
            "CAST(SUM(CAST(FLOOR(ln(CAST(bg.c AS DOUBLE) / c1.c1) * "
            "1000000 + 0.5) AS BIGINT)) AS BIGINT) AS logprob_micro "
            "FROM b JOIN bg ON b.w1 = bg.w1 AND b.w2 = bg.w2 "
            "JOIN c1 ON bg.w1 = c1.w1 WHERE b.w2 IS NOT NULL "
            "GROUP BY b.doc_id",
        "lineitem_metrics_long":
            "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS "
            "l_linenumber, 'quantity' AS metric, CAST(FLOOR("
            "l_quantity * 100 + 0.5) AS BIGINT) AS value_c FROM "
            "lineitem UNION ALL SELECT l_orderkey, CAST(l_linenumber "
            "AS BIGINT), 'extendedprice', CAST(FLOOR(l_extendedprice "
            "* 100 + 0.5) AS BIGINT) FROM lineitem UNION ALL SELECT "
            "l_orderkey, CAST(l_linenumber AS BIGINT), 'discount', "
            "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) FROM "
            "lineitem",
        "user_event_entropy":
            "WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS "
            "BIGINT) AS c FROM events GROUP BY 1, 2), "
            "u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n, "
            "CAST(SUM(CAST(FLOOR(c * ln(c) * 1000000 + 0.5) AS "
            "BIGINT)) AS BIGINT) AS s_clogc FROM c GROUP BY 1) "
            "SELECT user_id, n, s_clogc, CAST((CAST(FLOOR(ln(n) * "
            "1000000 + 0.5) AS BIGINT) * n - s_clogc) // n AS BIGINT) "
            "AS entropy_micro FROM u",
        "user_time_weighted_value":
            "WITH e AS (SELECT user_id, epoch_us(ts) AS t, "
            "CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS v, "
            "LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY "
            "ts, event_id) AS nt FROM events) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(MAX(t) - MIN(t) AS BIGINT) AS dur_us, "
            "CAST(SUM(CASE WHEN nt IS NOT NULL THEN v * (nt - t) "
            "ELSE 0 END) AS BIGINT) AS num_s, "
            "CAST(SUM(CASE WHEN nt IS NOT NULL THEN v * (nt - t) "
            "ELSE 0 END) * 100 // (MAX(t) - MIN(t)) AS BIGINT) AS "
            "twa_micro FROM e GROUP BY user_id "
            "HAVING COUNT(*) >= 2 AND MAX(t) > MIN(t)",
        "session_funnel":
            "WITH g AS (SELECT user_id, ts, event_type, CASE WHEN ts "
            "- LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > "
            "INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS brk FROM "
            "events), s AS (SELECT user_id, ts, event_type, CAST(SUM("
            "brk) OVER (PARTITION BY user_id ORDER BY ts ROWS "
            "UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM g), "
            "f AS (SELECT user_id, session_id, MIN(CASE WHEN "
            "event_type = 'signup' THEN ts END) AS signup_ts, "
            "MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS "
            "purchase_ts FROM s GROUP BY 1, 2) "
            "SELECT user_id, session_id, signup_ts, purchase_ts "
            "FROM f WHERE signup_ts < purchase_ts",
        "event_dow_chi2":
            "WITH b AS (SELECT event_type AS et, CAST((CAST(FLOOR("
            "epoch(ts) / 86400) AS BIGINT) + 4) % 7 AS BIGINT) AS dow "
            "FROM events), "
            "c AS (SELECT et, dow, CAST(COUNT(*) AS BIGINT) AS o "
            "FROM b GROUP BY 1, 2), "
            "grid AS (SELECT e.et, d.dow, COALESCE(c.o, 0) AS o FROM "
            "(SELECT DISTINCT et FROM c) e CROSS JOIN (SELECT "
            "DISTINCT dow FROM c) d LEFT JOIN c ON c.et = e.et AND "
            "c.dow = d.dow), "
            "rt AS (SELECT et, CAST(SUM(o) AS BIGINT) AS r FROM grid "
            "GROUP BY 1), ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) "
            "AS cc FROM grid GROUP BY 1), "
            "n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM grid), "
            "oe AS (SELECT grid.o AS o, (rt.r * ct.cc) / CAST(n.n AS "
            "DOUBLE) AS e FROM grid, rt, ct, n WHERE grid.et = rt.et "
            "AND grid.dow = ct.dow), "
            "t AS (SELECT CAST(FLOOR((o - e) * (o - e) / e * 1000000 "
            "+ 0.5) AS BIGINT) AS term FROM oe) "
            "SELECT (SELECT n FROM n) AS n, "
            "CAST(((SELECT COUNT(*) FROM rt) - 1) * ((SELECT COUNT(*) "
            "FROM ct) - 1) AS BIGINT) AS dof, "
            "CAST(SUM(term) AS BIGINT) AS chi2_micro FROM t",
        "label_centroid_dots":
            "WITH e AS (SELECT label, ord AS dim, CAST(SUM(CAST(FLOOR("
            "CAST(val AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS BIGINT)"
            " AS s, CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM "
            "(SELECT vec_id, label, unnest(embedding) AS val, "
            "generate_subscripts(embedding, 1) AS ord FROM embeddings)"
            " GROUP BY 1, 2) "
            "SELECT CAST(a.label AS BIGINT) AS label_a, "
            "CAST(b.label AS BIGINT) AS label_b, a.n AS n_a, "
            "b.n AS n_b, CAST(SUM(a.s * b.s) AS BIGINT) AS dot_s "
            "FROM e a JOIN e b ON a.dim = b.dim AND a.label < b.label "
            "GROUP BY 1, 2, 3, 4",
        "nation_trade_flows":
            "SELECT CAST(s_nationkey AS BIGINT) AS supp_nation, "
            "CAST(c_nationkey AS BIGINT) AS cust_nation, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) "
            "* 1000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND "
            "o_orderdate < TIMESTAMP '1998-01-01' AND "
            "s_nationkey <> c_nationkey GROUP BY 1, 2",
        "embedding_gram":
            "WITH e AS (SELECT vec_id, CAST(ord - 1 AS BIGINT) AS "
            "dim, CAST(FLOOR(CAST(val AS DOUBLE) * 10000 + 0.5) AS "
            "BIGINT) AS v FROM (SELECT vec_id, unnest(embedding) AS "
            "val, generate_subscripts(embedding, 1) AS ord FROM "
            "embeddings)) "
            "SELECT a.dim AS dim_a, b.dim AS dim_b, "
            "CAST(SUM(a.v * b.v) AS BIGINT) AS s, "
            "CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n "
            "FROM e a JOIN e b ON a.vec_id = b.vec_id AND "
            "a.dim <= b.dim GROUP BY 1, 2",
        "embedding_cov_fixed":
            "WITH e AS (SELECT vec_id, CAST(ord - 1 AS BIGINT) AS "
            "dim, CAST(FLOOR(CAST(val AS DOUBLE) * 10000 + 0.5) AS "
            "BIGINT) AS v FROM (SELECT vec_id, unnest(embedding) AS "
            "val, generate_subscripts(embedding, 1) AS ord FROM "
            "embeddings)), "
            "g AS (SELECT a.dim AS da, b.dim AS db, "
            "CAST(SUM(a.v * b.v) AS HUGEINT) AS s "
            "FROM e a JOIN e b ON a.vec_id = b.vec_id AND "
            "a.dim <= b.dim GROUP BY 1, 2), "
            "sv AS (SELECT dim, CAST(SUM(v) AS HUGEINT) AS sv "
            "FROM e GROUP BY dim), "
            "nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n "
            "FROM embeddings) "
            "SELECT g.da AS dim_a, g.db AS dim_b, "
            "CAST((SELECT n FROM nn) * g.s - sa.sv * sb.sv AS BIGINT) "
            "AS cov_num FROM g "
            "JOIN sv sa ON sa.dim = g.da JOIN sv sb ON sb.dim = g.db",
        "orders_price_ranked":
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY CAST(FLOOR("
            "o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey) "
            "AS BIGINT) AS pos, o_orderkey, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents "
            "FROM orders",
        "order_upsert_apply":
            "WITH old AS (SELECT o_orderkey AS k, CAST(FLOOR("
            "o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders"
            " WHERE o_orderkey % 10 <> 0), "
            "ch AS (SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * "
            "100 + 0.5) AS BIGINT) + 1000 AS cents, CASE WHEN "
            "o_orderkey % 9 = 0 THEN 1 ELSE 0 END AS del FROM orders "
            "WHERE o_orderkey % 7 = 0 OR o_orderkey % 9 = 0) "
            "SELECT k, cents FROM old WHERE k NOT IN (SELECT k FROM "
            "ch) UNION ALL SELECT k, cents FROM ch WHERE del = 0",
        "table_row_counts":
            "SELECT * FROM (VALUES "
            "('region.parquet', (SELECT COUNT(*) FROM region)), "
            "('nation.parquet', (SELECT COUNT(*) FROM nation)), "
            "('customer.parquet', (SELECT COUNT(*) FROM customer)), "
            "('supplier.parquet', (SELECT COUNT(*) FROM supplier)), "
            "('part.parquet', (SELECT COUNT(*) FROM part)), "
            "('orders.parquet', (SELECT COUNT(*) FROM orders)), "
            "('lineitem.parquet', (SELECT COUNT(*) FROM lineitem)), "
            "('events.parquet', (SELECT COUNT(*) FROM events)), "
            "('documents.parquet', (SELECT COUNT(*) FROM documents)), "
            "('embeddings.parquet', (SELECT COUNT(*) FROM embeddings))"
            ") AS t(file, rows)",
        "order_snapshot_diff":
            "WITH o AS (SELECT o_orderkey AS k, CAST(FLOOR("
            "o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders "
            "WHERE o_orderkey % 10 <> 0), "
            "n AS (SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice "
            "* 100 + 0.5) AS BIGINT) + CASE WHEN o_orderkey % 7 = 0 "
            "THEN 1000 ELSE 0 END AS v FROM orders "
            "WHERE o_orderkey % 10 <> 1) "
            "SELECT COALESCE(o.k, n.k) AS o_orderkey, "
            "CASE WHEN o.k IS NULL THEN 'added' "
            "WHEN n.k IS NULL THEN 'removed' "
            "WHEN o.v <> n.v THEN 'changed' ELSE 'same' END AS status "
            "FROM o FULL OUTER JOIN n ON o.k = n.k",
        "order_price_share":
            "SELECT o_orderkey, CAST(CAST(FLOOR(o_totalprice * 100 "
            "+ 0.5) AS BIGINT) * 1000000 // SUM(CAST(FLOOR("
            "o_totalprice * 100 + 0.5) AS BIGINT)) OVER (PARTITION BY "
            "o_orderpriority) AS BIGINT) AS share_ppm FROM orders",
        "events_lag_lead":
            "SELECT user_id, event_id, COALESCE(LAG(CAST(FLOOR(value "
            "* 10000 + 0.5) AS BIGINT)) OVER w, -1) AS lag_v, "
            "COALESCE(LEAD(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT))"
            " OVER w, -1) AS lead_v FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
        "order_rollup":
            "SELECT COALESCE(o_orderpriority, '(all)') AS "
            "o_orderpriority, COALESCE(o_orderstatus, '(all)') AS "
            "o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS s FROM orders "
            "GROUP BY ROLLUP(o_orderpriority, o_orderstatus)",
        "grouped_median":
            "SELECT source, CAST(FLOOR(median(n_chars) * 10 + 0.5) "
            "AS BIGINT) AS med FROM documents GROUP BY source",
        "order_price_quantiles":
            "SELECT o_orderpriority, "
            + ", ".join(
                f"CAST(FLOOR(quantile_cont(CAST(FLOOR(o_totalprice * 100 "
                f"+ 0.5) AS BIGINT), {q}) * 4 + 0.5) AS BIGINT) AS q{p}"
                for q, p in ((0.25, 25), (0.5, 50), (0.75, 75)))
            + " FROM orders GROUP BY o_orderpriority",
        "stratified_sample":
            f"SELECT doc_id, source FROM documents WHERE "
            f"((doc_id * {_CHK_MUL}) % {_CHK_MOD}) % 1000 < "
            "CASE source WHEN 'web' THEN 500 WHEN 'wiki' THEN 250 "
            "ELSE 100 END",
        "temperature_mix":
            "WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM documents GROUP BY lang), "
            "w AS (SELECT lang, n, CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) "
            "* 1048576) AS BIGINT) AS w FROM c), "
            "t AS (SELECT lang, n, CAST(LEAST(1000, "
            f"CAST((1000::HUGEINT * {_MIX_BUDGET} * w) // "
            "((SELECT CAST(SUM(w) AS HUGEINT) FROM w) * n) AS BIGINT)) "
            "AS BIGINT) AS rate_pm FROM w) "
            "SELECT t.lang, t.rate_pm, "
            "CAST(COUNT(d.doc_id) AS BIGINT) AS kept "
            "FROM t LEFT JOIN documents d ON d.lang = t.lang AND "
            f"((d.doc_id * {_CHK_MUL}) % {_CHK_MOD}) % 1000 < t.rate_pm "
            "GROUP BY t.lang, t.rate_pm",
        "events_hopping_window":
            "WITH e AS (SELECT user_id, "
            "time_bucket(INTERVAL '30 minutes', ts) AS b, "
            "CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS v FROM events), "
            "w AS (SELECT user_id, b AS window_start, v FROM e "
            "UNION ALL SELECT user_id, b - INTERVAL 30 MINUTE, v FROM e) "
            "SELECT user_id, window_start, COUNT(*) AS cnt, "
            "CAST(SUM(v) AS BIGINT) AS total FROM w GROUP BY 1, 2",
        "revenue_by_region":
            "SELECT r_name, CAST(SUM(CAST(FLOOR(l_extendedprice * "
            "(1 - l_discount) * 1000 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue, COUNT(*) AS cnt "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name",
        # minhash/simhash/embedding near-dup, text_analysis,
        # validation_suite_synthetic, tdigest_quantiles, HLL: no oracle
        # by design (sketch/heuristic/non-SQL ops) → rows-only check.
    }
