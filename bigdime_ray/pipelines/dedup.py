"""Deduplication pipelines for training-data curation.

Engine-new operators (beyond the reference's validators — first-class
requirements for a 100 TB training-data engine):

- ``exact_dedup``        — content-hash partition + per-group representative
                           (hash shuffle of narrow (hash, id) projection only)
- ``minhash_lsh_dedup``  — word-shingle MinHash signatures → banded LSH
                           buckets (groupby shuffle) → candidate pairs →
                           signature-estimated Jaccard verify → connected
                           components
- ``simhash_dedup``      — 64-bit SimHash + 16-bit-chunk LSH for
                           near-dup by small Hamming distance
- ``ngram_jaccard``      — exact n-gram Jaccard verification for a
                           candidate pair list
- ``embedding_near_dup`` — random-hyperplane LSH buckets over an
                           embedding column → in-bucket cosine pairs

Scale notes (documented partitioning assumptions): signatures/bands are
computed vectorized per batch (numpy ``minimum.reduceat`` over flattened
shingle hashes — no Python loop over rows); only narrow
(id, band, hash) rows enter the shuffles. Candidate handling dispatches
on the candidate-pair count (``cc_max_driver_pairs``): below it, pairs
are verified and clustered on the driver (union-find); above it, the
>memory path keeps everything a Dataset — join-based signature verify
and ``label_propagation_components`` (hash-to-min over co-partitioned
join + groupby-min rounds) — tested equal to the driver path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from bigdime_ray.functions.hashing import (hash_string_column, mix64,
                                           u64_to_i64)

_ROT = np.uint64(21)
_64 = np.uint64(64)


def _rotl(x: np.ndarray, r: np.uint64) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (x << r) | (x >> (_64 - r))


def _seed_hashes(k: int, seed: int = 0x5EED) -> np.ndarray:
    return mix64(np.arange(seed, seed + k, dtype=np.uint64))


# ---------------------------------------------------------------- exact

def add_fingerprint_column(batch: pa.Table, col: str = "text",
                           out: str = "fingerprint",
                           normalize: bool = False) -> pa.Table:
    """64-bit content fingerprint. ``normalize=False`` (default) hashes
    the RAW text — byte-exact dedup, matching the GROUP BY text oracle;
    ``normalize=True`` lowercases + collapses whitespace first (the
    fuzzier variant some curation pipelines want — opt-in, so "exact"
    means exact)."""
    v = batch[col]
    if normalize:
        v = pc.replace_substring_regex(pc.utf8_lower(v), r"\s+", " ")
    return batch.append_column(out, pa.array(u64_to_i64(
        hash_string_column(v))))


def exact_dedup_groups(ds: Dataset, col: str = "text",
                       id_col: str = "doc_id",
                       normalize: bool = False,
                       keep_fingerprint: bool = False) -> Dataset:
    """One row per distinct content: (keep_id = min id, cnt).

    hash-partition + per-group first — only (fingerprint, id) is
    shuffled, never the payload. 64-bit fingerprint collision odds are
    ~n²/2⁶⁵ (negligible below ~10⁹ distinct docs; widen to 128 bits by
    salting twice if that matters). ``keep_fingerprint=True`` retains
    the fingerprint column (the join-path filter needs it).
    """
    proj = ds.map_batches(lambda b: add_fingerprint_column(
        b, col, normalize=normalize),
                          batch_format="pyarrow", zero_copy_batch=True
                          ).select_columns(["fingerprint", id_col])
    out = (proj.groupby("fingerprint")
           .aggregate(Min(id_col, alias_name="keep_id"),
                      Count(alias_name="cnt")))
    return out if keep_fingerprint else out.drop_columns(["fingerprint"])


DEDUP_BROADCAST_MAX_IDS = 100_000_000  # ~800 MB of int64 keep ids


def exact_dedup(ds: Dataset, col: str = "text",
                id_col: str = "doc_id", normalize: bool = False,
                strategy: str = "auto") -> Dataset:
    """Filter to one representative row (min id) per distinct content.

    Strategies for the second (filter) pass, auto-dispatched on the
    distinct-group count (VERDICT r2 #3):

    - ``broadcast`` — driver pull of the keep-id set + ``is_in`` filter;
      no payload shuffle at all. Right while the keep ids fit the driver
      (≤ ``DEDUP_BROADCAST_MAX_IDS``).
    - ``join`` — the >memory path: the (fingerprint, keep_id) table
      stays a Dataset; rows gain their fingerprint and co-partition-join
      it, keeping rows whose id == keep_id. The payload moves through
      ONE hash shuffle (unavoidable without broadcast), the keep side
      stays narrow. Equivalence with broadcast is pinned in
      tests/test_dedup.py.
    """
    if strategy not in ("auto", "broadcast", "join"):
        raise ValueError("strategy must be auto|broadcast|join")
    keep = exact_dedup_groups(ds, col, id_col, normalize=normalize,
                              keep_fingerprint=True).materialize()
    if strategy == "auto":
        strategy = ("broadcast" if keep.count() <= DEDUP_BROADCAST_MAX_IDS
                    else "join")

    if strategy == "broadcast":
        keep_ids = pa.array([r["keep_id"] for r in
                             keep.select_columns(["keep_id"]).take_all()])

        def flt(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch[id_col],
                                         value_set=keep_ids))

        return ds.map_batches(flt, batch_format="pyarrow",
                              zero_copy_batch=True)

    # join path: narrow keep side, payload through one hash shuffle.
    # keep came through a groupby → drop its schemaless empty blocks
    # before the join (Ray hash-shuffle empty-block poison).
    from bigdime_ray.stages.shuffle import (default_join_partitions,
                                            drop_empty_blocks)
    keep_n = drop_empty_blocks(keep.map_batches(
        lambda b: pa.table({"__fp": b["fingerprint"],
                            "keep_id": b["keep_id"]}),
        batch_format="pyarrow").materialize())
    fds = ds.map_batches(lambda b: add_fingerprint_column(
        b, col, normalize=normalize),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = fds.join(keep_n, join_type="inner",
                      num_partitions=default_join_partitions(),
                      on=("fingerprint",), right_on=("__fp",))
    drop_cols = ["fingerprint", "keep_id"]

    def flt_join(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return batch
        hit = batch.filter(pc.equal(batch[id_col], batch["keep_id"]))
        return hit.drop_columns([c for c in drop_cols
                                 if c in hit.column_names])

    return joined.map_batches(flt_join, batch_format="pyarrow")


# ---------------------------------------------------------------- minhash

def _shingle_hashes(text: pa.Array | pa.ChunkedArray, w: int
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row word-``w``-gram shingle hashes, flattened.

    Returns (flat_shingle_hashes u64, row_starts, row_counts). Rows with
    fewer than ``w`` words contribute one whole-row shingle.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    norm = pc.utf8_lower(text)
    words = pc.split_pattern_regex(norm, r"\s+")
    n_words = (pc.fill_null(pc.list_value_length(words), 0)
               .to_numpy(zero_copy_only=False).astype(np.int64))
    flat = pc.list_flatten(words)
    wh = hash_string_column(flat)
    n = len(text)
    word_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_words, out=word_starts[1:])

    # rolling combine: sh[i] = mix(h[i] ^ rotl(h[i+1],21) ^ rotl(h[i+2],42)...)
    total = len(wh)
    acc = wh.copy()
    for j in range(1, w):
        shifted = np.zeros(total, dtype=np.uint64)
        if total > j:
            shifted[:total - j] = _rotl(wh[j:], np.uint64((_ROT * j) % 63 or 1))
        acc ^= shifted
    sh = mix64(acc)

    # valid shingle positions: window stays inside the row
    counts = np.maximum(n_words - w + 1, 0)
    short = (n_words > 0) & (n_words < w)
    row_hash = hash_string_column(norm)  # whole-row fallback shingle
    out_counts = np.where(short, 1, counts)
    out_counts = np.where(n_words == 0, 1, out_counts)  # empty row → 1 sentinel
    out_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_starts[1:])
    out = np.empty(int(out_starts[-1]), dtype=np.uint64)
    # vectorized gather of valid windows
    full_rows = np.nonzero(counts > 0)[0]
    if len(full_rows):
        reps = counts[full_rows]
        # positions within each row 0..counts-1
        pos_in_row = (np.arange(int(reps.sum()), dtype=np.int64)
                      - np.repeat(np.cumsum(reps) - reps, reps))
        src = np.repeat(word_starts[full_rows], reps) + pos_in_row
        dst_idx = np.repeat(out_starts[full_rows], reps) + pos_in_row
        out[dst_idx] = sh[src]
    # fallbacks
    fb = np.nonzero(short | (n_words == 0))[0]
    if len(fb):
        out[out_starts[fb]] = row_hash[fb]
    return out, out_starts, out_counts


def minhash_signatures(text: pa.Array | pa.ChunkedArray, num_perm: int = 128,
                       shingle_w: int = 3, seed: int = 0x5EED) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix, vectorized."""
    sh, starts, counts = _shingle_hashes(text, shingle_w)
    n = len(counts)
    seeds = _seed_hashes(num_perm, seed)
    sig = np.empty((n, num_perm), dtype=np.uint64)
    if len(sh) == 0:
        sig[:] = np.uint64(0xFFFFFFFFFFFFFFFF)
        return sig
    safe_starts = np.minimum(starts[:-1], len(sh) - 1)
    for i in range(num_perm):
        h = mix64(sh ^ seeds[i])
        m = np.minimum.reduceat(h, safe_starts)
        m[counts == 0] = np.uint64(0xFFFFFFFFFFFFFFFF)
        sig[:, i] = m
    return sig


def _band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) uint64 — one hash per signature band."""
    n, k = sig.shape
    assert k % bands == 0, "num_perm must be divisible by bands"
    r = k // bands
    chunk = sig.reshape(n, bands, r)
    acc = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(r):
            acc = mix64(acc ^ _rotl(chunk[:, :, j], np.uint64(17)))
    return acc


@dataclass
class NearDupResult:
    """Driver path fills the DataFrames; the >memory distributed path
    additionally carries the full results as Datasets (``pairs_ds`` /
    ``clusters_ds``) with the DataFrames holding a bounded sample."""

    pairs: pd.DataFrame      # columns: id_a, id_b, similarity
    clusters: pd.DataFrame   # columns: id, rep  (rep = min id of component)
    candidate_pairs: int = 0
    capped_buckets: int = 0
    pairs_ds: "Dataset | None" = None
    clusters_ds: "Dataset | None" = None


def label_propagation_components(pairs, id_a: str = "id_a",
                                 id_b: str = "id_b", max_iter: int = 50,
                                 num_partitions: int | None = None,
                                 checkpoint_dir: str | None = None,
                                 checkpoint_token: str = "") -> Dataset:
    """Distributed connected components: hash-to-min label propagation.

    The >memory alternative to driver union-find (VERDICT r1 item 3):
    edges and labels stay Ray Datasets throughout; each round is one
    co-partitioned join (edges ⋈ labels on src) + a groupby-min, so a
    task's working set is one hash partition of the graph, never the
    whole edge list. Each round propagates the component minimum one hop,
    so rounds ≈ component diameter (near-dup clusters are shallow stars:
    2–4 rounds in practice). Terminates exactly — stops the first round
    no label changes. Returns Dataset(id, rep), rep = component min —
    identical to ``_union_find_clusters`` (equality-tested in
    tests/test_dedup.py).

    ``checkpoint_dir`` makes a multi-hour clustering run RESUMABLE
    (VERDICT r2 #4): each round's label table is written as parquet
    (write-temp + rename, then an atomic state-JSON update — the
    ``state.manifest`` discipline), so a killed run restarts from its
    last completed round instead of round 0. Resume is refused when
    ``checkpoint_token`` (default: edge count + id type) doesn't match —
    a different graph never silently adopts stale labels. On a multi-node
    cluster point this at shared storage.
    """
    import json
    import os
    import shutil

    import ray.data as rd

    from bigdime_ray.stages.shuffle import drop_empty_blocks, ensure_schema

    if num_partitions is None:
        from bigdime_ray.stages.shuffle import default_join_partitions
        num_partitions = default_join_partitions()
    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_pandas(pairs[[id_a, id_b]].reset_index(drop=True))

    def sym(b: pa.Table) -> pa.Table:
        fwd = pa.table({"src": b[id_a], "dst": b[id_b]})
        rev = pa.table({"src": b[id_b], "dst": b[id_a]})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    edges = drop_empty_blocks(
        pairs.map_batches(sym, batch_format="pyarrow",
                          zero_copy_batch=True).materialize())
    id_type = _arrow_type(edges, "src")
    lbl_schema = pa.schema([("id", id_type), ("lbl", id_type)])
    old_schema = pa.schema([("id", id_type), ("lbl_old", id_type)])

    def guarded(schema: pa.Schema, build):
        stable = ensure_schema(schema)
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or b.num_columns == 0:
                return schema.empty_table()
            return stable(build(b))
        return fn

    # ----- checkpoint plumbing (no-op when checkpoint_dir is None)
    state_path = (os.path.join(checkpoint_dir, "cc_state.json")
                  if checkpoint_dir else None)
    token = checkpoint_token
    if checkpoint_dir and not token:
        # order-independent content fingerprint of the edge set (one
        # narrow pass — negligible vs the join rounds): edge count alone
        # would let a different graph of equal size adopt stale labels
        from bigdime_ray.functions.hashing import column_hashes

        def _fp(b: pa.Table) -> pa.Table:
            with np.errstate(over="ignore"):
                h = mix64(column_hashes(b["src"]) ^
                          _rotl(column_hashes(b["dst"]), np.uint64(31)))
                acc = np.uint64(h.sum())
            return pa.table({"h": pa.array([int(acc)], type=pa.uint64())})

        parts = edges.map_batches(_fp, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
        with np.errstate(over="ignore"):
            fp = int(np.sum(np.array([r["h"] for r in parts],
                                     dtype=np.uint64), dtype=np.uint64))
        token = f"{edges.count()}|{id_type}|{fp:x}"

    def _save_round(r: int, labels_ds: Dataset, converged: bool) -> None:
        if not checkpoint_dir:
            return
        rdir = os.path.join(checkpoint_dir, f"labels_r{r:05d}")
        tmp = rdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        labels_ds.write_parquet(tmp)
        shutil.rmtree(rdir, ignore_errors=True)
        os.rename(tmp, rdir)
        stmp = state_path + ".tmp"
        with open(stmp, "w") as f:
            json.dump({"round": r, "converged": converged,
                       "token": token}, f)
        os.replace(stmp, state_path)  # atomic: state always names a
        # fully-written round; a kill mid-write resumes one round back
        prev = os.path.join(checkpoint_dir, f"labels_r{r - 1:05d}")
        shutil.rmtree(prev, ignore_errors=True)

    start_round, resumed_labels, converged = 0, None, False
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        if os.path.exists(state_path):
            with open(state_path) as f:
                st = json.load(f)
            if st.get("token") == token:
                start_round = int(st["round"]) + 1
                converged = bool(st.get("converged"))
                resumed_labels = drop_empty_blocks(rd.read_parquet(
                    os.path.join(checkpoint_dir,
                                 f"labels_r{st['round']:05d}"))
                    .map_batches(ensure_schema(lbl_schema),
                                 batch_format="pyarrow").materialize())

    if resumed_labels is not None:
        labels = resumed_labels
    else:
        # initial label: min(self, min neighbor) — one groupby, no join
        labels = drop_empty_blocks(
            edges.groupby("src").aggregate(Min("dst", alias_name="lbl"))
            .map_batches(guarded(lbl_schema, lambda b: pa.table({
                "id": b["src"],
                "lbl": pc.min_element_wise(b["src"], b["lbl"])})),
                batch_format="pyarrow").materialize())

    for r in range(start_round, max_iter):
        if converged:
            break
        msgs = edges.join(labels, join_type="inner",
                          num_partitions=num_partitions,
                          on=("src",), right_on=("id",))
        recv = msgs.map_batches(
            guarded(lbl_schema,
                    lambda b: pa.table({"id": b["dst"], "lbl": b["lbl"]})),
            batch_format="pyarrow")
        new = drop_empty_blocks(
            recv.union(labels).groupby("id")
            .aggregate(Min("lbl", alias_name="lbl"))
            .map_batches(ensure_schema(lbl_schema),
                         batch_format="pyarrow").materialize())
        changed = (new.join(
            labels.map_batches(
                guarded(old_schema, lambda b: pa.table(
                    {"id": b["id"], "lbl_old": b["lbl"]})),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions, on=("id",))
            .filter(expr="lbl != lbl_old").count())
        labels = new
        converged = changed == 0
        _save_round(r, labels, converged)
        if converged:
            break
    if not converged:
        # never return silently-split components: a diameter > max_iter
        # chain would leave intermediate labels in place
        raise RuntimeError(
            f"label propagation did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter) — raise max_iter")
    return labels.map_batches(
        guarded(pa.schema([("id", id_type), ("rep", id_type)]),
                lambda b: pa.table({"id": b["id"], "rep": b["lbl"]})),
        batch_format="pyarrow")


def _union_find_clusters(pairs: list[tuple], ids: set) -> pd.DataFrame:
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [{"id": i, "rep": find(i)} for i in sorted(ids)]
    return pd.DataFrame(rows, columns=["id", "rep"])


MAX_SAMPLED_PAIRS = 100_000  # DataFrame sample cap on the distributed path


def _arrow_type(ds: Dataset, name: str) -> pa.DataType:
    """Arrow type of a column whether the blocks are Arrow or pandas
    (map_groups with batch_format="pandas" yields pandas blocks, whose
    schema exposes numpy dtypes)."""
    sch = ds.schema().base_schema
    if isinstance(sch, pa.Schema):
        return sch.field(name).type
    t = sch.types[sch.names.index(name)]
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()  # pandas object dtype → string ids


def _lsh_candidate_pairs(ds: Dataset, text_col: str, id_col: str,
                         num_perm: int, bands: int, shingle_w: int,
                         bucket_cap: int) -> Dataset:
    """Shared LSH candidate generator (minhash + ngram-jaccard verify
    paths): signatures → (id, band, band_hash) rows → bucketed groupby →
    materialized candidate pair Dataset (id_a, id_b, capped)."""

    def to_bands(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch[text_col], num_perm, shingle_w)
        bh = _band_hashes(sig, bands)
        n = batch.num_rows
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "bh": pa.array(u64_to_i64(bh.reshape(-1))),
        })

    band_rows = ds.map_batches(to_bands, batch_format="pyarrow",
                               zero_copy_batch=True)

    def chunk_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized singleton-bucket elimination FIRST (the vast
        # majority of (band, bh) buckets hold one id — looping Ray or
        # pandas groups over all of them cost ~30 s at 5k docs); the
        # pair loop then only visits genuine collision buckets
        df = df.drop(columns=["__bucket"])
        sizes = df.groupby(["band", "bh"], sort=False)["bh"] \
            .transform("size")
        df = df[sizes >= 2]
        out_a, out_b, out_f = [], [], []
        for _, g in df.groupby(["band", "bh"], sort=False):
            ids = sorted(g[id_col].unique())
            if len(ids) < 2:
                continue
            capped = len(ids) > bucket_cap
            ids = ids[:bucket_cap]
            a, b = zip(*[(x, y) for i, x in enumerate(ids)
                         for y in ids[i + 1:]])
            out_a.extend(a)
            out_b.extend(b)
            # flag only the FIRST pair of a capped bucket → sum == #buckets
            out_f.extend([1 if capped else 0] + [0] * (len(a) - 1))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b,
                             "capped": out_f})

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return (add_hash_bucket(band_rows, "bh", 32)
            .groupby("__bucket")
            .map_groups(chunk_pairs, batch_format="pandas").materialize())


def minhash_lsh_dedup(ds: Dataset, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 128,
                      bands: int = 32, shingle_w: int = 3,
                      threshold: float = 0.7, bucket_cap: int = 64,
                      cc_max_driver_pairs: int = 5_000_000) -> NearDupResult:
    """MinHash + banded LSH near-duplicate detection.

    Pass 1 (map_batches): signatures → (id, band, band_hash) rows.
    Shuffle: groupby (band, band_hash); buckets ≥2 → candidate pairs
    (bucket capped at ``bucket_cap`` ids; cap hits are reported, not
    silent). Candidate handling auto-dispatches on the candidate count:
    ≤ ``cc_max_driver_pairs`` → signatures re-derived for candidate ids
    only (broadcast semi-join), driver verify + union-find; above it →
    the >memory path: full (id, sig) Dataset, two co-partitioned joins
    to attach sig_a/sig_b, vectorized verify in map_batches, and
    distributed ``label_propagation_components``.
    """
    pair_ds = _lsh_candidate_pairs(ds, text_col, id_col, num_perm, bands,
                                   shingle_w, bucket_cap)
    n_pair_rows = pair_ds.count()
    if n_pair_rows == 0:
        return NearDupResult(pd.DataFrame({"id_a": [], "id_b": [],
                                           "similarity": []}),
                             pd.DataFrame({"id": [], "rep": []}), 0, 0)

    def all_sigs(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch[text_col], num_perm, shingle_w)
        return pa.table({id_col: batch[id_col],
                         "sig": pa.array([s.tobytes() for s in sig],
                                         type=pa.binary())})

    if n_pair_rows > cc_max_driver_pairs:
        return _minhash_distributed(ds, pair_ds, all_sigs, id_col, num_perm,
                                    threshold)

    # ------------------------------------------------ driver path
    pair_rows = pair_ds.to_pandas()
    capped_buckets = int(pair_rows["capped"].sum())
    cand = pair_rows[["id_a", "id_b"]].drop_duplicates()
    id_set = pa.array(np.unique(np.concatenate(
        [cand.id_a.to_numpy(), cand.id_b.to_numpy()])))

    def sigs_for_candidates(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch[id_col], value_set=id_set))
        if hit.num_rows == 0:
            return pa.table({id_col: pa.array([], type=batch[id_col].type),
                             "sig": pa.array([], type=pa.binary())})
        return all_sigs(hit)

    sig_rows = ds.map_batches(sigs_for_candidates, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    # vectorized verify (VERDICT r3 #4): stack every candidate signature
    # into ONE (n_sigs, num_perm) uint64 matrix, map pair ids to row
    # positions with one hash-table pass (pandas reindex), and compare
    # in 256k-pair chunks — chunking bounds peak memory to ~2×256 MB of
    # gathered rows instead of 2×5 GB at the 5M-pair
    # cc_max_driver_pairs worst case. Micro-bench (BASELINE.md r4):
    # 31.8 s loop → 10.3 s (3.1×); the residual cost is the random
    # row gather (10 GB of memory traffic), which chunking cannot
    # remove, only bound.
    if sig_rows:
        sig_mat = np.frombuffer(
            b"".join(r["sig"] for r in sig_rows),
            dtype=np.uint64).reshape(len(sig_rows), num_perm)
        pos = pd.Series(np.arange(len(sig_rows)),
                        index=[r[id_col] for r in sig_rows])
        pos = pos[~pos.index.duplicated(keep="last")]
        ia = pos.reindex(cand.id_a).to_numpy(dtype=np.float64)
        ib = pos.reindex(cand.id_b).to_numpy(dtype=np.float64)
        ok = ~(np.isnan(ia) | np.isnan(ib))
        ia_i, ib_i = ia[ok].astype(np.int64), ib[ok].astype(np.int64)
        est = np.empty(len(ia_i), dtype=np.float64)
        chunk = 1 << 18
        for s in range(0, len(ia_i), chunk):
            e = min(s + chunk, len(ia_i))
            est[s:e] = (sig_mat[ia_i[s:e]]
                        == sig_mat[ib_i[s:e]]).mean(axis=1)
        m = est >= threshold
        ka = cand.id_a.to_numpy()[ok][m]
        kb = cand.id_b.to_numpy()[ok][m]
        keep = list(zip(ka, kb, est[m]))
        pairs = pd.DataFrame({"id_a": ka, "id_b": kb,
                              "similarity": est[m]})
    else:
        keep = []
        pairs = pd.DataFrame({"id_a": [], "id_b": [], "similarity": []})
    dup_ids = set(pairs.id_a) | set(pairs.id_b)
    clusters = _union_find_clusters(
        [(a, b) for a, b, _ in keep], dup_ids)
    return NearDupResult(pairs, clusters, int(len(cand)), capped_buckets)


def _verify_sig_pairs(num_perm: int, threshold: float):
    """map_batches fn: estimated Jaccard from attached sig_a/sig_b."""
    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # schema-less empty shuffle blocks: pin the id type to int64
        # (callers re-normalize with ensure_schema)
        t = (batch["id_a"].type if "id_a" in batch.column_names
             else pa.int64())
        empty = pa.table({"id_a": pa.array([], type=t),
                          "id_b": pa.array([], type=t),
                          "similarity": pa.array([], type=pa.float64())})
        if n == 0 or batch.num_columns == 0:
            return empty
        sa = np.frombuffer(b"".join(batch["sig_a"].to_pylist()),
                           dtype=np.uint64).reshape(n, num_perm)
        sb = np.frombuffer(b"".join(batch["sig_b"].to_pylist()),
                           dtype=np.uint64).reshape(n, num_perm)
        est = (sa == sb).mean(axis=1)
        m = est >= threshold
        if not m.any():
            return empty
        idx = pa.array(np.nonzero(m)[0])
        return pa.table({"id_a": batch["id_a"].take(idx),
                         "id_b": batch["id_b"].take(idx),
                         "similarity": pa.array(est[m])})
    return fn


def _minhash_distributed(ds: Dataset, pair_ds: Dataset, all_sigs,
                         id_col: str, num_perm: int,
                         threshold: float, verify=None) -> NearDupResult:
    """>memory candidate handling: everything stays a Dataset.
    ``verify`` overrides the signature-estimate kernel (ngram exact-set
    verify reuses this join plumbing with its own kernel)."""
    from bigdime_ray.stages.shuffle import drop_empty_blocks, ensure_schema

    id_type = _arrow_type(pair_ds, "id_a")
    capped_buckets = int(pair_ds.sum("capped") or 0)
    cand = drop_empty_blocks(
        pair_ds.groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="__nb"))
        .drop_columns(["__nb"])
        .map_batches(ensure_schema(pa.schema([("id_a", id_type),
                                              ("id_b", id_type)])),
                     batch_format="pyarrow").materialize())
    n_cand = cand.count()
    sigs = ds.map_batches(all_sigs, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def rename(col):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({"__id": b[id_col], col: b["sig"]})
        return fn

    from bigdime_ray.stages.shuffle import default_join_partitions
    nparts = default_join_partitions()
    # materialize + drop empties BETWEEN the two joins: chaining two
    # hash-shuffle joins in one streaming graph deadlocks on small CPU
    # counts, and join outputs can carry schemaless empty blocks that
    # poison the next join
    with_a = drop_empty_blocks(
        cand.join(sigs.map_batches(rename("sig_a"),
                                   batch_format="pyarrow"),
                  join_type="inner", num_partitions=nparts,
                  on=("id_a",), right_on=("__id",)).materialize())
    with_ab = with_a.join(sigs.map_batches(rename("sig_b"),
                                           batch_format="pyarrow"),
                          join_type="inner", num_partitions=nparts,
                          on=("id_b",), right_on=("__id",))
    verified = with_ab.map_batches(
        verify or _verify_sig_pairs(num_perm, threshold),
        batch_format="pyarrow"
    ).map_batches(
        ensure_schema(pa.schema([("id_a", id_type), ("id_b", id_type),
                                 ("similarity", pa.float64())])),
        batch_format="pyarrow").materialize()
    clusters_ds = label_propagation_components(verified).materialize()
    return NearDupResult(
        pairs=verified.limit(MAX_SAMPLED_PAIRS).to_pandas(),
        clusters=clusters_ds.limit(MAX_SAMPLED_PAIRS).to_pandas(),
        candidate_pairs=int(n_cand), capped_buckets=capped_buckets,
        pairs_ds=verified, clusters_ds=clusters_ds)


# ---------------------------------------------------------------- simhash

def simhash_signatures(text: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit SimHash per row over word hashes (bit-vote), vectorized."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
    n_words = (pc.fill_null(pc.list_value_length(words), 0)
               .to_numpy(zero_copy_only=False).astype(np.int64))
    wh = hash_string_column(pc.list_flatten(words))
    n = len(text)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_words, out=starts[1:])
    total = len(wh)
    sig = np.zeros(n, dtype=np.uint64)
    if total == 0:
        return sig
    nz = n_words > 0
    starts_nz = starts[:-1][nz]
    for bit in range(64):
        votes = ((wh >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
        s = np.zeros(n, dtype=np.int64)
        s[nz] = np.add.reduceat(votes, starts_nz)
        sig |= (s > 0).astype(np.uint64) << np.uint64(bit)
    return sig


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(len(x) if x.ndim else (), dtype=np.int64)
    for _ in range(64):
        cnt = cnt + (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def hamming_near_dup(sig_ds: Dataset, id_col: str = "doc_id",
                     sig_col: str = "sig", max_hamming: int = 3,
                     bucket_cap: int = 64,
                     cc_max_driver_pairs: int = 5_000_000
                     ) -> NearDupResult:
    """Generic Hamming-distance near-dup over PRECOMPUTED 64-bit
    signatures (``sig_col``: u64 stored as int64) — the LSH + verify
    machinery shared by SimHash text dedup and perceptual-hash media
    dedup. Chunk LSH with ``max_hamming + 1`` bands (pigeonhole: a
    pair within distance k differs in ≤ k bands, so it MATCHES in at
    least one of k+1 — recall is guaranteed, not probabilistic).
    Hamming verification runs INSIDE the bucket group task (signatures
    are already co-located there — nothing returns to the driver
    unverified); capped buckets are counted, not silent; clustering
    dispatches to distributed label propagation above
    ``cc_max_driver_pairs`` verified pairs."""
    num_chunks = max_hamming + 1
    if not 1 <= num_chunks <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    # proportional band bounds: band c covers bits
    # [c·64//k, (c+1)·64//k) — every band non-empty for ANY k ≤ 64
    # (the ceil-width layout ran past bit 64 for most k: negative
    # shifts crashed and zero-width bands bucketed everything together)
    bounds = [(c * 64 // num_chunks, (c + 1) * 64 // num_chunks)
              for c in range(num_chunks)]

    def to_chunks(batch: pa.Table) -> pa.Table:
        sig = (batch[sig_col].to_numpy(zero_copy_only=False)
               .astype(np.int64).view(np.uint64))
        n = batch.num_rows
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        chunks = np.empty((n, num_chunks), dtype=np.int64)
        for c, (lo, hi) in enumerate(bounds):
            chunks[:, c] = ((sig >> np.uint64(lo)) &
                            np.uint64((1 << (hi - lo)) - 1)) \
                .astype(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, num_chunks)),
            "chunk": pa.array(np.tile(
                np.arange(num_chunks, dtype=np.int32), n)),
            "ch": pa.array(chunks.reshape(-1)),
            "sig": pa.array(u64_to_i64(np.repeat(sig, num_chunks))),
        })

    rows = sig_ds.map_batches(to_chunks, batch_format="pyarrow",
                              zero_copy_batch=True)

    empty = pd.DataFrame({"id_a": [], "id_b": [], "similarity": [],
                          "capped": []})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        g = g.drop_duplicates(id_col).sort_values(id_col)
        capped = 1 if len(g) > bucket_cap else 0
        g = g.head(bucket_cap)
        ids = g[id_col].to_numpy()
        sigs = g["sig"].to_numpy().astype(np.int64).view(np.uint64)
        iu = np.triu_indices(len(ids), k=1)
        d = hamming64(sigs[iu[0]], sigs[iu[1]])
        m = d <= max_hamming
        out = pd.DataFrame({
            "id_a": ids[iu[0][m]], "id_b": ids[iu[1][m]],
            "similarity": 1.0 - d[m] / 64.0,
            "capped": np.zeros(int(m.sum()), dtype=np.int64)})
        if len(out):
            out.iloc[0, out.columns.get_loc("capped")] = capped
        elif capped:
            # capped bucket with zero surviving pairs still gets counted
            # — sentinel row, filtered out of the pair set downstream
            out = pd.DataFrame({"id_a": [ids[0]], "id_b": [ids[0]],
                                "similarity": [-1.0], "capped": [1]})
        return out

    def chunk_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized singleton elimination before the per-bucket loop
        # (same fix as minhash: looping all 4×2¹⁶ LSH buckets is the
        # dominant cost; only collision buckets need the pair kernel)
        sizes = df.groupby(["chunk", "ch"], sort=False)["ch"] \
            .transform("size")
        df = df[sizes >= 2]
        outs = [bucket_pairs(g)
                for _, g in df.groupby(["chunk", "ch"], sort=False)]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else empty

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return _verified_pairs_result(
        add_hash_bucket(rows, "ch", 32).groupby("__bucket")
        .map_groups(lambda df: chunk_pairs(df.drop(columns=["__bucket"])),
                    batch_format="pandas"),
        cc_max_driver_pairs)


def simhash_dedup(ds: Dataset, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  bucket_cap: int = 64,
                  cc_max_driver_pairs: int = 5_000_000) -> NearDupResult:
    """Near-dup by SimHash: 64-bit text signatures →
    ``hamming_near_dup`` (chunk LSH + in-bucket verify; 4×16-bit bands
    at the default max_hamming=3)."""
    def sigs(batch: pa.Table) -> pa.Table:
        sig = simhash_signatures(batch[text_col])
        return pa.table({id_col: batch[id_col],
                         "sig": pa.array(u64_to_i64(sig))})

    return hamming_near_dup(
        ds.map_batches(sigs, batch_format="pyarrow",
                       zero_copy_batch=True),
        id_col=id_col, sig_col="sig", max_hamming=max_hamming,
        bucket_cap=bucket_cap, cc_max_driver_pairs=cc_max_driver_pairs)


def _verified_pairs_result(pair_ds: Dataset,
                           cc_max_driver_pairs: int) -> NearDupResult:
    """Shared tail for pipelines whose buckets emit VERIFIED pairs
    (simhash, embedding): cross-bucket dedup + capped-bucket count +
    driver-or-distributed clustering. Sentinel rows (similarity < 0)
    only carry cap counts for pairless capped buckets."""
    pair_ds = pair_ds.materialize()
    n_rows = pair_ds.count()
    if n_rows == 0:
        return NearDupResult(pd.DataFrame({"id_a": [], "id_b": [],
                                           "similarity": []}),
                             pd.DataFrame({"id": [], "rep": []}), 0, 0)
    if n_rows <= cc_max_driver_pairs:
        raw = pair_ds.to_pandas()
        capped_buckets = int(raw["capped"].sum())
        pairs = (raw[raw["similarity"] >= 0.0]
                 .drop_duplicates(["id_a", "id_b"])
                 .drop(columns=["capped"]).reset_index(drop=True))
        dup_ids = set(pairs.id_a) | set(pairs.id_b)
        clusters = _union_find_clusters(list(zip(pairs.id_a, pairs.id_b)),
                                        dup_ids)
        return NearDupResult(pairs, clusters, int(len(pairs)),
                             capped_buckets)
    capped_buckets = int(pair_ds.sum("capped") or 0)
    from ray.data.aggregate import Max

    from bigdime_ray.stages.shuffle import ensure_schema
    id_type = _arrow_type(pair_ds, "id_a")
    dedup = (pair_ds.filter(expr="similarity >= 0.0")
             .groupby(["id_a", "id_b"])
             .aggregate(Max("similarity", alias_name="similarity"))
             .map_batches(ensure_schema(pa.schema(
                 [("id_a", id_type), ("id_b", id_type),
                  ("similarity", pa.float64())])), batch_format="pyarrow")
             .materialize())
    clusters_ds = label_propagation_components(dedup).materialize()
    return NearDupResult(
        pairs=dedup.limit(MAX_SAMPLED_PAIRS).to_pandas(),
        clusters=clusters_ds.limit(MAX_SAMPLED_PAIRS).to_pandas(),
        candidate_pairs=int(dedup.count()), capped_buckets=capped_buckets,
        pairs_ds=dedup, clusters_ds=clusters_ds)


# ------------------------------------------------------------- n-gram

def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard for a verified pair (driver-side)."""
    def grams(t: str) -> set:
        ws = t.lower().split()
        if len(ws) < n:
            return {tuple(ws)}
        return {tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / len(ga | gb)


def _ngram_sets(text, n: int) -> list[np.ndarray]:
    """Per-row sorted-unique n-gram shingle-hash SET (u64) — the exact
    verify payload (vs the minhash signature estimate). One vectorized
    lexsort + adjacent-dedupe over the flat shingle buffer, not a
    per-row ``np.unique`` loop."""
    sh, starts, counts = _shingle_hashes(text, n)
    n_rows = len(counts)
    if len(sh) == 0:
        return [np.empty(0, dtype=np.uint64)] * n_rows
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    order = np.lexsort((sh, row_idx))
    r, h = row_idx[order], sh[order]
    keep = np.r_[True, (r[1:] != r[:-1]) | (h[1:] != h[:-1])]
    ur, uh = r[keep], h[keep]
    bounds = np.nonzero(np.r_[True, ur[1:] != ur[:-1]])[0]
    # counts >= 1 per row (empty rows carry a sentinel shingle), so
    # every row appears in ur and split yields exactly n_rows arrays
    return np.split(uh, bounds[1:])


def _exact_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def ngram_jaccard_dedup(ds: Dataset, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        num_perm: int = 128, bands: int = 32,
                        threshold: float = 0.7, bucket_cap: int = 64,
                        cc_max_driver_pairs: int = 5_000_000
                        ) -> NearDupResult:
    """Near-dup by EXACT word-n-gram Jaccard.

    Same LSH candidate generation as ``minhash_lsh_dedup`` (recall is
    governed by bands/num_perm: P[candidate] = 1-(1-j^(perm/bands))^bands),
    but verification compares the full hashed shingle SETS — the exact
    Jaccard, not the ±1/√num_perm signature estimate. Use when the
    threshold must be sharp (e.g. contamination checks). Dispatch mirrors
    minhash: ≤ ``cc_max_driver_pairs`` candidates → sets fetched for
    candidate ids only (broadcast semi-join) + driver verify/union-find;
    above → sets stay a Dataset, two co-partitioned joins attach
    set_a/set_b, verify in map_batches, distributed label propagation.
    Pinned against brute-force ``ngram_jaccard`` in tests/test_dedup.py.
    """
    pair_ds = _lsh_candidate_pairs(ds, text_col, id_col, num_perm, bands,
                                   n, bucket_cap)
    n_pair_rows = pair_ds.count()
    if n_pair_rows == 0:
        return NearDupResult(pd.DataFrame({"id_a": [], "id_b": [],
                                           "similarity": []}),
                             pd.DataFrame({"id": [], "rep": []}), 0, 0)

    def all_sets(batch: pa.Table) -> pa.Table:
        sets = _ngram_sets(batch[text_col], n)
        return pa.table({id_col: batch[id_col],
                         "sig": pa.array([s.tobytes() for s in sets],
                                         type=pa.binary())})

    if n_pair_rows > cc_max_driver_pairs:
        return _minhash_distributed(ds, pair_ds, all_sets, id_col,
                                    num_perm, threshold,
                                    verify=_verify_set_pairs(threshold))

    # driver path: fetch sets for candidate ids only
    pair_rows = pair_ds.to_pandas()
    capped_buckets = int(pair_rows["capped"].sum())
    cand = pair_rows[["id_a", "id_b"]].drop_duplicates()
    id_set = pa.array(np.unique(np.concatenate(
        [cand.id_a.to_numpy(), cand.id_b.to_numpy()])))

    def sets_for_candidates(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch[id_col], value_set=id_set))
        if hit.num_rows == 0:
            return pa.table({id_col: pa.array([], type=batch[id_col].type),
                             "sig": pa.array([], type=pa.binary())})
        return all_sets(hit)

    rows = ds.map_batches(sets_for_candidates, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    set_by_id = {r[id_col]: np.frombuffer(r["sig"], dtype=np.uint64)
                 for r in rows}
    keep = []
    for a, b in zip(cand.id_a, cand.id_b):
        sa, sb = set_by_id.get(a), set_by_id.get(b)
        if sa is None or sb is None:
            continue
        jac = _exact_jaccard(sa, sb)
        if jac >= threshold:
            keep.append((a, b, jac))
    pairs = pd.DataFrame(keep, columns=["id_a", "id_b", "similarity"])
    dup_ids = set(pairs.id_a) | set(pairs.id_b)
    clusters = _union_find_clusters([(a, b) for a, b, _ in keep], dup_ids)
    return NearDupResult(pairs, clusters, int(len(cand)), capped_buckets)


def _verify_set_pairs(threshold: float):
    """map_batches fn: exact Jaccard from attached variable-length
    shingle-hash sets (sig_a/sig_b bytes)."""
    def fn(batch: pa.Table) -> pa.Table:
        t = (batch["id_a"].type if "id_a" in batch.column_names
             else pa.int64())
        empty = pa.table({"id_a": pa.array([], type=t),
                          "id_b": pa.array([], type=t),
                          "similarity": pa.array([], type=pa.float64())})
        if batch.num_rows == 0 or batch.num_columns == 0:
            return empty
        sims = np.empty(batch.num_rows, dtype=np.float64)
        sa_col, sb_col = batch["sig_a"].to_pylist(), \
            batch["sig_b"].to_pylist()
        for i, (ba, bb) in enumerate(zip(sa_col, sb_col)):
            sims[i] = _exact_jaccard(np.frombuffer(ba, dtype=np.uint64),
                                     np.frombuffer(bb, dtype=np.uint64))
        m = sims >= threshold
        if not m.any():
            return empty
        idx = pa.array(np.nonzero(m)[0])
        return pa.table({"id_a": batch["id_a"].take(idx),
                         "id_b": batch["id_b"].take(idx),
                         "similarity": pa.array(sims[m])})
    return fn


# ------------------------------------------------------- edit distance

def levenshtein_capped(a: np.ndarray, b: np.ndarray, k: int) -> int:
    """Exact Levenshtein distance between two codepoint arrays, capped:
    returns the true distance when it is ≤ k, else k+1.

    Vectorized row DP: substitution/deletion relax elementwise; the
    sequential insertion recurrence cur[j] = min(m[j], cur[j-1]+1)
    collapses to cur[j] = j + min over l≤j of (m[l]−l), one
    ``np.minimum.accumulate`` per row. Early exit when a whole row
    exceeds k (DP row minima are non-decreasing), so non-matches cost
    ~k rows, not |a| rows."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la == 0:
        return lb if lb <= k else k + 1
    prev = np.arange(lb + 1, dtype=np.int64)
    ar = np.arange(1, lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        m = np.minimum(prev[:-1] + (b != a[i - 1]), prev[1:] + 1)
        acc = np.minimum(np.minimum.accumulate(m - ar), i)
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = acc + ar
        if cur.min() > k:
            return k + 1
        prev = cur
    d = int(prev[lb])
    return d if d <= k else k + 1


def _block_edit_pairs(id_col: str, text_col: str, max_dist: int,
                      cap_per_block: int):
    """map_groups fn: all verified (id_a, id_b, dist) pairs inside one
    blocking group. Candidates are the length-window pairs
    (|len_a−len_b| ≤ max_dist — a necessary condition for
    ed ≤ max_dist, found by one length sort + sliding window, never an
    n² scan); each candidate is verified by the capped DP kernel."""
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        texts = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                 for t in g[text_col].astype(str)]
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        order = np.argsort(lens, kind="stable")
        out_a, out_b, out_d = [], [], []
        n, produced, capped = len(order), 0, 0
        for oi in range(n):
            i = order[oi]
            for oj in range(oi + 1, n):
                j = order[oj]
                if lens[j] - lens[i] > max_dist:
                    break  # sorted window: no further j can qualify
                if produced >= cap_per_block:
                    capped = 1
                    break
                produced += 1
                d = levenshtein_capped(texts[i], texts[j], max_dist)
                if d <= max_dist:
                    a, b = (ids[i], ids[j]) if ids[i] < ids[j] \
                        else (ids[j], ids[i])
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(d)
            if capped:
                break
        if capped and not out_a:
            # sentinel row (dist < 0) carries the cap flag for a
            # pairless capped block — same discipline as the LSH caps
            out_a, out_b, out_d = [ids[0]], [ids[0]], [-1]
        # flag ONE row per capped block so capped_buckets SUMS to the
        # number of truncated blocks (a per-row flag max()'d to 0/1
        # hid the truncation magnitude — review finding)
        cap_col = np.zeros(len(out_a), dtype=np.int64)
        if capped and len(out_a):
            cap_col[0] = 1
        return pd.DataFrame({"id_a": np.asarray(out_a),
                             "id_b": np.asarray(out_b),
                             "dist": np.asarray(out_d, dtype=np.int64),
                             "capped": cap_col})
    return fn


def edit_distance_pairs(ds: Dataset, id_col: str = "doc_id",
                        text_col: str = "text",
                        block_col: str = "source",
                        max_dist: int = 20,
                        cap_per_block: int = 200_000) -> Dataset:
    """Blocked fuzzy join: all pairs within each ``block_col`` group
    whose exact Levenshtein distance is ≤ ``max_dist`` — the
    edit-distance near-dup detector (fuzzy entity matching / OCR-noise
    dedup shape).

    Scale design: this is a BLOCKED verifier — candidate generation is
    the blocking key plus a length window, so cost is Σ per-block
    window pairs, never a global n². The blocking assumption is
    explicit: pairs crossing blocks are out of scope by definition
    (pick the key accordingly — provenance/source, URL host, LSH
    bucket, or a (length band ⊕ shingle-prefix) composite for keyless
    corpora). Each block must fit one task; ``cap_per_block`` bounds
    runaway blocks honestly (capped=1 rows flag truncation, same
    discipline as the LSH bucket caps). Only (id, text-length) sorting
    and the verified pairs leave a task; the texts themselves never
    shuffle beyond the one groupby that co-locates a block."""
    from bigdime_ray.stages.shuffle import ensure_schema
    id_type = _arrow_type(ds, id_col)
    pairs = (ds.groupby(block_col)
             .map_groups(_block_edit_pairs(id_col, text_col, max_dist,
                                           cap_per_block),
                         batch_format="pandas")
             .map_batches(ensure_schema(pa.schema(
                 [("id_a", id_type), ("id_b", id_type),
                  ("dist", pa.int64()), ("capped", pa.int64())])),
                 batch_format="pyarrow"))
    return pairs


def edit_distance_dedup(ds: Dataset, id_col: str = "doc_id",
                        text_col: str = "text",
                        block_col: str = "source",
                        max_dist: int = 20,
                        cap_per_block: int = 200_000,
                        cc_max_driver_pairs: int = 5_000_000
                        ) -> NearDupResult:
    """Edit-distance near-dup with the standard NearDupResult tail —
    pairs carry the exact integer ``dist`` instead of a similarity.
    Blocks are disjoint so no cross-bucket pair dedup is needed;
    clustering dispatches to driver union-find or distributed label
    propagation on the pair count like every other near-dup method."""
    pair_ds = edit_distance_pairs(ds, id_col, text_col, block_col,
                                  max_dist, cap_per_block).materialize()
    n_rows = pair_ds.count()
    if n_rows == 0:
        return NearDupResult(pd.DataFrame({"id_a": [], "id_b": [],
                                           "dist": []}),
                             pd.DataFrame({"id": [], "rep": []}), 0, 0)
    if n_rows <= cc_max_driver_pairs:
        raw = pair_ds.to_pandas()
        capped = int(raw["capped"].sum())
        pairs = (raw[raw["dist"] >= 0].drop(columns=["capped"])
                 .reset_index(drop=True))
        dup_ids = set(pairs.id_a) | set(pairs.id_b)
        clusters = _union_find_clusters(list(zip(pairs.id_a, pairs.id_b)),
                                        dup_ids)
        return NearDupResult(pairs, clusters, int(len(pairs)), capped)
    capped = int(pair_ds.sum("capped") or 0)
    pair_ds = pair_ds.filter(expr="dist >= 0").materialize()
    clusters_ds = label_propagation_components(pair_ds).materialize()
    return NearDupResult(
        pairs=pair_ds.limit(MAX_SAMPLED_PAIRS).to_pandas(),
        clusters=clusters_ds.limit(MAX_SAMPLED_PAIRS).to_pandas(),
        candidate_pairs=int(pair_ds.count()), capped_buckets=capped,
        pairs_ds=pair_ds, clusters_ds=clusters_ds)


# ---------------------------------------------------------- embeddings

def embedding_near_dup(ds: Dataset, emb_col: str = "embedding",
                       id_col: str = "vec_id", threshold: float = 0.98,
                       planes: int = 12, seed: int = 77,
                       bucket_cap: int = 256,
                       cc_max_driver_pairs: int = 5_000_000,
                       shuffle_dtype: str = "float32") -> NearDupResult:
    """Near-dup vectors: random-hyperplane LSH bucket → in-bucket cosine.

    One shuffle of (id, bucket, vec) rows; pairwise cosine only inside
    buckets (capped — cap hits counted, not silent). Vectors with cosine
    ≥ threshold almost surely share a bucket when ``planes`` is small
    relative to the angle margin. Clustering dispatches to distributed
    label propagation above ``cc_max_driver_pairs`` pairs.

    ``shuffle_dtype`` is the precision the normalized vectors travel
    through the bucket shuffle at. float32 (default) scores exactly;
    "float16" halves shuffle bytes but perturbs cosine by up to ~1e-3,
    which can flip pairs borderline at tight thresholds like 0.98 —
    opt-in only (ADVICE r2).
    """
    if shuffle_dtype not in ("float32", "float16"):
        raise ValueError("shuffle_dtype must be 'float32' or 'float16'")
    ship_t = np.float16 if shuffle_dtype == "float16" else np.float32
    first = ds.take(1)[0]
    dim = len(first[emb_col])
    rng = np.random.default_rng(seed)
    planes_m = rng.normal(size=(dim, planes))

    def to_buckets(batch: pa.Table) -> pa.Table:
        emb = batch[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False)
        x = flat.reshape(-1, dim).astype(np.float64)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.maximum(norms, 1e-12)
        bits = (x @ planes_m) > 0
        bucket = np.zeros(len(x), dtype=np.int64)
        for p in range(planes):
            bucket |= bits[:, p].astype(np.int64) << p
        # normalized vectors travel at ``shuffle_dtype`` precision; at
        # extreme scale pass shuffle_dtype="float16" (half the bytes,
        # ~1e-3 cosine perturbation) or ship (id, bucket) + re-fetch
        return pa.table({
            id_col: batch[id_col],
            "bucket": pa.array(bucket),
            "vec": pa.array(list(x.astype(ship_t))),
        })

    rows = ds.map_batches(to_buckets, batch_format="pyarrow",
                          zero_copy_batch=True)

    empty = pd.DataFrame({"id_a": [], "id_b": [], "similarity": [],
                          "capped": []})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        g = g.sort_values(id_col)
        capped = 1 if len(g) > bucket_cap else 0
        g = g.head(bucket_cap)
        ids = g[id_col].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g["vec"]])
        # re-normalize after the fp16 round-trip
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= threshold
        out = pd.DataFrame({"id_a": ids[iu[0][mask]],
                            "id_b": ids[iu[1][mask]],
                            "similarity": sims[iu][mask],
                            "capped": np.zeros(int(mask.sum()),
                                               dtype=np.int64)})
        if len(out):
            out.iloc[0, out.columns.get_loc("capped")] = capped
        elif capped:
            out = pd.DataFrame({"id_a": [ids[0]], "id_b": [ids[0]],
                                "similarity": [-1.0], "capped": [1]})
        return out

    def chunk_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # singleton hyperplane buckets dominate — eliminate vectorized
        sizes = df.groupby("bucket", sort=False)["bucket"] \
            .transform("size")
        df = df[sizes >= 2]
        outs = [bucket_pairs(g)
                for _, g in df.groupby("bucket", sort=False)]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else empty

    from bigdime_ray.stages.shuffle import add_hash_bucket
    return _verified_pairs_result(
        add_hash_bucket(rows, "bucket", 16).groupby("__bucket")
        .map_groups(lambda df: chunk_pairs(df.drop(columns=["__bucket"])),
                    batch_format="pandas"),
        cc_max_driver_pairs)


# ---------------------------------------------------------------- facade

#: method name → implementation, mirroring the validator registry
#: pattern (spi.register_validator): pipelines select a dedup method
#: from config by name, without importing five functions.
DEDUP_METHODS = {
    "exact": exact_dedup,                  # -> Dataset (representatives)
    "exact_groups": exact_dedup_groups,    # -> Dataset (keep_id, cnt)
    "minhash": minhash_lsh_dedup,          # -> NearDupResult
    "simhash": simhash_dedup,              # -> NearDupResult
    "ngram_jaccard": ngram_jaccard_dedup,  # -> NearDupResult
    "edit_distance": edit_distance_dedup,  # -> NearDupResult (dist pairs)
    "embedding": embedding_near_dup,       # -> NearDupResult
}


def dedup(ds: Dataset, method: str = "exact", **config):
    """Single entry point for every dedup strategy (SURVEY §7.3 #4).

    ``method`` ∈ ``DEDUP_METHODS``; ``config`` forwards to the chosen
    implementation's keyword arguments (e.g. ``threshold=`` for the
    near-dup methods, ``normalize=``/``strategy=`` for exact,
    ``shuffle_dtype=`` for embedding). Exact methods return a
    ``Dataset``; near-dup methods return a ``NearDupResult`` (pairs +
    clusters + cap telemetry). Raises ``ValueError`` with the available
    names on an unknown method — same ergonomics as the validator
    registry."""
    impl = DEDUP_METHODS.get(method)
    if impl is None:
        raise ValueError(
            f"unknown dedup method {method!r}; available: "
            f"{sorted(DEDUP_METHODS)}")
    return impl(ds, **config)
