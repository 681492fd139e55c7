"""End-to-end validation run — the adaptor/ValidationHandler analog.

Orchestrates the lifecycle from SURVEY.md §3.2:

  Phase 0  schema gate        (parquet footers only, driver)
  Phase 1  scan pass          (ONE map_batches actor-pool stage over
                               zero-copy Arrow; violations + partials)
  Phase 2  shuffle pass       (uniqueness, per-source skew stats,
                               row-equality audit — narrow projections only)
  Phase 3  finalize           (merge partials → per-partition
                               ValidationResponses, drift statistics)
  Phase 4  emit               (verdicts + violations + profile parquet,
                               checkpoint-manifest update)

Reproduces the reference flow: sink marks unit ready → ValidationHandler
resolves configured validator ids → runs each → ValidationResponse per
(unit, validator) → RuntimeInfo status VALIDATED / not
(SURVEY.md §3.1 EP-2; ``BASELINE.json:6``). Resume: partitions VALIDATED
with unchanged lineage are skipped (``BASELINE.json:14``); the global
validators run over the included partitions of the current run.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data import Dataset

import bigdime_ray
from bigdime_ray.functions.hashing import i64_to_u64
from bigdime_ray.schema import TOKENS_SCHEMA, VERDICT_SCHEMA, VIOLATION_SCHEMA
from bigdime_ray.sources.tokens import discover_partitions, read_tokens
from bigdime_ray.spi import (ValidationContext, ValidationResponse,
                             ValidationResult, get_validator)
from bigdime_ray.stages.scan import ScanWorker, resolve_concurrency
from bigdime_ray.state.manifest import (RunManifest, STATUS_FAILED,
                                        STATUS_NOT_READY, STATUS_STARTED,
                                        STATUS_VALIDATED, config_hash,
                                        fingerprint_files)
from bigdime_ray.state.profile import ReferenceProfile
from bigdime_ray.state.sketches import PartialState, merge_states
from bigdime_ray.validators import DEFAULT_SUITE
from bigdime_ray.validators.stats_profile import ProfileState


@dataclass
class ValidationRunConfig:
    input_dir: str                       # contains data/ + side-input files
    run_dir: str
    suite: list[str] = field(default_factory=lambda: list(DEFAULT_SUITE))
    catalog_path: Optional[str] = None   # default: input_dir/source_catalog.parquet
    ingest_manifest_path: Optional[str] = None  # default: input_dir/ingest_manifest.parquet
    profile_path: Optional[str] = None   # reference profile JSON (drift baseline)
    reference_path: Optional[str] = None  # reference ingest dir (row equality)
    vocab: int = 32000
    thresholds: dict = field(default_factory=dict)
    chi2_pvalue_min: float = 0.001
    ks_d_max: float = 0.15
    #: None (default) → stateless fused tasks: the read fuses into the
    #: scan, no object-store hop (measured 3-4× faster; per-worker UDF
    #: caching still amortizes validator state like the referential
    #: value-set). An int or "auto" → actor pool of that size — for
    #: validator suites with expensive per-actor init (model loads).
    scan_concurrency: object = None
    #: "driver": ONE take_all of the scan union, states merged on the
    #: driver (fastest; fine while Σ state bytes ≲ 1 GB). "combine":
    #: block-local combine stage first (the >10⁵-block scale path).
    #: "auto" (default): pick from the plan-time file count —
    #: ≤ thresholds["auto_driver_merge_max_blocks"] (10⁴) files → driver.
    state_merge: str = "auto"
    #: ship the catalog as a Bloom filter instead of the exact value set
    #: (for catalogs too large to broadcast; documented FP ε).
    #: "auto" (default): pick Bloom when the catalog's parquet footer
    #: reports > thresholds["auto_catalog_bloom_min_rows"] (2M) entries
    #: AND no per-source max_n_tok bounds exist (bounds need the exact
    #: mapping) — the same plan-time dispatch style as
    #: uniqueness/roweq (VERDICT r3 #7). True/False pin the choice.
    #: When auto picks Bloom the run emits a structured WARNING alert
    #: (ADVICE r4): referential semantics flip from exact to
    #: approximate, and that must never happen silently just because a
    #: catalog organically grew past the threshold.
    catalog_as_bloom: object = "auto"
    resume: bool = True
    collect_violations: bool = True      # gather into the report (capped)
    max_collected_violations: int = 1_000_000
    #: B-T1 deterministic sampling: keep first-k violation rows per
    #: (partition, validator) ordered by doc_id; None = no cap
    max_violations_per_group: Optional[int] = None
    #: write partition-granular verdicts/ + violations/ dirs (§4.3 layout)
    partitioned_output: bool = True
    #: structured alerting (reference X3 analog): every non-PASSED
    #: response → Alert appended to run_dir/alerts.jsonl; optional
    #: callback receives each Alert (pager/queue hook)
    emit_alerts: bool = True
    on_alert: Optional[object] = None  # Callable[[Alert], None]

    def _default(self, attr: str, name: str) -> Optional[str]:
        v = getattr(self, attr)
        if v is not None:
            return v
        cand = os.path.join(self.input_dir, name)
        return cand if os.path.exists(cand) else None


@dataclass
class RunReport:
    responses: list[ValidationResponse]
    verdicts: pa.Table
    violations: Optional[pa.Table]
    profile: Optional[ReferenceProfile]
    partitions_run: list[str]
    partitions_skipped: list[str]
    artifacts: dict = field(default_factory=dict)
    phase_seconds: dict = field(default_factory=dict)  # wall-clock per phase
    #: resolved scale plan: estimated_rows, uniqueness/roweq strategy,
    #: state_merge (observability for the auto-dispatch)
    scale_plan: dict = field(default_factory=dict)
    #: structured alerts emitted this run (reference X3 analog)
    alerts: list = field(default_factory=list)

    def result_for(self, partition_id: str, validator_id: str) -> Optional[str]:
        for r in self.responses:
            if r.partition_id == partition_id and r.validator_id == validator_id:
                return r.result.value
        return None

    def overall(self, partition_id: str) -> str:
        results = [r.result for r in self.responses
                   if r.partition_id == partition_id]
        return _fold_results(results).value


def _fold_results(results: list[ValidationResult]) -> ValidationResult:
    """Per-partition verdict AND (reference: all PASSED → VALIDATED)."""
    if any(r == ValidationResult.FAILED for r in results):
        return ValidationResult.FAILED
    if any(r == ValidationResult.NOT_READY for r in results):
        return ValidationResult.NOT_READY
    if any(r == ValidationResult.INCOMPLETE_SETUP for r in results):
        return ValidationResult.INCOMPLETE_SETUP
    return ValidationResult.PASSED if results else ValidationResult.NOT_READY


def _load_side_inputs(cfg: ValidationRunConfig, ctx: ValidationContext) -> None:
    """Missing/unreadable side inputs leave the ctx field None — the
    requiring validators then report INCOMPLETE_SETUP (the reference's
    missing-metadata branch) instead of crashing the run."""
    cat_path = cfg._default("catalog_path", "source_catalog.parquet")
    if cat_path and os.path.exists(cat_path):
        as_bloom = cfg.catalog_as_bloom
        if as_bloom == "auto":
            # plan-time dispatch from the footer alone: a >2M-entry
            # value set costs ≳100s of MB pickled into every scan
            # actor, while the Bloom filter is ~19 bits/key at the
            # default 1e-4 FP rate; bounds (max_n_tok) force exact
            pf = pq.ParquetFile(cat_path)
            n_cat = pf.metadata.num_rows
            has_bounds = "max_n_tok" in pf.schema_arrow.names
            as_bloom = (not has_bounds) and n_cat > int(
                ctx.thresholds.get("auto_catalog_bloom_min_rows",
                                   AUTO_CATALOG_BLOOM_MIN_ROWS))
            if as_bloom:
                # ADVICE r4: auto flips referential semantics from exact
                # to approximate — surface it as a structured WARNING
                # alert (run_validation emits it), not just a report
                # field a user must know to look for
                ctx.thresholds["catalog_repr_auto_bloom"] = {
                    "catalog_rows": int(n_cat)}
        ctx.thresholds["catalog_repr"] = "bloom" if as_bloom else "value_set"
        cat = pq.read_table(cat_path)
        if as_bloom:
            # huge-catalog scale path: ship a Bloom filter instead of the
            # exact value set (documented FP ε, functions/bloom.py)
            from bigdime_ray.functions.bloom import BloomFilter
            ctx.catalog_bloom = BloomFilter.from_strings(
                cat["source"].to_pylist())
        else:
            ctx.catalog = frozenset(cat["source"].to_pylist())
            if "max_n_tok" in cat.column_names:
                ctx.catalog_max_n_tok = dict(zip(cat["source"].to_pylist(),
                                                 cat["max_n_tok"].to_pylist()))
    man_path = cfg._default("ingest_manifest_path", "ingest_manifest.parquet")
    if man_path and os.path.exists(man_path):
        man = pq.read_table(man_path)
        ctx.manifest = {
            r["partition_id"]: {"expected_rows": r["expected_rows"],
                                "raw_checksum": r["raw_checksum"]}
            for r in man.to_pylist()}
    prof_path = cfg._default("profile_path", "reference_profile.json")
    if prof_path and os.path.exists(prof_path):
        ctx.profile = ReferenceProfile.load(prof_path)
    ref_path = cfg._default("reference_path", "reference_ingest")
    if ref_path and os.path.isdir(ref_path):
        ctx.reference_path = ref_path


def _merge_scan_states(states_ds: Dataset) -> dict:
    """(partition_id, validator_id) -> merged PartialState.

    Two-level combine, no shuffle: a ``map_batches`` stage merges all
    states sharing a key *within each block* (states are associative, so
    block-local combine is exact), then the (#blocks × #keys)-bounded
    remainder is merged on the driver. This is the same partial-aggregate
    discipline the validators themselves use — a groupby sort-shuffle of
    the pickled payloads measured ~10× slower at bench scale.
    """
    import pandas as pd

    def combine_block(df: pd.DataFrame) -> pd.DataFrame:
        if "kind" in df.columns:
            df = df[df["kind"] == "state"]
        out = []
        for (pid, vid), grp in df.groupby(["partition_id", "validator_id"],
                                          sort=False):
            acc = PartialState.from_bytes(grp["payload"].iloc[0])
            for b in grp["payload"].iloc[1:]:
                acc = acc.merge(PartialState.from_bytes(b))
            out.append({"partition_id": pid, "validator_id": vid,
                        "payload": acc.to_bytes()})
        return pd.DataFrame(out, columns=["partition_id", "validator_id",
                                          "payload"])

    rows = (states_ds.map_batches(combine_block, batch_format="pandas")
            .take_all())
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r["partition_id"], r["validator_id"]),
                          []).append(r["payload"])
    return {key: merge_states([PartialState.from_bytes(b) for b in payloads])
            for key, payloads in by_key.items()}


#: auto-dispatch defaults (overridable via cfg.thresholds["auto_*"]):
#: above these the driver-side merge paths would hold ≳ GBs, so the
#: bucketed / groupby / combine scale paths are selected instead.
AUTO_SCAN_MAX_ROWS = 100_000_000       # 8 B/row packed-hash union ≈ 0.8 GB
AUTO_PACKED_MAX_ROWS = 100_000_000     # 16 B/row × two sides ≈ 3.2 GB
AUTO_DRIVER_MERGE_MAX_BLOCKS = 10_000  # scan-state cells pulled to driver
AUTO_BUCKET_BYTES = 256 << 20          # target slice per uniqueness bucket
AUTO_CATALOG_BLOOM_MIN_ROWS = 2_000_000  # catalog entries → Bloom repr
#: aggregate on-disk bytes in flight across ALL concurrent scan workers
#: (SURVEY §7.2 #2): the r1 "4× cliff" was not batch-local — it was
#: N workers × per-batch intermediates blowing the shared cache /
#: allocator budget. Sizing each batch to budget/concurrency keeps the
#: aggregate constant at any pool width. (The fused scan kernel also
#: shrank per-batch temporaries from ~5 full-size arrays to one
#: L2-resident chunk, which is what retired the cliff itself.)
SCAN_BUDGET_BYTES = 96 << 20


def _auto_scale_dispatch(cfg: ValidationRunConfig, ctx: ValidationContext,
                         discovered: dict, partitions: list) -> str:
    """Resolve scale strategies the caller didn't pin, from plan-time
    input size (exact parquet-footer row counts — the schema gate reads
    the same footers). VERDICT r1 item 3: the engineering for the
    10¹²-row paths exists; this makes the dispatch automatic instead of
    threshold-knowledge the caller must carry. Returns the resolved
    ``state_merge``."""
    files = [f for p in partitions for f in discovered.get(p, [])]

    def _file_meta(f: str) -> tuple[int, int]:
        try:
            return pq.ParquetFile(f).metadata.num_rows, os.path.getsize(f)
        except Exception:
            return 0, 0  # unreadable footer → schema gate reports it

    from concurrent.futures import ThreadPoolExecutor as _TPE
    with _TPE(max_workers=16) as _ex:
        metas = list(_ex.map(_file_meta, files))
    est_rows = sum(m[0] for m in metas)
    est_bytes = sum(m[1] for m in metas)
    ctx.estimated_rows = est_rows
    # scanner batch size: WORKER-COUNT-AWARE (SURVEY §7.2 #2) — each
    # batch gets budget/concurrency on-disk bytes so the aggregate
    # in-flight footprint is constant regardless of pool width (the old
    # fixed ~5 MB/batch target let 32 workers carry 6× the aggregate of
    # 8 workers). Floor 4k rows (per-batch state overhead dominates
    # below), cap 1M rows.
    if est_rows:
        avg_row = max(1, est_bytes // est_rows)
        conc = resolve_concurrency(cfg.scan_concurrency)
        if not conc:
            conc = max(1, int(ray.cluster_resources().get("CPU", 4)))
        budget = int(ctx.thresholds.get("scan_budget_bytes",
                                        SCAN_BUDGET_BYTES))
        per_worker = max(1 << 20, budget // conc)
        ctx.thresholds.setdefault(
            "scan_batch_rows",
            int(min(1 << 20, max(1 << 12, per_worker // avg_row))))
    th = ctx.thresholds
    scan_max = int(th.get("auto_scan_max_rows", AUTO_SCAN_MAX_ROWS))
    if "uniqueness_strategy" not in th:
        th["uniqueness_strategy"] = ("scan" if est_rows <= scan_max
                                     else "bucketed")
    if th["uniqueness_strategy"] == "bucketed" \
            and "uniqueness_buckets" not in th:
        th["uniqueness_buckets"] = max(
            1, int(-(-est_rows * 8 // AUTO_BUCKET_BYTES)))
    packed_max = int(th.get("auto_packed_max_rows", AUTO_PACKED_MAX_ROWS))
    if "roweq_strategy" not in th:
        th["roweq_strategy"] = ("packed" if est_rows <= packed_max
                                else "groupby")
    state_merge = cfg.state_merge
    if state_merge == "auto":
        max_blocks = int(th.get("auto_driver_merge_max_blocks",
                                AUTO_DRIVER_MERGE_MAX_BLOCKS))
        state_merge = "driver" if len(files) <= max_blocks else "combine"
    return state_merge


def run_validation(cfg: ValidationRunConfig) -> RunReport:
    import time as _time
    _t = {"start": _time.perf_counter()}
    phase_seconds: dict = {}

    def _mark(name):
        now = _time.perf_counter()
        phase_seconds[name] = round(now - _t["start"], 3)
        _t["start"] = now

    data_dir = os.path.join(cfg.input_dir, "data")
    if not os.path.isdir(data_dir):
        data_dir = cfg.input_dir

    ctx = ValidationContext(declared_schema=TOKENS_SCHEMA, vocab=cfg.vocab,
                            chi2_pvalue_min=cfg.chi2_pvalue_min,
                            ks_d_max=cfg.ks_d_max, thresholds=dict(cfg.thresholds))
    _load_side_inputs(cfg, ctx)

    discovered = discover_partitions(data_dir)
    manifest_only = sorted(set(ctx.manifest or {}) - set(discovered))
    all_partitions = sorted(set(discovered) | set(manifest_only))

    cfg_hash = config_hash({"suite": cfg.suite, "vocab": cfg.vocab,
                            "thresholds": cfg.thresholds,
                            "chi2": cfg.chi2_pvalue_min, "ks": cfg.ks_d_max})
    run_manifest = RunManifest.load(os.path.join(cfg.run_dir, "manifest.json"))
    fingerprints = {p: fingerprint_files(files)
                    for p, files in discovered.items()}

    to_run, skipped = [], []
    for p in all_partitions:
        if cfg.resume and not run_manifest.needs_run(
                p, fingerprints.get(p, ""), cfg_hash):
            skipped.append(p)
        else:
            to_run.append(p)

    responses: list[ValidationResponse] = []
    artifacts: dict = {}

    # --- NOT_READY: in manifest but no data files (reference BACKOFF path) ---
    not_ready = [p for p in to_run if p in manifest_only or not discovered.get(p)]
    content_suite = [v for v in cfg.suite if v != "schema"]
    for p in not_ready:
        for vid in cfg.suite:
            responses.append(ValidationResponse(
                vid, p, ValidationResult.NOT_READY,
                "partition listed in ingest manifest but data files missing"))
        run_manifest.mark(p, STATUS_NOT_READY, input_files=[],
                          cfg_hash=cfg_hash,
                          engine_version=bigdime_ray.__version__)

    runnable = [p for p in to_run if p not in not_ready]

    # --- Phase 0: schema gate (footers only) ---
    schema_ok = list(runnable)
    if "schema" in cfg.suite:
        gate = get_validator("schema")()
        problem = gate.check_setup(ctx)
        if problem:
            for p in runnable:
                responses.append(ValidationResponse(
                    "schema", p, ValidationResult.INCOMPLETE_SETUP, problem))
        else:
            schema_ok = []
            # footer reads are tiny metadata I/O — one pool across ALL
            # partitions (the per-partition pools degenerate to serial
            # when each partition holds a single file)
            from concurrent.futures import ThreadPoolExecutor as _TPE
            with _TPE(max_workers=16) as _ex:
                gate_resps = list(_ex.map(
                    lambda p: gate.check_partition_files(
                        p, discovered[p], ctx), runnable))
            for p, resp in zip(runnable, gate_resps):
                responses.append(resp)
                if resp.result == ValidationResult.PASSED:
                    schema_ok.append(p)
                else:
                    for vid in content_suite:
                        responses.append(ValidationResponse(
                            vid, p, ValidationResult.INCOMPLETE_SETUP,
                            "schema gate failed for partition"))

    ctx.partitions = schema_ok
    state_merge = _auto_scale_dispatch(cfg, ctx, discovered, schema_ok)
    _mark("setup_and_schema_gate")

    # --- setup gate per validator (reference INCOMPLETE_SETUP branch) ---
    scan_vids, final_vids, global_vids = [], [], []
    for vid in content_suite:
        v = get_validator(vid)()
        problem = v.check_setup(ctx)
        if problem:
            for p in schema_ok:
                responses.append(ValidationResponse(
                    vid, p, ValidationResult.INCOMPLETE_SETUP, problem))
            continue
        if v.scans:
            scan_vids.append(vid)
        if _overrides_run_global(type(v)):
            global_vids.append(vid)
        else:
            final_vids.append(vid)

    verdump_dir = cfg.run_dir
    os.makedirs(verdump_dir, exist_ok=True)

    violations_parts: list = []
    merged_states: dict = {}
    profile: Optional[ReferenceProfile] = None

    if schema_ok:
        for p in schema_ok:
            run_manifest.mark(p, STATUS_STARTED,
                              input_files=discovered[p],
                              fingerprint=fingerprints[p], cfg_hash=cfg_hash,
                              engine_version=bigdime_ray.__version__,
                              bump_attempt=True)
        run_manifest.save()

        ds = read_tokens(data_dir, partitions=schema_ok,
                         batch_size=ctx.thresholds.get("scan_batch_rows",
                                                       1 << 18))

        # --- Phase 1: single scan pass (actor pool, broadcast side inputs) ---
        dup_future = None
        if scan_vids:
            ctx_ref = ray.put(ctx)
            # whole-block batches by default: one state per (block,
            # validator), not one per 1024-row slice. When read tasks
            # are coarsened (multiple files per block — the scheduler-
            # bubble lever, BASELINE.md r4), scan_map_batch_rows caps
            # the map batch so the kernel stays cache-resident while
            # the TASK count stays low.
            scan_kwargs = dict(batch_format="pyarrow", zero_copy_batch=True,
                               batch_size=ctx.thresholds.get(
                                   "scan_map_batch_rows"))
            concurrency = resolve_concurrency(cfg.scan_concurrency)
            if concurrency:
                union = ds.map_batches(
                    ScanWorker,
                    fn_constructor_args=(scan_vids, ctx_ref),
                    concurrency=concurrency, num_cpus=1, **scan_kwargs)
            else:
                union = ds.map_batches(
                    ScanWorker(scan_vids, ctx), **scan_kwargs)
            if state_merge == "combine":
                union = union.materialize()
                viol_ds = (union.filter(expr="kind == 'violation'")
                           .drop_columns(["kind", "payload"]))
                violations_parts.append(viol_ds)
                merged_states = _merge_scan_states(union)
            else:
                # ONE pull of the (capped-violations + states) union as
                # ARROW BATCHES — no materialize, no extra filter jobs,
                # and no per-row Python dicts (take_all's row iterator
                # measured ~3.5 s on a 64-partition run)
                import pyarrow.compute as _pc
                # uniqueness states are only ever consumed GLOBALLY (the
                # dup set), so skip their per-partition merge and feed
                # the sorted block arrays straight into the incremental
                # detector — bucketing runs on background threads while
                # the driver idles waiting on the streaming executor
                # (serial-tail shave, SURVEY §7.3 #1)
                dup_detector = None
                if ("uniqueness" in scan_vids and ctx.thresholds.get(
                        "uniqueness_strategy", "scan") == "scan"):
                    from bigdime_ray.validators.uniqueness import (
                        IncrementalDupDetector)
                    dup_detector = IncrementalDupDetector()
                viol_tables: list[pa.Table] = []
                by_key: dict = {}
                for tbl in union.iter_batches(batch_size=None,
                                              batch_format="pyarrow"):
                    is_state = _pc.equal(tbl["kind"], "state")
                    viol = tbl.filter(_pc.invert(is_state))
                    if viol.num_rows:
                        viol_tables.append(viol.select(
                            ["partition_id", "validator_id", "doc_id",
                             "reason", "detail"]))
                    st = tbl.filter(is_state)
                    if st.num_rows:
                        pids = st["partition_id"].to_pylist()
                        vids = st["validator_id"].to_pylist()
                        pays = st["payload"].to_pylist()
                        for p_, v_, b_ in zip(pids, vids, pays):
                            if dup_detector is not None and v_ == "uniqueness":
                                dup_detector.add_state_bytes(b_)
                            else:
                                by_key.setdefault((p_, v_), []).append(b_)
                if dup_detector is not None:
                    # per-bucket radix sorts release the GIL — overlap
                    # them with the by_key merges and finalize below
                    from concurrent.futures import ThreadPoolExecutor \
                        as _TPE
                    _dup_ex = _TPE(max_workers=1)
                    dup_future = _dup_ex.submit(dup_detector.finish)
                    _dup_ex.shutdown(wait=False)
                _mark("scan_exec")
                if viol_tables:
                    violations_parts.append(
                        pa.concat_tables(viol_tables)
                        .cast(VIOLATION_SCHEMA))
                # per-key merges are numpy-dominated (radix sorts, dense
                # adds — all GIL-releasing): a thread pool turns the
                # driver merge into parallel work
                from concurrent.futures import ThreadPoolExecutor

                def _merge_one(item):
                    key, payloads = item
                    return key, merge_states(
                        [PartialState.from_bytes(b) for b in payloads])

                with ThreadPoolExecutor(max_workers=8) as ex:
                    merged_states = dict(ex.map(_merge_one,
                                                by_key.items()))
            try:  # per-stage wall/cpu breakdown → run_dir (perf forensics)
                with open(os.path.join(cfg.run_dir, "scan_stats.txt"),
                          "w") as f:
                    f.write(union.stats())
            except Exception:
                pass
            _mark("scan_pass")

        # --- Phase 3a: finalize scan validators ---
        for vid in final_vids:
            v = get_validator(vid)()
            src = getattr(v, "state_source", None) or vid
            for p in schema_ok:
                resp = v.finalize(p, merged_states.get((p, src)), ctx)
                if resp is not None:
                    responses.append(resp)
            glob = v.finalize_global(
                {p: merged_states[(p, src)] for p in schema_ok
                 if (p, src) in merged_states}, ctx)
            for r in glob:
                responses.append(r)
                art = getattr(r, "artifact", None)
                if art is not None:
                    artifacts[vid] = art

        # --- merged global profile (drift baseline artifact, FIXTURES F4) ---
        prof_states = [merged_states[k] for k in merged_states
                       if k[1] == "column_stats"]
        if prof_states:
            acc = merge_states(prof_states)
            if isinstance(acc, ProfileState):
                profile = ReferenceProfile(
                    column_stats=acc.column_stats,
                    token_histogram=acc.token_histogram,
                    ntok_digest=acc.ntok_digest)
                profile.save(os.path.join(cfg.run_dir, "profile.json"))

        _mark("finalize")
        # --- Phase 2: shuffle-phase validators ---
        if dup_future is not None:
            ctx.precomputed_dup_hashes = dup_future.result()
        ctx.narrow_reader = lambda cols: read_tokens(
            data_dir, columns=cols, partitions=schema_ok)
        for vid in global_vids:
            v = get_validator(vid)()
            src = getattr(v, "state_source", None) or vid
            v_states = {p: merged_states[(p, src)] for p in schema_ok
                        if (p, src) in merged_states}
            import inspect
            if "states" in inspect.signature(v.run_global).parameters:
                viol, resp_list = v.run_global(ds, ctx, states=v_states)
            else:
                viol, resp_list = v.run_global(ds, ctx)
            responses.extend(resp_list)
            if viol is not None:
                violations_parts.append(viol)
            for r in resp_list:
                art = getattr(r, "artifact", None)
                if art is not None:
                    artifacts[vid] = art

    _mark("global_validators")
    # --- Phase 4: emit ---
    verdict_rows = [r.to_row() for r in responses]
    by_part: dict[str, list[ValidationResult]] = {}
    for r in responses:
        by_part.setdefault(r.partition_id, []).append(r.result)
    for p, results in sorted(by_part.items()):
        verdict_rows.append(ValidationResponse(
            "__overall__", p, _fold_results(results),
            f"{sum(1 for r in results if r == ValidationResult.PASSED)}"
            f"/{len(results)} validators passed").to_row())
    verdicts = pa.Table.from_pylist(verdict_rows, schema=VERDICT_SCHEMA)
    pq.write_table(verdicts, os.path.join(cfg.run_dir, "verdicts.parquet"))

    violations_tbl: Optional[pa.Table] = None
    viol_dir = os.path.join(cfg.run_dir, "violations")
    collected: list[pa.Table] = []
    for part in violations_parts:
        if isinstance(part, pa.Table):
            collected.append(part.cast(VIOLATION_SCHEMA))
        else:  # Dataset
            pdf = part.limit(cfg.max_collected_violations).to_pandas()
            if len(pdf) == 0:
                continue
            tbl = pa.Table.from_pandas(pdf, schema=VIOLATION_SCHEMA,
                                       preserve_index=False)
            collected.append(tbl)
    if collected:
        violations_tbl = pa.concat_tables(collected)
        if cfg.max_violations_per_group:
            from bigdime_ray.stages.topk import cap_violations
            violations_tbl = cap_violations(violations_tbl,
                                            cfg.max_violations_per_group)
        os.makedirs(viol_dir, exist_ok=True)
        pq.write_table(violations_tbl,
                       os.path.join(viol_dir, "violations.parquet"))

    if cfg.partitioned_output:
        # §4.3 resumable layout: one file per partition, idempotent
        # overwrites so retried runs are safe
        vdir = os.path.join(cfg.run_dir, "verdicts")
        os.makedirs(vdir, exist_ok=True)
        import pyarrow.compute as _pc
        for p in sorted(by_part):
            sel = verdicts.filter(_pc.equal(verdicts["partition_id"], p))
            safe = p.replace("/", "_")
            pq.write_table(sel, os.path.join(vdir, f"part={safe}.parquet"))
        if violations_tbl is not None and violations_tbl.num_rows:
            for p in sorted(set(violations_tbl["partition_id"].to_pylist())):
                sel = violations_tbl.filter(
                    _pc.equal(violations_tbl["partition_id"], p))
                safe = (p or "unattributed").replace("/", "_")
                pdir = os.path.join(viol_dir, f"part={safe}")
                os.makedirs(pdir, exist_ok=True)
                pq.write_table(sel, os.path.join(pdir, "violations.parquet"))

    # --- checkpoint manifest update (RuntimeInfoStore semantics) ---
    for p in schema_ok:
        overall = _fold_results(by_part.get(p, []))
        status = (STATUS_VALIDATED if overall == ValidationResult.PASSED
                  else STATUS_FAILED if overall == ValidationResult.FAILED
                  else STATUS_NOT_READY)
        per_validator = {r.validator_id: r.result.value
                         for r in responses if r.partition_id == p}
        rows_metric = None
        st = merged_states.get((p, "record_count"))
        if st is not None:
            rows_metric = st.n
        run_manifest.mark(p, status, metrics={
            "rows": rows_metric, "validators": per_validator})
    for p in runnable:
        if p not in schema_ok and p not in not_ready:
            run_manifest.mark(p, STATUS_FAILED,
                              input_files=discovered.get(p, []),
                              fingerprint=fingerprints.get(p, ""),
                              cfg_hash=cfg_hash,
                              metrics={"schema_gate": "FAILED"})
    run_manifest.save()

    alerts: list = []
    if cfg.emit_alerts:
        from bigdime_ray.alerts import emit_alerts as _emit
        alerts = _emit(responses, cfg.run_dir, cfg.on_alert)
        auto_bloom = ctx.thresholds.get("catalog_repr_auto_bloom")
        if auto_bloom:
            # ADVICE r4: the auto dispatch silently switched referential
            # validation from exact to approximate — emit a structured
            # warning so the flip reaches the same channel as failures
            import time as _time

            from bigdime_ray.alerts import Alert, append_alerts
            warn = Alert(
                severity="warning", alert_type="config",
                partition_id="__global__",
                cause="catalog_as_bloom='auto' selected the Bloom "
                      "representation: referential validation is "
                      "APPROXIMATE this run (false positives ACCEPT "
                      "values absent from the catalog at the documented "
                      "fp_rate); pin catalog_as_bloom=False to force "
                      "exact",
                metrics={**auto_bloom, "bloom_fp_rate": 1e-4},
                run_dir=cfg.run_dir, emitted_at=_time.time())
            append_alerts([warn], cfg.run_dir, cfg.on_alert)
            alerts = alerts + [warn]

    _mark("emit")
    return RunReport(responses=responses, verdicts=verdicts,
                     violations=violations_tbl, profile=profile,
                     partitions_run=to_run, partitions_skipped=skipped,
                     artifacts=artifacts, phase_seconds=phase_seconds,
                     alerts=alerts,
                     scale_plan={
                         "estimated_rows": ctx.estimated_rows,
                         "uniqueness_strategy":
                             ctx.thresholds.get("uniqueness_strategy"),
                         "uniqueness_buckets":
                             ctx.thresholds.get("uniqueness_buckets"),
                         "roweq_strategy":
                             ctx.thresholds.get("roweq_strategy"),
                         "catalog_repr":
                             ctx.thresholds.get("catalog_repr"),
                         "state_merge": state_merge})


def _overrides_run_global(cls) -> bool:
    from bigdime_ray.spi import Validator
    return cls.run_global is not Validator.run_global
