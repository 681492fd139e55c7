"""CLI entry point — the adaptor-main analog.

``python -m bigdime_ray.run --input DIR --run-dir DIR [options]`` runs
the validation suite; on a cluster the same module is the payload of
``ray job submit -- python -m bigdime_ray.run ...`` (``BASELINE.json:14``).

This is one of the only places allowed to own a Ray session (driver
contract: the library itself never calls ``ray.init``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _dry_run_cluster(args) -> int:
    """Submit-readiness proof (VERDICT r3 #8): assemble and print the
    exact ``ray job submit`` payload for both fixed cluster sizes.
    Runs no Ray — this sandbox is single-node; the payload is what a
    real deployment executes verbatim (cluster/README.md)."""
    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    entry = ["python", "-m", "bigdime_ray.run",
             "--input", args.input, "--run-dir", args.run_dir]
    if args.suite:
        entry += ["--suite", args.suite]
    if args.no_resume:
        entry += ["--no-resume"]
    payload = {
        "entrypoint": " ".join(entry),
        "runtime_env": os.path.join(here, "cluster", "runtime_env.yaml"),
        "clusters": {
            "N": os.path.join(here, "cluster", "cluster_n.yaml"),
            "4N": os.path.join(here, "cluster", "cluster_4n.yaml")},
        "submit": {
            leg: ("ray job submit --address http://<head-%s>:8265 "
                  "--runtime-env cluster/runtime_env.yaml -- " % leg
                  + " ".join(entry))
            for leg in ("n", "4n")},
        "scaling_rule": "efficiency = rows_per_sec(4N) / "
                        "(4 * rows_per_sec(N)); criterion >= 0.8",
    }
    missing = [p for p in [payload["runtime_env"],
                           *payload["clusters"].values()]
               if not os.path.exists(p)]
    payload["files_present"] = not missing
    print(json.dumps(payload, indent=1))
    return 0 if not missing else 2


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="bigdime_ray validation run")
    p.add_argument("--input", required=True,
                   help="input dir (data/ + side-input files)")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--suite", default=None,
                   help="comma-separated validator ids (default: DEFAULT_SUITE)")
    p.add_argument("--profile", default=None, help="reference profile JSON")
    p.add_argument("--reference", default=None, help="reference ingest dir")
    p.add_argument("--catalog", default=None)
    p.add_argument("--ingest-manifest", default=None)
    p.add_argument("--vocab", type=int, default=32000)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local mode only; omit on a cluster")
    p.add_argument("--build-profile", action="store_true",
                   help="build a reference profile instead of validating")
    p.add_argument("--dry-run-cluster", action="store_true",
                   help="print the `ray job submit` payload for the N / "
                        "4N cluster legs (BASELINE.json) without "
                        "initializing Ray, then exit")
    args = p.parse_args(argv)

    if args.dry_run_cluster:
        return _dry_run_cluster(args)

    import ray
    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    try:
        if args.build_profile:
            from bigdime_ray.pipelines.profile import build_profile
            out = args.run_dir.rstrip("/") + "/reference_profile.json"
            import os
            os.makedirs(args.run_dir, exist_ok=True)
            prof = build_profile(args.input, vocab=args.vocab, save_path=out)
            print(json.dumps({"profile": out,
                              "rows": prof.column_stats["n_tok"].count}))
            return 0

        from bigdime_ray.pipelines.validate import (ValidationRunConfig,
                                                    run_validation)
        from bigdime_ray.sources.tokens import discover_partitions
        from bigdime_ray.validators import DEFAULT_SUITE
        import os
        data_dir = (os.path.join(args.input, "data")
                    if os.path.isdir(os.path.join(args.input, "data"))
                    else args.input)
        if not discover_partitions(data_dir):
            print(f"error: no partition_id=* parquet data under "
                  f"{args.input}", file=sys.stderr)
            return 2
        suite = (args.suite.split(",") if args.suite else list(DEFAULT_SUITE))
        if args.reference and "row_equality" not in suite:
            suite.append("row_equality")
        report = run_validation(ValidationRunConfig(
            input_dir=args.input, run_dir=args.run_dir, suite=suite,
            catalog_path=args.catalog,
            ingest_manifest_path=args.ingest_manifest,
            profile_path=args.profile, reference_path=args.reference,
            vocab=args.vocab, resume=not args.no_resume))
        summary = {
            "partitions_run": report.partitions_run,
            "partitions_skipped": report.partitions_skipped,
            "overall": {p: report.overall(p)
                        for p in sorted({r.partition_id
                                         for r in report.responses})},
            "violations": (len(report.violations)
                           if report.violations is not None else 0),
            "run_dir": args.run_dir,
        }
        print(json.dumps(summary, indent=1))
        failed = any(v == "FAILED" for v in summary["overall"].values())
        return 1 if failed else 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
