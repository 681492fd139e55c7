"""CLI — run any registered pipeline and write its result as parquet.

    python -m bigdime_ray.query --list
    python -m bigdime_ray.query pricing_summary \
        [--sf-dir /root/testdata/sf0.01] [--out /tmp/out] [--cpus N]

The registry is ``__ray_entry__.queries()`` (repo root, loaded by file
path — the driver-contract module deliberately lives OUTSIDE the
package so that importing ``bigdime_ray`` never pulls in the query
zoo). Dataset results stream to ``--out`` via ``write_parquet``
(partitioned, resumable-output layout per SURVEY §4.3); driver-side
Arrow tables write a single file (they are small by construction —
every driver-materialized result in the registry is bounded by key
cardinality, not data size). Without ``--out``, prints row count and
the first rows.

This module owns a Ray session (CLI entry point — the one place the
driver contract permits `ray.init`), guarded so an outer session wins.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys


def _load_registry():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "__ray_entry__.py")
    spec = importlib.util.spec_from_file_location("__ray_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m bigdime_ray.query",
        description="Run a registered bigdime_ray pipeline")
    p.add_argument("name", nargs="?", help="query name (see --list)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default=None,
                   help="output directory (parquet); print head if unset")
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    p.add_argument("--list", action="store_true", dest="list_queries")
    p.add_argument("--stats", action="store_true",
                   help="print Ray Data per-stage execution stats "
                        "(Dataset results only) — the measure-don't-"
                        "guess loop for sizing batch/concurrency")
    args = p.parse_args(argv)

    mod = _load_registry()
    queries = mod.queries()
    if args.list_queries or not args.name:
        oracle = set(mod.oracle_sql())
        for name in sorted(queries):
            mark = "*" if name in oracle else " "
            print(f"{mark} {name}")
        print(f"\n{len(queries)} queries "
              f"({len(oracle)} oracle-checked [*])")
        return 0
    if args.name not in queries:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        res = queries[args.name](args.sf_dir)
        import pyarrow as pa
        import ray.data as rd
        if isinstance(res, rd.Dataset):
            if args.out:
                res.write_parquet(args.out)
                print(f"wrote dataset to {args.out}")
            else:
                n = res.count()
                print(f"{args.name}: {n} rows")
                for row in res.take(5):
                    print(" ", row)
            if args.stats:
                print(res.stats())
        else:
            tbl = (res if isinstance(res, pa.Table)
                   else pa.Table.from_pandas(res))
            if args.out:
                import pyarrow.parquet as pq
                os.makedirs(args.out, exist_ok=True)
                pq.write_table(tbl, os.path.join(args.out,
                                                 f"{args.name}.parquet"))
                print(f"wrote {tbl.num_rows} rows to {args.out}")
            else:
                print(f"{args.name}: {tbl.num_rows} rows")
                print(tbl.slice(0, 5))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
