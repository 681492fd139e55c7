"""No-Ray discriminator for the 1v4 scan gap (VERDICT r3 #3; BASELINE.md r4).

Usage: PYTHONPATH=/root/repo python tools/scan_mp_probe.py 1 4

Runs the EXACT suite scan compute (parquet decode with use_threads=False
+ ScanWorker over all scan validators) over the same 64 bench files in
plain multiprocessing at widths 1/2/4, measuring per-core rate. If the
per-core degradation matches the Ray legs (0.93M -> 0.69M rows/s), the
gap is the host's shared memory system, not Ray/pipeline overhead.
"""
import os
import sys
import time
import multiprocessing as mp

import numpy as np

BENCH = "/tmp/bigdime_bench_16000000_64_mu2"

_worker_state = {}


def _init():
    import pyarrow  # noqa: F401  (warm import in child)
    from bigdime_ray.pipelines.validate import (ValidationRunConfig,
                                                _load_side_inputs)
    from bigdime_ray.spi import ValidationContext
    from bigdime_ray.schema import TOKENS_SCHEMA
    from bigdime_ray.stages.scan import ScanWorker
    cfg = ValidationRunConfig(input_dir=BENCH, run_dir="/tmp/nope",
                              profile_path=os.path.join(
                                  BENCH, "reference_profile.json"))
    ctx = ValidationContext(declared_schema=TOKENS_SCHEMA, vocab=cfg.vocab,
                            thresholds={})
    _load_side_inputs(cfg, ctx)
    scan_vids = ["record_count", "raw_checksum", "ntok_consistency",
                 "token_range", "referential", "column_stats",
                 "per_source_stats", "uniqueness"]
    _worker_state["worker"] = ScanWorker(scan_vids, ctx)


def _scan_file(path: str) -> int:
    import pyarrow.parquet as pq
    import pyarrow as pa
    tbl = pq.read_table(path, use_threads=False)
    pid = path.split("partition_id=")[1].split("/")[0]
    tbl = tbl.append_column("partition_id",
                            pa.array([pid] * tbl.num_rows))
    B = 32768  # ~the worker-aware scan batch budget the Ray legs use
    for s in range(0, tbl.num_rows, B):
        _worker_state["worker"](tbl.slice(s, B))
    return tbl.num_rows


def files():
    out = []
    for root, _, fs in os.walk(os.path.join(BENCH, "data")):
        for f in fs:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def run(width: int) -> tuple[float, int]:
    fl = files()
    with mp.get_context("fork").Pool(width, initializer=_init) as pool:
        pool.map(_scan_file, fl[:width])  # warm page cache + jit paths
        t0 = time.perf_counter()
        rows = sum(pool.map(_scan_file, fl, chunksize=1))
        dt = time.perf_counter() - t0
    return dt, rows


if __name__ == "__main__":
    widths = [int(w) for w in sys.argv[1:]] or [1, 4]
    res = {}
    for w in widths:
        dt, rows = run(w)
        res[w] = (dt, rows)
        print(f"width={w}: {dt:.2f}s {rows} rows "
              f"{rows / dt / 1e6:.3f}M rows/s total "
              f"{rows / dt / w / 1e6:.3f}M rows/s/core", flush=True)
        time.sleep(15)
    if len(widths) == 2:
        lo, hi = widths
        eff = (res[lo][0] / res[hi][0]) / (hi / lo)
        print(f"mp scaling {lo}v{hi}: raw efficiency {eff:.3f}")
