"""Driver mirror: run every oracle-checked query at sf0.01, compare
rows/schema/value-hash (dtype-sensitive, like the driver) vs DuckDB."""
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import hashlib

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        h.update(str(col.dtype).encode())
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        # script entry point only — importable code never calls ray.init
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    import __ray_entry__ as E
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    global SF
    SF = sf
    names = sys.argv[2:] or list(E.oracle_sql())
    qs, osql = E.queries(), E.oracle_sql()
    fails = []
    for name in names:
        try:
            res = qs[name](SF)
            rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
            odf = con.execute(osql[name]).fetchdf()
            a, b = norm(rdf), norm(odf)
            rows = len(a) == len(b)
            schema = list(a.columns) == list(b.columns)
            dt = {c: (str(a[c].dtype), str(b[c].dtype)) for c in a.columns
                  if str(a[c].dtype) != str(b[c].dtype)} if schema else {}
            hm = rows and schema and not dt and value_hash(a) == value_hash(b)
            status = "OK  " if hm else "FAIL"
            print(f"{status} {name}: rows={len(a)}/{len(b)} schema={schema} "
                  f"dtype_mismatch={dt} hash={hm}")
            if not hm:
                fails.append(name)
                if rows and schema and not dt:
                    for c in a.columns:
                        neq = (a[c].to_numpy() != b[c].to_numpy())
                        if neq.any():
                            i = int(np.nonzero(neq)[0][0])
                            print(f"     first diff col={c} row={i}: "
                                  f"{a[c].iloc[i]!r} vs {b[c].iloc[i]!r} "
                                  f"({int(neq.sum())} rows differ)")
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}")

    print(f"\n{len(names) - len(fails)}/{len(names)} green; fails: {fails}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
