"""Driver-contract tests: entry()/queries()/oracle_sql() shape + a few
spot oracle comparisons at sf0.001 (full sweep at sf0.01 is the driver's
job; /tmp/check_oracle.py mirrors it)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as E

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con(sf001_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf001_dir}/{t}.parquet')")
    return con


def test_oracle_keys_subset_of_queries():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ["record_count_per_source", "duplicate_keys",
                                  "pricing_summary", "token_count",
                                  "per_source_stats_salted",
                                  "doc_decile_stats",
                                  "late_shipment_orders",
                                  "order_snapshot_diff",
                                  "top_words_by_source",
                                  "events_rolling_rows_max",
                                  "quantity_discount_corr"])
def test_query_matches_oracle(name, con, sf001_dir):
    res = E.queries()[name](sf001_dir)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    odf = con.execute(E.oracle_sql()[name]).fetchdf()
    a, b = _norm(rdf), _norm(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        # the driver value-hashes EXACTLY — compared columns are integer/
        # string/timestamp by design (floats are fixed-point encoded)
        assert not np.issubdtype(a[c].dtype, np.floating), \
            f"float column {c} would be hash-fragile"
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_entry_returns_verdicts():
    out = E.entry()
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(pdf) > 0
    assert {"partition_id", "validator_id", "result"} <= set(pdf.columns)
    assert set(pdf.result) <= {"PASSED", "FAILED", "NOT_READY",
                               "INCOMPLETE_SETUP"}
