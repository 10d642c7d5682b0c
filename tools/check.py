#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare values exactly.

Usage: python3 tools/check.py <sfdir> <verify_outdir> [query ...]
(Expects graft.Verify to have been run already into <verify_outdir>.)
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # EXACT values (no rounding): the queries are designed to be bitwise
    # deterministic across engines; rounding here would hide drift the
    # driver's hash compare could still catch.
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, x = norm(got), norm(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(x)}")
            n_fail += 1
            continue
        import numpy as np
        def col_eq(a, b):
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                return np.array_equal(a.astype(float).to_numpy(), b.astype(float).to_numpy(), equal_nan=True)
            if a.dtype.kind in "iu" and b.dtype.kind in "iu":
                return np.array_equal(a.to_numpy(dtype="int64"), b.to_numpy(dtype="int64"))
            return a.equals(b)
        # The driver's hash serializes by TYPE, not just value: a DuckDB
        # HUGEINT (from sum()/`//` promotion, surfacing here as float64 or
        # object) vs a Spark BIGINT hash-mismatches even when values agree
        # (round-10 x121 lesson). Flag kind drift as a hard failure.
        kind_drift = [c for c in g.columns
                      if (g[c].dtype.kind in "iu") != (x[c].dtype.kind in "iu")
                      or (g[c].dtype.kind == "f") != (x[c].dtype.kind == "f")]
        if kind_drift:
            print(f"FAIL {name}: dtype-kind drift {[(c, str(g[c].dtype), str(x[c].dtype)) for c in kind_drift]}")
            n_fail += 1
            continue
        if all(col_eq(g[c], x[c]) for c in g.columns):
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            neq = (g != x) & ~(g.isna() & x.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; first diffs:")
            with pd.option_context("display.width", 200, "display.max_columns", 20):
                print("  spark:", g[bad].head(3).to_dict("records"))
                print("  oracle:", x[bad].head(3).to_dict("records"))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
