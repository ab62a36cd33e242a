#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (t2).

Reads Verify.scala output (outDir/<name>/ parquet + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf tables, sorts columns by
name, sorts rows, and compares values. Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Mimic the driver's gate exactly: no tuple-conversion of array cells.
    # A top-level array column must crash the sort here like it does there.
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"FAIL {name}: spark output sort error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        eq = got.astype(str).equals(exp.astype(str))
        if eq:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            diff = (got.astype(str) != exp.astype(str)).any(axis=1)
            print(f"FAIL {name}: values differ in {int(diff.sum())}/{len(got)} rows")
            bad = diff[diff].index[:3]
            for i in bad:
                print(f"  spark : {got.loc[i].to_dict()}")
                print(f"  duckdb: {exp.loc[i].to_dict()}")
            n_fail += 1
    # rows-only check for no-oracle queries
    import os
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(p.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{p}/*.parquet")
        try:
            # The driver canonicalizes rows-only outputs too (m02 in round 1
            # errored inside its sort), so sortability is part of the contract.
            n = len(canon(pd.concat([pd.read_parquet(f) for f in files]))) if files else 0
        except Exception as e:
            print(f"FAIL {name} (rows-only sort error: {str(e).splitlines()[0]})")
            n_fail += 1
            continue
        print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
        if n > 0:
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
