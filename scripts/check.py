#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each <name> subdir written by `graft.Verify` (a parquet result), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, sorts
columns by name and rows by all columns, and compares cell-by-cell. Exact
match is required for non-float columns; floats must match bit-for-bit to
count as EXACT (reported separately if only close)."""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df, float_cols):
    # float_cols is the SHARED float/non-float split (a column counts as
    # float if it is float in EITHER frame): under dtype drift (int64 vs
    # float64, tolerated below) a per-frame split would sort the two frames
    # by different column orders and misalign rows.
    df = df[sorted(df.columns)]
    nonfloat = [c for c in df.columns if c not in float_cols]
    floats = [c for c in df.columns if c in float_cols]
    df = df.sort_values(by=nonfloat + floats, ignore_index=True)
    return df


def compare(name, spark_df, oracle_df):
    import pandas as pd
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"SCHEMA MISMATCH spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"ROWCOUNT MISMATCH spark={len(spark_df)} oracle={len(oracle_df)}"
    float_cols = {c for c in spark_df.columns if spark_df[c].dtype.kind == 'f'} \
        | {c for c in oracle_df.columns if oracle_df[c].dtype.kind == 'f'}
    a, b = normalize(spark_df, float_cols), normalize(oracle_df, float_cols)
    issues = []
    for col in a.columns:
        av, bv = a[col], b[col]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                eq = (av.isna() & bv.isna()) | (av == bv)
                nbad = int((~eq).sum())
                if nbad:
                    close = ((av - bv).abs() < 1e-9) | (av.isna() & bv.isna())
                    if bool(close.all()):
                        issues.append(f"{col}: {nbad} cells differ in low bits (close but not exact)")
                    else:
                        bad_idx = (~eq & ~close)
                        ex = a.loc[bad_idx, col].head(3).tolist(), b.loc[bad_idx, col].head(3).tolist()
                        issues.append(f"{col}: {nbad} cells differ, e.g. spark={ex[0]} oracle={ex[1]}")
            else:
                avs = av.astype(str).where(~av.isna(), "<NA>")
                bvs = bv.astype(str).where(~bv.isna(), "<NA>")
                eq = avs == bvs
                nbad = int((~eq).sum())
                if nbad:
                    bad = ~eq
                    ex = avs[bad].head(3).tolist(), bvs[bad].head(3).tolist()
                    issues.append(f"{col}: {nbad} cells differ, e.g. spark={ex[0]} oracle={ex[1]} (dtype {av.dtype}/{bv.dtype})")
        except Exception as e:
            issues.append(f"{col}: compare error {e}")
    # dtype drift report (informational — printed, never a failure: the
    # contract is cell-by-cell value equality, not pandas dtype equality)
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            print(f"[info] {name}: {col}: dtype spark={a[col].dtype} oracle={b[col].dtype}")
    return "; ".join(issues) if issues else None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    import os
    for name in sorted(oracles):
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"[FAIL] {name}: no spark result written")
            n_fail += 1
            continue
        spark_df = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problem = compare(name, spark_df, oracle_df)
        if problem:
            print(f"[FAIL] {name}: {problem}")
            n_fail += 1
        else:
            print(f"[ok]   {name}: {len(spark_df)} rows")
            n_pass += 1
    extra = [d for d in os.listdir(out_dir)
             if os.path.isdir(f"{out_dir}/{d}") and d not in oracles]
    for name in sorted(extra):
        print(f"[info] {name}: no oracle (rows-only check)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
