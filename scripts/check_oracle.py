#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: load each
SparkEntry.queries parquet dump from Verify, run the matching oracle
SQL in DuckDB against the same testdata parquet, and compare
(columns sorted by name, rows sorted by all columns, exact values).

Usage: python3 scripts/check_oracle.py <verify_outdir> <sf_dir>

This is a dev-loop tool only (driver-side python); the engine itself
is pure Scala/Spark.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(p.rstrip("/").split("/")[-1]
                   for p in glob.glob(f"{outdir}/*/"))
    n_ok = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output files")
            n_fail += 1
            continue
        spark_df = con.execute(
            "SELECT * FROM read_parquet(?)", [files]).fetchdf()
        if name not in oracle:
            status = "rows-only"
            if len(spark_df) > 0:
                print(f"OK   {name}: {status} ({len(spark_df)} rows)")
                n_noracle += 1
            else:
                print(f"FAIL {name}: {status} but 0 rows")
                n_fail += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} != {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} != {len(b)}")
            n_fail += 1
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())} mismatched rows; first:")
            idx = bad.idxmax()
            print("  spark:", a.loc[idx].to_dict())
            print("  duck :", b.loc[idx].to_dict())
            n_fail += 1
            continue
        print(f"OK   {name}: exact match ({len(a)} rows, {len(a.columns)} cols)")
        n_ok += 1
    print(f"\n{n_ok} exact, {n_noracle} rows-only, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
