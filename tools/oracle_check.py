#!/usr/bin/env python3
"""Replicate the grading driver's DuckDB oracle check against a Verify dump.

Usage: python3 tools/oracle_check.py [sfDir] [verifyOutDir]

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
views of the sf parquet tables, sort columns by name and rows by value, and
compare row count / schema / value hash with the Spark parquet result at
<verifyOutDir>/<name>/. Queries without an oracle are reported rows-only.

Host-side verification tool only — not part of the library.
"""
import sys, json, glob
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vfy"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
spark_dirs = sorted(glob.glob(f"{out}/q*"))
names = [d.rsplit("/", 1)[-1] for d in spark_dirs]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # date/timestamp columns arrive as datetime64 from Spark parquet but as
    # datetime.date objects from DuckDB — normalize to ISO strings
    for c in df.columns:
        if df[c].dtype == "object" or "datetime" in str(df[c].dtype):
            sample = df[c].dropna()
            if len(sample) and not isinstance(sample.iloc[0], str):
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name in names:
    spark_df = pd.concat(
        [pd.read_parquet(p) for p in sorted(glob.glob(f"{out}/{name}/*.parquet"))],
        ignore_index=True) if glob.glob(f"{out}/{name}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        status = "rows_only" if len(spark_df) > 0 else "EMPTY(!)"
        print(f"{name}: {status} rows={len(spark_df)}")
        if len(spark_df) == 0:
            fails.append(name)
        continue
    oracle_df = con.execute(oracle[name]).fetchdf()
    s, o = canon(spark_df), canon(oracle_df)
    ok_rows = len(s) == len(o)
    ok_cols = list(s.columns) == list(o.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            # dtype-strict post-canon (dates/timestamps already normalized to
            # str): the driver's gate hashes values WITH their types, and the
            # HUGEINT->float64 widening of uncast DuckDB sums is exactly the
            # mismatch a lax check here would hide until round grading
            pd.testing.assert_frame_equal(s, o, check_dtype=True, check_exact=True)
            ok_vals = True
        except AssertionError as e:
            ok_vals = False
            detail = str(e).splitlines()[0]
    if ok_rows and ok_cols and ok_vals:
        print(f"{name}: OK rows={len(s)}")
    else:
        fails.append(name)
        print(f"{name}: MISMATCH rows {len(s)}/{len(o)} cols_match={ok_cols}")
        if not ok_cols:
            print(f"  spark cols:  {list(s.columns)}")
            print(f"  oracle cols: {list(o.columns)}")
        elif ok_rows and not ok_vals:
            print(f"  {detail}")

print(f"\n{len(names) - len(fails)}/{len(names)} green; fails: {fails}")
sys.exit(1 if fails else 0)
