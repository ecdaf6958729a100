#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py [sf_dir] [verify_out] [query ...]

For each query with an oracle_sql.json entry: read the Spark parquet dump,
run the oracle SQL in DuckDB over views of the sf tables, sort columns by
name + rows by value, and compare (values coerced: int widths unified,
floats compared exactly after the query's own rounding).
"""
import json, sys, glob, os
import duckdb, pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{out}/{name}/*.parquet")],
        ignore_index=True)
    try:
        ora = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith(("int", "uint", "Int")):
                df[c] = df[c].astype("int64")
            elif str(df[c].dtype).startswith("float"):
                df[c] = df[c].astype("float64")
            elif str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]")
            elif str(df[c].dtype) == "object":
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    a, b = canon(spark_df), canon(ora)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: schema {list(a.columns)} vs {list(b.columns)}")
        fails += 1
    elif len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
        fails += 1
    else:
        try:
            pd.testing.assert_frame_equal(a, b, check_exact=True)
            print(f"OK   {name} ({len(a)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n  {str(e).splitlines()[-1]}")
            fails += 1
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
