#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare: for each
query output under OUTDIR, run the oracle SQL against the same
parquet tables and compare as multisets (columns sorted by name).
Usage: check_oracles.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = ok = skipped = 0
for qdir in sorted(glob.glob(f"{out}/q*")):
    name = os.path.basename(qdir)
    spark_df = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
    if name not in oracle:
        skipped += 1
        print(f"{name:24s} rows={len(spark_df):7d} (rows-only check: "
              f"{'OK' if len(spark_df) > 0 else 'EMPTY!'})")
        continue
    duck_df = con.execute(oracle[name]).fetchdf()
    duck_df = duck_df.reindex(sorted(duck_df.columns), axis=1)
    try:
        a = spark_df.sort_values(list(spark_df.columns)).reset_index(drop=True)
        b = duck_df.sort_values(list(duck_df.columns)).reset_index(drop=True)
        import pandas as pd
        same_cols = list(a.columns) == list(b.columns)
        same = same_cols and len(a) == len(b) and a.astype(str).equals(b.astype(str))
        if same:
            ok += 1
            print(f"{name:24s} rows={len(a):7d} MATCH")
        else:
            fails += 1
            print(f"{name:24s} MISMATCH cols_eq={same_cols} "
                  f"rows {len(a)} vs {len(b)}")
            if same_cols and len(a) == len(b):
                diff = (a.astype(str) != b.astype(str)).any(axis=1)
                print("  first diffs:")
                print("  spark:", a[diff].head(3).to_dict('records'))
                print("  duck :", b[diff].head(3).to_dict('records'))
            else:
                print("  spark cols:", list(a.columns), "duck cols:", list(b.columns))
    except Exception as e:
        fails += 1
        print(f"{name:24s} ERROR {e}")
print(f"\n{ok} match, {fails} fail, {skipped} rows-only")
sys.exit(1 if fails else 0)
