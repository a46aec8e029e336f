#!/usr/bin/env python3
# Dev-only oracle checker (mirrors the driver's DuckDB gate).
# Usage: python3 scripts/check_oracle.py [sfDir] [verifyOutDir]
# Requires driver-side python deps (duckdb, pandas) - NOT a library dependency.
import duckdb, json, glob, os, hashlib
import pandas as pd

import sys
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written (GenData corpora): a directory of parts
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{out}/oracle_sql.json"))
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df
fails = []
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out}/{name}/*.parquet")
    if not spark_files:
        fails.append((name, "no spark output")); continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    s, o = canon(sdf), canon(odf)
    if list(s.columns) != list(o.columns):
        fails.append((name, f"cols spark={list(s.columns)} oracle={list(o.columns)}")); continue
    if len(s) != len(o):
        fails.append((name, f"rows spark={len(s)} oracle={len(o)}")); continue
    # normalize dtypes then hash
    def h(df):
        return hashlib.md5(df.astype(str).to_csv(index=False).encode()).hexdigest()
    if h(s) != h(o):
        diff = (s.astype(str) != o.astype(str))
        badcols = [c for c in s.columns if diff[c].any()]
        fails.append((name, f"hash mismatch cols={badcols} n={diff.any(axis=1).sum()}"))
        continue
    print(f"OK   {name} ({len(s)} rows)")
for n, r in fails: print(f"FAIL {n}: {r}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
