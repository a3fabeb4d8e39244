#!/usr/bin/env python3
"""Local oracle check mirroring the driver: run each oracle SQL in DuckDB
over the same parquet tables, compare with the Spark result parquet
(columns sorted by name, values compared cell-exact)."""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out)):
    path = os.path.join(out, name)
    if not os.path.isdir(path):
        continue
    spark_df = pd.read_parquet(path)
    if name not in oracle:
        skips.append(f"{name}: rows={len(spark_df)} (no oracle)")
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append(f"{name}: ORACLE SQL ERROR: {e}")
        continue
    s = spark_df[sorted(spark_df.columns)]
    dk = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(dk.columns):
        fails.append(f"{name}: COLUMNS spark={list(s.columns)} duck={list(dk.columns)}")
        continue
    if len(s) != len(dk):
        fails.append(f"{name}: ROWS spark={len(s)} duck={len(dk)}")
        continue
    bad = []
    for c in s.columns:
        a, b = s[c].values, dk[c].values
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            aa = a.astype(np.float64); bb = b.astype(np.float64)
            neq = ~((aa == bb) | (np.isnan(aa) & np.isnan(bb)))
            if neq.any():
                i = int(np.argmax(neq))
                bad.append(f"col {c}: {neq.sum()} diffs, first@{i}: {aa[i]!r} vs {bb[i]!r} (maxdiff {np.nanmax(np.abs(aa-bb))})")
        elif a.dtype.kind == 'M' or b.dtype.kind == 'M':
            aa = pd.to_datetime(pd.Series(a)).astype('datetime64[us]')
            bb = pd.to_datetime(pd.Series(b)).astype('datetime64[us]')
            neq = (aa != bb)
            if neq.any():
                i = int(np.argmax(neq.values))
                bad.append(f"col {c}: {int(neq.sum())} ts diffs, first@{i}: {aa.iloc[i]} vs {bb.iloc[i]}")
        else:
            neq = pd.Series(a).astype(str) != pd.Series(b).astype(str)
            if neq.any():
                i = int(np.argmax(neq.values))
                bad.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: {a[i]!r} vs {b[i]!r}")
    if bad:
        fails.append(f"{name}: " + "; ".join(bad))
    else:
        passes.append(f"{name}: OK ({len(s)} rows)")

print(f"== PASS {len(passes)}  FAIL {len(fails)}  NO-ORACLE {len(skips)} ==")
for p in passes: print("PASS ", p)
for p in skips:  print("SKIP ", p)
for f in fails:  print("FAIL ", f)
sys.exit(1 if fails else 0)
