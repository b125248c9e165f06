#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate:
runs each oracle_sql.json query in DuckDB over the same parquet tables
and compares to the Spark result parquet (column-name-sorted, row-sorted,
value-normalized). Usage: check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

# Filtered Verify runs write oracle_sql.partial.json (never clobbering the
# full manifest); prefer it when present so a debug loop checks exactly the
# subset it just dumped.
import os
partial = f"{out_dir}/oracle_sql.partial.json"
oracle = json.load(open(partial if os.path.exists(partial) else f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True)
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    # driver-style normalize: sort columns by name, then sort rows
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    s, d = norm(sdf), norm(ddf)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); fails += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fails += 1; continue
    ok = True
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            both_nan = sv.astype(float).isna() & dv.astype(float).isna()
            if not (both_nan | ((sv.astype(float) - dv.astype(float)).abs() < 1e-12)).all():
                print(f"FAIL {name}: col {c} differs\n{sv[(sv.astype(float)-dv.astype(float)).abs()>=1e-12].head()}\n{dv[(sv.astype(float)-dv.astype(float)).abs()>=1e-12].head()}")
                ok = False
        else:
            if not (sv.astype(str) == dv.astype(str)).all():
                mism = sv.astype(str) != dv.astype(str)
                print(f"FAIL {name}: col {c} differs\n{s[mism].head()}\nvs\n{d[mism].head()}")
                ok = False
    if ok:
        print(f"PASS {name} ({len(s)} rows)")
    else:
        fails += 1
print(f"\n{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
