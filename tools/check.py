#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by `sbt "runMain graft.Verify sfDir outDir"`)
and outDir/oracle_sql.json, runs each oracle in DuckDB over views named after
the parquet tables in sfDir, and compares: column names (sorted), dtypes,
row count, and a hash of the values (rows sorted by all columns).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    t = os.path.basename(p)[:-8]
    con.execute(f"create view {t} as select * from read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
try:
    errors = json.load(open(f"{out}/errors.json"))
except FileNotFoundError:
    errors = {}

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:  # normalize timestamp resolution (us vs ns repr)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name in sorted(oracle):
    d = f"{out}/{name}"
    if name in errors:
        fails.append((name, f"query ERROR: {errors[name]}"))
        print(f"FAIL {name}: query ERROR: {errors[name][:160]}"); continue
    if not os.path.isdir(d):
        fails.append((name, "missing spark output")); continue
    got = canon(pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
                          ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.read_parquet(d))
    exp = canon(con.execute(oracle[name]).fetchdf())
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"cols spark={list(got.columns)} duck={list(exp.columns)}")
    elif len(got) != len(exp):
        status.append(f"rows spark={len(got)} duck={len(exp)}")
    else:
        for c in got.columns:
            g, e = got[c], exp[c]
            if str(g.dtype) != str(e.dtype):
                status.append(f"dtype[{c}] spark={g.dtype} duck={e.dtype}")
            if not g.equals(e):
                neq = (g != e) & ~(g.isna() & e.isna())
                if neq.any():
                    i = neq.idxmax()
                    status.append(f"val[{c}] row{i}: spark={g[i]!r} duck={e[i]!r} (n={int(neq.sum())})")
    if status:
        fails.append((name, "; ".join(status)))
        print(f"FAIL {name}: {'; '.join(status)}")
    else:
        print(f"OK   {name} ({len(got)} rows)")

extra = [os.path.basename(d) for d in glob.glob(f"{out}/*")
         if os.path.isdir(d) and os.path.basename(d) not in oracle]
if extra:
    print(f"rows-only (no oracle): {sorted(extra)}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
