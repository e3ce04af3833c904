#!/usr/bin/env python3
"""Driver-style oracle compare: for each query dumped by graft.Verify,
run its DuckDB twin over the same parquet fixtures and hash-compare
(columns sorted by name, values stringified, rows sorted) — the same
canonicalization the round driver uses, including the DECIMAL
float-vs-exact-string trap.

Usage: compare_oracle.py <sfDir> <verifyOutDir> [name1,name2,...]
"""
import json, sys, glob, os
import duckdb, pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fail, no_oracle, ok = [], [], 0
names = sorted(os.listdir(out))
for name in names:
    d = os.path.join(out, name)
    if not os.path.isdir(d) or (only and name not in only):
        continue
    if name not in oracle:
        no_oracle.append(name)
        continue
    spark_df = pd.concat([pd.read_parquet(f)
                          for f in sorted(glob.glob(f"{d}/*.parquet"))],
                         ignore_index=True)
    try:
        ora_df = con.execute(oracle[name]).df()
    except Exception as e:
        fail.append((name, f"oracle error: {e}"))
        continue
    a, b = canon(spark_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        fail.append((name, f"schema {list(a.columns)} vs {list(b.columns)}"))
    elif len(a) != len(b):
        fail.append((name, f"rows {len(a)} vs {len(b)}"))
    elif not a.equals(b):
        diff = (a != b).any(axis=1)
        i = diff.idxmax()
        fail.append((name, f"values differ at row {i}: "
                     f"{a.loc[i].to_dict()} vs {b.loc[i].to_dict()}"))
    else:
        ok += 1
print(f"ok={ok} no_oracle={len(no_oracle)} fail={len(fail)}")
for n, why in fail:
    print(f"FAIL {n}: {why[:300]}")
if no_oracle and not only:
    print("no_oracle:", ",".join(no_oracle))
sys.exit(1 if fail else 0)
