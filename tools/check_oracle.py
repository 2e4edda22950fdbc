#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, compare to Verify's parquet output
(columns sorted by name, rows sorted), report per-query match."""
import duckdb, json, sys, glob
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional subset for chunked big-sf runs: 3rd arg "only=a,b" or
# "skip=a,b"; CHECK_ORACLE_MEM caps duckdb (default unlimited-ish)
only, skip = None, set()
if len(sys.argv) > 3:
    k, v = sys.argv[3].split("=", 1)
    if k == "only": only = set(v.split(","))
    elif k == "skip": skip = set(v.split(","))

con = duckdb.connect()
import os
if os.environ.get("CHECK_ORACLE_MEM"):
    con.execute(f"SET memory_limit='{os.environ['CHECK_ORACLE_MEM']}'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
oracle = {k: v for k, v in oracle.items() if k not in skip}

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))])
        exp = con.execute(sql).df()
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); fails += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
        ok = True
        for c in g.columns:
            a, b = g[c], e[c]
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                same = ((a.isna() & b.isna()) | (np.isclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True))).all()
            else:
                same = (a.astype(str).fillna("") == b.astype(str).fillna("")).all()
            if not same:
                bad = (a.astype(str) != b.astype(str))
                i = bad[bad].index[0] if bad.any() else 0
                print(f"FAIL {name}: col {c} differs, e.g. row {i}: got={a.iloc[i]!r} exp={b.iloc[i]!r}")
                ok = False; fails += 1; break
        if ok:
            # exact-compare floats too, to warn about hash-level diffs
            exact = all((g[c].astype(str).fillna("") == e[c].astype(str).fillna("")).all() for c in g.columns)
            print(f"PASS {name} ({len(g)} rows)" + ("" if exact else "  [float-tolerance only!]"))
    except Exception as ex:
        print(f"ERROR {name}: {ex}"); fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} green")
