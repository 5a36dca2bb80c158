#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/local_verify.py <outDir> [sfDir]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle in DuckDB with the sfDir
tables registered as views, and compares EXACTLY: column names sorted,
rows sorted by all columns, values compared with == (no tolerance), AND
column dtypes compared (the driver's hash is representation-sensitive:
an int64 column vs a float64 column hash-mismatch even when 1 == 1.0).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

outdir = sys.argv[1]
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))

class ArrayColumnError(Exception):
    pass

def canon(df):
    # The driver's gate sorts with pandas over all columns and crashes on
    # array-typed cells (unhashable ndarray). Mirror that strictness: an
    # array column in an oracled result must FAIL here first, not be
    # quietly normalized into something comparable.
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()
            if bad:
                raise ArrayColumnError(
                    f"column {c!r} contains array cells — the driver gate "
                    f"cannot compare these; emit a scalar encoding instead")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)

fails = 0
names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
for name in names:
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no parquet output"); fails += 1; continue
    raw = con.sql(f"SELECT * FROM '{os.path.join(outdir,name)}/*.parquet'").df()
    if name not in oracles:
        # Driver records a rows-only check here (no sort/hash), so array
        # columns are tolerated for these.
        print(f"ok?  {name}: rows={len(raw)} (no oracle, rows-only)")
        if len(raw) == 0: print(f"FAIL {name}: 0 rows"); fails += 1
        continue
    try:
        got = canon(raw)
    except ArrayColumnError as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    try:
        exp = canon(con.sql(oracles[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue
    bad = []
    for c in got.columns:
        if got[c].dtype != exp[c].dtype:
            bad.append(f"{c}: dtype {got[c].dtype} != {exp[c].dtype}")
            continue
        a, b = got[c].values, exp[c].values
        neq = ~((pd.isna(a) & pd.isna(b)) | (a == b))
        if neq.any():
            i = int(np.argmax(neq))
            bad.append(f"{c}: row {i}: {a[i]!r} != {b[i]!r} ({int(neq.sum())} cells)")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad)); fails += 1
    else:
        print(f"PASS {name}: rows={len(got)}")

print(f"\n{len(names)-fails}/{len(names)} pass")
sys.exit(1 if fails else 0)
