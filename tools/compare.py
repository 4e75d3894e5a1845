#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read each query's parquet
dump, run its oracle SQL in DuckDB over the same sf tables, sort columns by
name and rows by all values, and compare. Usage:
    python3 tools/compare.py <outDir> <sfDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    t = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize types for value compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: float(v) if type(v).__name__ == "Decimal" else v)
    return df

fails = 0
for name in sorted(oracle):
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = canon(con.execute(f"SELECT * FROM '{qdir}/*.parquet'").df())
        want = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}"); fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
    diff_cols = []
    for c in got.columns:
        a, b = got[c], want[c]
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            import numpy as np
            af, bf = a.astype(float), b.astype(float)
            both_nan = af.isna() & bf.isna()
            exact = ((af == bf) | both_nan).all()
            close = (np.isclose(af.fillna(0), bf.fillna(0), rtol=1e-12, atol=1e-12) | both_nan).all()
            if not exact:
                diff_cols.append((c, "float-exact" if close else "float-DIFF"))
        else:
            if not (a.astype(str) == b.astype(str)).all():
                diff_cols.append((c, "value"))
    if diff_cols:
        print(f"FAIL {name}: mismatched cols {diff_cols}")
        for c, _ in diff_cols[:2]:
            m = (got[c].astype(str) != want[c].astype(str))
            print("  spark:", got[m][c].head(3).tolist(), " oracle:", want[m][c].head(3).tolist())
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows, {len(got.columns)} cols)")

# queries without oracle: rows-only note
for d in sorted(os.listdir(outdir)):
    if os.path.isdir(os.path.join(outdir, d)) and d not in oracle:
        n = con.execute(f"SELECT count(*) FROM '{outdir}/{d}/*.parquet'").fetchone()[0]
        print(f"INFO {d}: no oracle, rows={n}")
print("RESULT:", "PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
