#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Validated against CORRECTNESS_r01.json (reproduces all 42 driver verdicts,
25 pass / 17 fail): the driver reads the SPARK side with pandas/pyarrow
(`pd.read_parquet` — parquet decimals become `decimal.Decimal` objects,
keeping trailing zeros) and the ORACLE side with duckdb's pandas bridge
(`.df()` — DECIMAL and HUGEINT become float64), then compares STRINGIFIED
values after sorting columns by name and rows by all columns.

Consequences for query authors (enforced here by comparing exactly the
same way):
  - decimal aggregate outputs must be cast to DOUBLE on BOTH sides
    ('137431.00' != '137431.0' otherwise);
  - integer sums need CAST(... AS BIGINT) in the oracle SQL (DuckDB widens
    sum(BIGINT) to HUGEINT -> float64 -> '99111.0' != '99111');
  - int32 vs int64 and timestamp[ns] vs [us] are harmless (same str form).

Mimic fidelity depends on pandas/pyarrow null+float renderings ('nan',
'None', 'NaT', float64 repr) matching the driver's. Validated against the
driver with pandas 2.2.2 / pyarrow 16.1.0 / duckdb 1.0.0 (r01+r02 verdicts
reproduced exactly); if this environment's versions move, re-validate
against the next CORRECTNESS_r{N}.json before trusting local verdicts.

Usage:
    python3 tools/compare.py <outDir> <sfDir> [queryFilter,...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    t = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    if len(s):
        s = s.sort_values(by=list(s.columns), ignore_index=True)
    return s

# The bit-identical hash strategy for decimal sums cast to double relies on
# the exact sum's unscaled value staying below 2^53, so decimal->double is a
# single correct rounding of the same rational on both engines. Queries use
# scale <= 4, so any float column whose magnitude nears 2^53 / 10^4 is at
# risk of silent rounding divergence at a bigger scale factor — fail LOUDLY
# here instead of flaking at the driver (ADVICE r02).
DOUBLE_EXACT_BOUND = 2.0 ** 53 / 10_000

def bound_check(name, df):
    import numpy as np
    bad = []
    for c in df.columns:
        if df[c].dtype.kind == "f":
            mx = np.nanmax(np.abs(df[c].to_numpy())) if len(df) else 0.0
            if mx >= DOUBLE_EXACT_BOUND:
                bad.append((c, mx))
    return bad

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        raw_got = pd.read_parquet(qdir)
        got = canon(raw_got)
        want = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    over = bound_check(name, raw_got)
    if over:
        print(f"FAIL {name}: double-exactness bound exceeded (|v|*10^4 >= 2^53): {over} "
              "— decimal->double casts are no longer a single rounding; re-scale the query")
        fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}"); fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
    bad = [c for c in got.columns if not (got[c] == want[c]).all()]
    if bad:
        print(f"FAIL {name}: mismatched cols {bad}")
        for c in bad[:2]:
            m = got[c] != want[c]
            print("  spark:", got[c][m].head(3).tolist(), " oracle:", want[c][m].head(3).tolist())
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows, {len(got.columns)} cols)")

# queries without oracle: rows-only note
for d in sorted(os.listdir(outdir)):
    if os.path.isdir(os.path.join(outdir, d)) and d not in oracle and (not only or d in only):
        n = con.execute(f"SELECT count(*) FROM '{outdir}/{d}/*.parquet'").fetchone()[0]
        print(f"INFO {d}: no oracle, rows={n}")
print("RESULT:", "PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
