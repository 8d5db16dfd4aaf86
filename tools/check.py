#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads <verifyOutDir>/oracle_sql.json, registers every parquet table in <sfDir>
as a DuckDB view, runs each oracle SQL, and compares it to the engine's dump at
<verifyOutDir>/<name>/ (parquet). Compare: sort columns by name, sort rows by
all columns, exact value equality (with a diagnostic near-miss report).
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: engine output missing: {e}")
        fails += 1
        continue
    exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    got = got[sorted(got.columns)] if set(got.columns) == set(exp.columns) else got
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
        fails += 1
        continue
    got = got.sort_values(by=sorted(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fails += 1
        continue
    if exp.equals(got):
        print(f"OK   {name} ({len(exp)} rows)")
    else:
        print(f"FAIL {name}: value mismatch")
        diff = (exp != got) & ~(exp.isna() & got.isna())
        for c in exp.columns:
            if diff[c].any():
                i = diff[c].idxmax()
                print(f"  col {c} row {i}: oracle={exp[c][i]!r} engine={got[c][i]!r}")
        fails += 1
print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
