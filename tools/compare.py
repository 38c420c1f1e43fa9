#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB against the testdata tables and compares row/schema/values with the
engine's Verify output parquet. Usage: compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    eng = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        results[name] = f"rows-only: {len(eng)} rows"
        continue
    try:
        ora = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE ERROR: {e}"
        continue
    eng = eng.reindex(sorted(eng.columns), axis=1)
    ora = ora.reindex(sorted(ora.columns), axis=1)
    if list(eng.columns) != list(ora.columns):
        results[name] = f"COL MISMATCH eng={list(eng.columns)} ora={list(ora.columns)}"
        continue
    if len(eng) != len(ora):
        results[name] = f"ROWCOUNT MISMATCH eng={len(eng)} ora={len(ora)}"
        continue
    mismatch = None
    for c in eng.columns:
        ev, ov = eng[c].tolist(), ora[c].tolist()
        for i, (a, b) in enumerate(zip(ev, ov)):
            if a != b and str(a) != str(b):
                mismatch = f"VALUE MISMATCH col={c} row={i}: eng={a!r} ora={b!r}"
                break
        if mismatch:
            break
    results[name] = mismatch or "OK"

ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
for k, v in results.items():
    print(f"{k:28s} {v}")
print(f"-- {ok}/{len(results)} pass; oracles missing for "
      f"{[k for k in results if k not in oracle]}")
