#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB against the testdata tables and compares row/schema/values with the
engine's Verify output parquet. Usage: compare.py <sfDir> <verifyOutDir>

The comparison is deliberately STRICTER than naive value equality: each value
is rendered with a type tag (int/float/decimal/str/ts/...), so a DuckDB
HUGEINT or DECIMAL result that is numerically equal to the engine's
int64/double still FAILS here — exactly the class of mismatch the driver's
type-sensitive hash catches (CORRECTNESS_r01: ev1/ev3/ev4/q12/q15/q18/st1).
Engine and oracle must agree on the *representation*, not just the value.
"""
import sys, json, glob, os, math, datetime
import decimal
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")


def render(v):
    """Type-tagged canonical rendering. Distinct types => distinct tags."""
    if v is None:
        return "null"
    # pandas/numpy NaN/NaT
    if isinstance(v, float) and math.isnan(v):
        return "null"
    t = type(v).__name__
    if t in ("int", "int8", "int16", "int32", "int64", "uint64"):
        return f"i:{int(v)}"
    if t in ("float", "float32", "float64"):
        return f"f:{float(v)!r}"
    if t == "Decimal":
        return f"dec:{v}"
    if t in ("bool", "bool_"):
        return f"b:{bool(v)}"
    if t == "str":
        return f"s:{v}"
    if t in ("Timestamp", "datetime"):
        if v != v:  # NaT
            return "null"
        return f"ts:{v.isoformat()}"
    if t == "date":
        return f"d:{v.isoformat()}"
    if t in ("ndarray", "list"):
        return "a:[" + ",".join(render(x) for x in list(v)) + "]"
    return f"{t}:{v}"


oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
results = {}
# A query that FAILED inside Verify leaves no output dir — that must be a
# loud failure here, not a silent skip (st6 round 3 was invisible at first).
for name in sorted(oracle):
    if not os.path.isdir(os.path.join(out_dir, name)):
        results[name] = "MISSING ENGINE OUTPUT (query failed in Verify?)"
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
        ev = [render(v) for v in eng[c].tolist()]
        ov = [render(v) for v in ora[c].tolist()]
        if ev == ov:
            continue
        # locate first diff; try sorted compare to distinguish order-vs-value
        for i, (a, b) in enumerate(zip(ev, ov)):
            if a != b:
                kind = "ROW-ORDER" if sorted(ev) == sorted(ov) else "VALUE/TYPE"
                mismatch = f"{kind} MISMATCH col={c} row={i}: eng={a} ora={b}"
                break
        if mismatch:
            break
    results[name] = mismatch or "OK"

ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
for k, v in results.items():
    print(f"{k:28s} {v}")
print(f"-- {ok}/{len(results)} pass; oracles missing for "
      f"{[k for k in results if k not in oracle]}")
sys.exit(0 if ok == len(results) else 1)
