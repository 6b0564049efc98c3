#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>

Reads every <outDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
<sfDir> parquet tables, sorts columns by name, and compares values
exactly (with a tiny-float-diff report to distinguish rounding issues
from real bugs).
"""
import json, math, os, sys
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"): return v.isoformat()
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(got_rel.fetchall())}"
            continue
        try:
            exp_rel = con.sql(oracle[name])
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        gcols = sorted(got_rel.columns)
        ecols = sorted(exp_rel.columns)
        if gcols != ecols:
            results[name] = f"SCHEMA-MISMATCH got={gcols} exp={ecols}"
            continue
        got = [tuple(norm(r[got_rel.columns.index(c)]) for c in gcols)
               for r in got_rel.fetchall()]
        exp = [tuple(norm(r[exp_rel.columns.index(c)]) for c in gcols)
               for r in exp_rel.fetchall()]
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT got={len(got)} exp={len(exp)}"
            continue
        # driver sorts before hashing; emulate by sorting row tuples
        key = lambda row: tuple(str(x) for x in row)
        got_s, exp_s = sorted(got, key=key), sorted(exp, key=key)
        if got_s == exp_s:
            results[name] = f"OK rows={len(got)}"
            continue
        # diagnose first diff
        diag = "VALUE-MISMATCH"
        for i, (g, e) in enumerate(zip(got_s, exp_s)):
            if g != e:
                diag = f"VALUE-MISMATCH row{i} got={g} exp={e}"
                break
        results[name] = diag
    bad = 0
    for name in names:
        r = results[name]
        flag = "  " if r.startswith(("OK", "NO-ORACLE")) else "!!"
        if flag == "!!": bad += 1
        print(f"{flag} {name}: {r[:500]}")
    print(f"\n{len(names)-bad}/{len(names)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
