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
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    """Canonical, TYPE-SENSITIVE rendering of a pandas cell.

    The driver converts both sides through pandas (`rel.df()`) and hashes
    string renderings, so an int64 5 and a float64 5.0 must NOT compare
    equal here (DuckDB HUGEINT -> pandas float64 is exactly the class of
    bug this has to surface).
    """
    if v is None:
        return "None"
    if isinstance(v, np.ndarray):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return "f:" + repr(v)
    if isinstance(v, bool):
        return "b:" + repr(v)
    if isinstance(v, int):
        return "i:" + repr(v)
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
        # go through pandas like the driver does — dtype coercions
        # (e.g. HUGEINT -> float64) must be visible to the mimic
        gdf, edf = got_rel.df(), exp_rel.df()
        got = [tuple(norm(v) for v in row)
               for row in gdf[gcols].itertuples(index=False, name=None)]
        exp = [tuple(norm(v) for v in row)
               for row in edf[ecols].itertuples(index=False, name=None)]
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
