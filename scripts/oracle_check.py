#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB over the same testdata parquet tables, sorts columns by name,
and compares row-by-row values. Dev tool only — the engine itself is
pure Scala/Spark.

Usage: python3 scripts/oracle_check.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(norm(x) for x in v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(oracle):
        qdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}")
            failures += 1
            continue
        g = [tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False)]
        e = [tuple(norm(v) for v in row) for row in exp[ecols].itertuples(index=False)]
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            failures += 1
            continue
        # driver may or may not sort rows; require both orders to line up
        mism = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if mism:
            i = mism[0]
            print(f"FAIL {name}: {len(mism)} row mismatches; first at {i}:\n  spark={g[i]}\n  duck ={e[i]}")
            failures += 1
            continue
        # dtype report (informational)
        gd, ed = list(got[gcols].dtypes), list(exp[ecols].dtypes)
        flag = "" if [str(x) for x in gd] == [str(x) for x in ed] else f"  [dtypes differ: {gd} vs {ed}]"
        print(f"OK   {name}: {len(g)} rows{flag}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
