#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Reads graft.Verify output (parquet per query + oracle_sql.json) the way
the DRIVER does — Spark parquet via pyarrow/pandas, oracle via DuckDB's
.df() — so local green predicts driver green. The round-2 version read
BOTH sides through DuckDB, which coerced dtypes to match and masked two
whole classes of driver failures:
  - DECIMAL output columns: Spark parquet surfaces Python Decimal
    objects, DuckDB surfaces float64 — equal values, unequal hashes;
  - ARRAY output columns: pandas sort_values on ndarray cells raises
    `unhashable type: numpy.ndarray`.
Both are now hard FAILures here regardless of values.

Usage: python3 scripts/oracle_check.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob, math, decimal
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    return v


def check_dtypes(df, name):
    """Driver-killer dtypes in the SPARK output: fail loudly."""
    bad = []
    for c in df.columns:
        sample = next((v for v in df[c] if v is not None and not (isinstance(v, float) and math.isnan(v))), None)
        if isinstance(sample, decimal.Decimal):
            bad.append(f"{c}: Decimal (hashes != DuckDB float64 — cast to DOUBLE on both sides)")
        if isinstance(sample, (np.ndarray, list)):
            bad.append(f"{c}: array (driver sort_values crashes — serialize to joined string)")
    if bad:
        print(f"FAIL {name}: driver-incompatible output dtypes:\n  " + "\n  ".join(bad))
    return not bad


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
        files = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        # the driver's read path: pyarrow -> pandas, NOT duckdb
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if not check_dtypes(got, name):
            failures += 1
            continue
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
        # the driver sorts rows with pandas sort_values over all columns
        try:
            gs = got[gcols].sort_values(by=gcols, ignore_index=True)
            es = exp[ecols].sort_values(by=ecols, ignore_index=True)
        except TypeError as e:
            print(f"FAIL {name}: sort_values raised {e}")
            failures += 1
            continue
        g = [tuple(norm(v) for v in row) for row in gs.itertuples(index=False)]
        e = [tuple(norm(v) for v in row) for row in es.itertuples(index=False)]
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            failures += 1
            continue
        mism = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if mism:
            i = mism[0]
            print(f"FAIL {name}: {len(mism)} row mismatches; first at {i}:\n  spark={g[i]}\n  duck ={e[i]}")
            failures += 1
            continue
        print(f"OK   {name}: {len(g)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
