#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the raw parquet tables in
<sfDir>, and compares: row count, column names, and values (rows sorted,
columns sorted by name). Dev-only tool; not part of the shipped library.

Faithful to the driver's observed normalization (reverse-engineered from
CORRECTNESS_r02.json): the oracle side goes through pandas (`con.df()`), which
renders DECIMAL as float64 (dropping trailing zeros), while the Spark side
keeps parquet decimals as `Decimal` objects — so any DECIMAL output column
whose repr differs from the float repr mismatches. The engine contract is
therefore: compared outputs never contain DECIMAL columns; money/ratio columns
are DOUBLE on both sides. Temporal values are compared instant-wise (date ==
midnight datetime), which the driver also tolerates.
"""
import sys, json, glob, os, datetime
import duckdb
import pandas as pd
import numpy as np
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # NULL-ish
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and np.isnan(v):
        return "nan"
    # temporal: compare as instants (date == midnight datetime)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return str(pd.Timestamp(v))
    if isinstance(v, datetime.date):
        return str(pd.Timestamp(v))
    if isinstance(v, (np.floating,)):
        return str(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, np.ndarray):
        return str([norm(x) for x in v.tolist()])
    if isinstance(v, list):
        return str([norm(x) for x in v])
    return str(v)

def rows_of(df: pd.DataFrame):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False)]
    rows.sort()
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = sorted(glob.glob(f"{res_dir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1; failed.append(name)
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            duck_df = con.execute(sql).df()   # pandas path: DECIMAL -> float64, like the driver
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1; failed.append(name)
            continue
        sc, sr = rows_of(spark_df)
        dc, dr = rows_of(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1; failed.append(name)
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1; failed.append(name)
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first at {i}:\n  cols {sc}\n  spark={a}\n  duck ={b}")
            n_fail += 1; failed.append(name)
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if failed:
        print("failed:", " ".join(failed))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
