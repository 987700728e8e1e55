#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

For each <name> dir in verifyOutDir: read the Spark parquet result,
run oracle_sql.json[name] in DuckDB with every <sfDir>/*.parquet
registered as a view, sort columns by name and rows by all columns,
and compare row count / schema / values.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats: everything numeric -> float64 rounded
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        else:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            t = f[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{f}')"
            )
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(
        d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))
    )
    n_ok = n_bad = 0
    for name in names:
        try:
            spark_df = pd.read_parquet(os.path.join(out_dir, name))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"WARN {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: schema spark={list(a.columns)} duck={list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_bad += 1
            continue
        mismatch = None
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_numeric_dtype(av):
                bad = ~(
                    (av.isna() & bv.isna())
                    | ((av - bv).abs() <= 1e-4 + 1e-6 * bv.abs())
                )
            else:
                bad = av != bv
            if bad.any():
                i = bad.idxmax()
                mismatch = f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(a)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(names)} total")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
