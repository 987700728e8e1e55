#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against the DuckDB oracle (oracle_sql.json) on the same testdata dir.

Usage: check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import math
import os
import sys

import duckdb


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if False else v
    return v


def rows_key(rows):
    return sorted([tuple(str(canon(v)) for v in r) for r in rows])


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"MISSING  {name}: no Verify output")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        # driver sorts columns by name before hashing
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        schema_match = sorted(got_cols) == sorted(want_cols)
        g = rows_key([[r[i] for i in gi] for r in got])
        w = rows_key([[r[i] for i in wi] for r in want])
        rows_match = len(g) == len(w)
        hash_match = g == w
        if schema_match and rows_match and hash_match:
            print(f"OK       {name}: {len(g)} rows")
            n_ok += 1
        else:
            n_bad += 1
            print(f"MISMATCH {name}: schema={schema_match} ({sorted(got_cols)} vs "
                  f"{sorted(want_cols)}), rows={len(g)}/{len(w)}, hash={hash_match}")
            if schema_match:
                diff_g = [r for r in g if r not in set(w)][:3]
                diff_w = [r for r in w if r not in set(g)][:3]
                for r in diff_g:
                    print(f"  spark-only: {r}")
                for r in diff_w:
                    print(f"  oracle-only: {r}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
