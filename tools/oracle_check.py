#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py [sf_dir] [verify_out]

Runs each oracle_sql.json query in DuckDB over the sf parquet tables,
loads the corresponding Spark result parquet written by graft.Verify, and
compares row sets (columns sorted by name, rows sorted, values normalized).
Dev-only tooling — the shipped Scala library has no Python dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    # Decimal -> normalized string via float-safe exact string
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_of(cur):
    cols = [d[0].lower() for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    rows = [tuple(norm(r[i]) for i in order) for r in data]
    key = lambda row: tuple((v is None, str(type(v)), str(v)) for v in row)
    return sorted(cols), sorted(rows, key=key)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ocols, orows = rows_of(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            n_fail += 1
            continue
        res_dir = OUT / name
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result written")
            n_fail += 1
            continue
        try:
            scols, srows = rows_of(
                con.execute(f"SELECT * FROM '{res_dir}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: result unreadable: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
        elif srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"FAIL {name}: {len(srows)} vs {len(orows)} rows; "
                  f"first diffs: {diff[:3]}"
                  + (f" extra_spark={srows[len(orows):][:2]}" if len(srows) > len(orows) else "")
                  + (f" extra_oracle={orows[len(srows):][:2]}" if len(orows) > len(srows) else ""))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
