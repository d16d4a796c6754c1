#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py [sf_dir] [verify_out]

Mimics the driver's observed compare path as closely as possible:
- Spark side: pandas.read_parquet of the Verify dump (parquet DECIMAL
  surfaces as python decimal.Decimal objects, timestamps as datetime64).
- Oracle side: duckdb .df() (DECIMAL surfaces as float64).
- Columns sorted by lowercased name; rows sorted by all columns
  (stringified, as pandas Categorical sorting of object columns would
  choke on mixed types); then values compared by str().

This catches representation mismatches the round-1 emulation missed
(e.g. Decimal('254462.00') vs 254462.0) and the pandas sort crash on
ndarray-valued cells. Dev-only tooling — the shipped Scala library has
no Python dependency.
"""
import glob
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    """Columns sorted by lowercase name; rows sorted; values as str."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    cols = sorted(df.columns)
    df = df[cols]
    # Driver-faithful hazard: raw ndarray/list cells are unsortable in
    # pandas — let the exception propagate like the driver does.
    df.sort_values(cols)  # noqa: raises TypeError on unhashable cells
    sdf = df.astype(str)
    order = sdf.apply(tuple, axis=1).sort_values().index
    return cols, [tuple(r) for r in sdf.loc[order].itertuples(index=False)]


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
            ocols, orows = canon(odf)
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        files = sorted(glob.glob(str(OUT / name / "*.parquet")))
        if not files:
            print(f"FAIL {name}: no Spark result written")
            n_fail += 1
            continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files])
            scols, srows = canon(sdf)
        except Exception as e:
            print(f"FAIL {name}: spark result: {type(e).__name__}: {e}")
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
