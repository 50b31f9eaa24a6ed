#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same sfDir tables and compare (rows, sorted column names, values).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {wcols}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(want)}")
            failures += 1
            continue
        wrows = sorted(tuple(norm(v) for v in r)
                       for r in want[wcols].itertuples(index=False))
        grows = sorted(tuple(norm(v) for v in r)
                       for r in got[wcols].itertuples(index=False))
        if wrows != grows:
            bad = next((i, a, b) for i, (a, b) in
                       enumerate(zip(wrows, grows)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad[0]}:\n"
                  f"  oracle {bad[1]}\n  spark  {bad[2]}")
            failures += 1
            continue
        print(f"PASS {name}: {len(got)} rows")
    print(f"{'ALL PASS' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
