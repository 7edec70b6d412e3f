#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name> parquet (Spark result), runs the matching
SQL from <verify_out_dir>/oracle_sql.json in DuckDB with views named after
the parquet tables in <sf_dir>, sorts columns by name and rows by value,
and reports row/schema/hash match per query.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(
                duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'",
                           connection=con).df())
            want = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, atol=1e-9, rtol=0)
            print(f"OK    {name} ({len(got)} rows)")
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch\n{str(e)[:500]}")
            failures += 1
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
