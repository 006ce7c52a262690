#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB oracle check.

NOT part of the Scala library. Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        exp_c, got_c = canon(exp), canon(got)
        if list(exp_c.columns) != list(got_c.columns):
            print(f"FAIL {name}: columns {list(got_c.columns)} != {list(exp_c.columns)}")
            n_fail += 1
            continue
        if len(exp_c) != len(got_c):
            print(f"FAIL {name}: rows {len(got_c)} != {len(exp_c)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(exp_c, got_c, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got_c)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
