#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle_sql in
DuckDB over the same parquet tables and compare (sorted rows, sorted
columns) against the Verify.scala parquet dumps."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_ok = n_bad = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING  {name}"); n_bad += 1; continue
    try:
        mine = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); n_bad += 1; continue
    mine = mine[sorted(mine.columns)]
    want = want[sorted(want.columns)]
    if list(mine.columns) != list(want.columns):
        print(f"SCHEMA   {name}: {list(mine.columns)} vs {list(want.columns)}")
        n_bad += 1; continue
    ms = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(ms) != len(ws):
        print(f"ROWS     {name}: {len(ms)} vs {len(ws)}"); n_bad += 1; continue
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(ms, ws, check_dtype=False,
                                      check_exact=False, rtol=1e-9, atol=1e-9)
        print(f"OK       {name} ({len(ms)} rows)"); n_ok += 1
    except AssertionError as e:
        print(f"VALUES   {name}: {str(e).splitlines()[-1]}"); n_bad += 1
print(f"\n{n_ok} ok, {n_bad} bad")
sys.exit(1 if n_bad else 0)
