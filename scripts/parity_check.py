#!/usr/bin/env python3
"""DEV-ONLY parity harness (mirrors the driver's DuckDB oracle compare).

Not part of the shipped library: the Scala/Spark code never depends on
this. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/parity_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"SCHEMA   {name}: spark={list(s.columns)} duck={list(d.columns)}")
            n_bad += 1
            continue
        if len(s) != len(d):
            print(f"ROWS     {name}: spark={len(s)} duck={len(d)}")
            n_bad += 1
            continue
        sd = [str(t) for t in s.dtypes]
        dd = [str(t) for t in d.dtypes]
        if sd != dd:
            print(f"DTYPES   {name}: spark={sd} duck={dd}")
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
            print(f"OK       {name} ({len(s)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"MISMATCH {name}: {str(e).splitlines()[-1] if str(e) else e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
