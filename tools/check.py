#!/usr/bin/env python3
"""Dev-side differential check, mimicking the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Runs each oracle_sql.json entry in DuckDB against the sfDir parquet
tables, loads the Spark result parquet, sorts columns by name + rows by
all columns, and compares values (with exact equality; floats compared
bitwise after float64 cast). Prints PASS/FAIL per query.

This is a dev tool only — the real gate is driver-run.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np
import glob
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Mimic the driver EXACTLY: no tuple-canonicalization of list cells —
    # ARRAY output columns must already be stringified by the query.
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # heavy sf1 oracles (minhash signatures) spill far past DuckDB's
    # default temp-dir budget; give spill an explicit home and ceiling
    con.execute("SET temp_directory = '/tmp/duck_spill'")
    con.execute("SET max_temp_directory_size = '60GiB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. GenScale sf1)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pq.read_table(spark_path).to_pandas())
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR  {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL   {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL   {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        ok = True
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    same = (a.astype("float64").to_numpy().view("int64") ==
                            b.astype("float64").to_numpy().view("int64")).all()
                else:
                    av, bv = a.to_numpy(), b.to_numpy()
                    same = ((pd.isna(a) & pd.isna(b)) | (av == bv)).all()
            except Exception:
                same = a.astype(str).equals(b.astype(str))
            if not same:
                diff = (~(a.astype(str) == b.astype(str))).idxmax()
                print(f"FAIL   {name}: col {c} first diff row {diff}: "
                      f"spark={a.iloc[diff]!r} duck={b.iloc[diff]!r}")
                ok = False
                break
        if ok:
            print(f"PASS   {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
