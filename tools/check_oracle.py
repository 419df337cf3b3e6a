#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sfDir
parquet tables, and compares row count, column names/dtypes, and a
row-order-insensitive value hash (columns sorted by name, rows sorted by all
columns) — strictly harsher than or equal to any plausible driver compare.
"""
import json
import sys
import glob
import os
import hashlib

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("float"):
            col = col.round(9)
        h.update(c.encode())
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(fp) for fp in sorted(files)],
                ignore_index=True)
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        problems = []
        if list(s.columns) != list(d.columns):
            problems.append(f"cols spark={list(s.columns)} duck={list(d.columns)}")
        elif [str(x) for x in s.dtypes] != [str(x) for x in d.dtypes]:
            problems.append(
                f"dtypes spark={[str(x) for x in s.dtypes]} "
                f"duck={[str(x) for x in d.dtypes]}")
        if len(s) != len(d):
            problems.append(f"rows spark={len(s)} duck={len(d)}")
        if not problems and df_hash(s) != df_hash(d):
            diff = (s != d)
            bad_cols = [c for c in s.columns if diff[c].any()]
            ex = ""
            if bad_cols:
                c = bad_cols[0]
                idx = diff[c].idxmax()
                ex = f" e.g. {c}[{idx}]: spark={s[c][idx]!r} duck={d[c][idx]!r}"
            problems.append(f"hash mismatch cols={bad_cols}{ex}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
