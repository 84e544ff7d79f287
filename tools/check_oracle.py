#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
runs each oracle_sql.json query in DuckDB over the testdata parquet and
compares against the Spark result parquet written by graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to us precision strings, floats to repr
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.floor("us").astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            s = s.apply(lambda v: str(v.tolist()) if isinstance(v, np.ndarray)
                        else str(v))
        elif pd.api.types.is_float_dtype(s):
            s = s.astype(np.float64).apply(lambda v: repr(v))
        else:
            s = s.astype(str)
        out[c] = s
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written (ScaleUp fixtures): a dir of parts
            if not glob.glob(f"{p}/*.parquet"):
                # aborted write (_SUCCESS-only / empty dir): skip like a
                # missing file instead of erroring in read_parquet
                continue
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_path}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        a, b = canon(got), canon(duck)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs "
                  f"{list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        neq = (a != b)
        if neq.any().any():
            bad_cols = [c for c in a.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            print(f"FAIL {name}: value mismatch cols={bad_cols} "
                  f"row{i}:\n  spark={a.loc[i].to_dict()}\n  "
                  f"duck ={b.loc[i].to_dict()}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
