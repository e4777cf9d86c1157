#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs DuckDB over the same parquet fixtures for every entry in
oracle_sql.json produced by `graft.Verify`, and compares against the
Spark-written parquet results: schema (column names + dtypes), row count,
and exact value equality after sorting columns by name and rows by all
columns. NOT part of the shipped library — uses driver-side python libs.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        f = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(f):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        if not os.path.isdir(os.path.join(outdir, name)):
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(spark_df) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        problems = []
        if list(a.columns) != list(b.columns):
            problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        elif len(a) != len(b):
            problems.append(f"rows {len(a)} vs {len(b)}")
        else:
            for c in a.columns:
                av, bv = a[c].values, b[c].values
                if str(a[c].dtype) != str(b[c].dtype):
                    problems.append(f"dtype[{c}] {a[c].dtype} vs {b[c].dtype}")
                if a[c].dtype == object:
                    eq = pd.Series(av).fillna("\0NULL").eq(pd.Series(bv).fillna("\0NULL")).all()
                else:
                    eq = ((pd.isna(av) & pd.isna(bv)) | (av == bv)).all()
                if not eq:
                    bad = np.where(~((pd.isna(av) & pd.isna(bv)) | (av == bv)))[0][:3]
                    problems.append(f"values[{c}] diff at rows {bad.tolist()}: "
                                    f"{[(av[i], bv[i]) for i in bad]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems)); n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
