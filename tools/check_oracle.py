#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For every <name> subdir in verifyOutDir (Spark parquet result), runs the
matching oracle SQL from oracle_sql.json in DuckDB against views named after
the parquet tables in sfDir, then compares: row count, column names/types,
and a hash over column-name-sorted, row-sorted values.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda x: str(x)))
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(x.split("/")[-1] for x in glob.glob(f"{out_dir}/q*"))
    n_pass = n_fail = 0
    # queries that THREW during Verify never produced a parquet dir and
    # would silently vanish from this compare — count them as failures
    try:
        failures = json.load(open(f"{out_dir}/verify_failures.json"))
    except FileNotFoundError:
        failures = {}
    for name, msg in failures.items():
        print(f"{name:28s} VERIFY-FAILED {msg[:120]}")
        n_fail += 1
    for name in names:
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in glob.glob(f"{out_dir}/{name}/*.parquet")],
            ignore_index=True)
        if name not in oracle:
            print(f"{name:28s} NO-ORACLE rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERROR {str(e)[:120]}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{name:28s} COLS-MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"{name:28s} ROWS-MISMATCH spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        mism = []
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            bad = [i for i, (x, y) in enumerate(zip(av, bv))
                   if not values_equal(x, y)]
            if bad:
                mism.append((c, bad[:3], [(av[i], bv[i]) for i in bad[:3]]))
        if mism:
            print(f"{name:28s} VALUE-MISMATCH {mism[:2]}")
            n_fail += 1
        else:
            print(f"{name:28s} OK rows={len(a)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
