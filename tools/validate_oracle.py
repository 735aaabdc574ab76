#!/usr/bin/env python3
"""Dev-only validator that mimics the driver's correctness gate:
runs each oracle_sql.json query in DuckDB over the sf tables and compares
to the Spark parquet dump (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/validate_oracle.py /root/testdata/sf0.01 /tmp/verify_out
NOT part of the shipped library (driver-side python only).
"""
import sys, os, json, glob
import duckdb, pandas as pd, numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes, bytearray)):
            df[c] = df[c].apply(lambda b: b.hex())
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL cols {name}: spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL rows {name}: spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        ok = True
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # The driver's hash is dtype-sensitive: a DuckDB HUGEINT
            # (sum(BIGINT), windowed or CASE'd) vs Spark int64 fails the
            # gate even when every value matches. Surface it here.
            if av.dtype != bv.dtype:
                print(f"FAIL dtype {name}.{c}: spark={av.dtype} duck={bv.dtype}"
                      f" (cast the oracle, e.g. CAST(sum(...) AS BIGINT))")
                ok = False
                break
            # Exact equality even for floats, matching the driver's hash gate:
            # engine-side aggregates are decimal-routed so doubles bit-match.
            eq = (pd.isna(av) & pd.isna(bv)) | (av == bv)
            if not eq.all():
                i = int(np.argmin(eq))
                print(f"FAIL vals {name}.{c}: row{i} spark={av[i]!r} duck={bv[i]!r}"
                      f" (dtypes {av.dtype}/{bv.dtype})")
                ok = False
                break
        if ok:
            print(f"PASS     {name} ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
