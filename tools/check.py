#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query in <outDir>/oracle_sql.json: run the SQL in DuckDB over the
same parquet tables, load the Spark result parquet, and compare
rows / schema (column names) / values (sorted by all columns).
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["lineitem", "orders", "customer", "part", "supplier", "nation",
          "region", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize to comparable primitives
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                          else tuple(v) if isinstance(v, list) else v)
    key = df.columns.tolist()
    df = df.sort_values(by=key, kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is b:
        return True
    if (a is None or (isinstance(a, float) and math.isnan(a))) and \
       (b is None or (isinstance(b, float) and math.isnan(b))):
        return True
    if pd.isna(a) is True and pd.isna(b) is True:
        return True
    try:
        if pd.isna(a) or pd.isna(b):
            return False
    except (ValueError, TypeError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    spark_dirs = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{outdir}/*/")}
    n_pass = n_fail = 0
    for name in sorted(spark_dirs | set(oracle)):
        if name not in spark_dirs:
            print(f"FAIL {name}: no Spark output"); n_fail += 1; continue
        try:
            sdf = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark parquet unreadable: {e}"); n_fail += 1; continue
        if name not in oracle:
            print(f"  ok {name}: rows-only ({len(sdf)} rows, no oracle)"); n_pass += 1; continue
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}"); n_fail += 1; continue
        s, d = canon(sdf), canon(ddf)
        if sorted(s.columns) != sorted(d.columns):
            print(f"FAIL {name}: columns spark={sorted(s.columns)} duck={sorted(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        bad = None
        for c in s.columns:
            sv, dv = s[c].tolist(), d[c].tolist()
            for i, (x, y) in enumerate(zip(sv, dv)):
                if not values_equal(x, y):
                    bad = (c, i, x, y); break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"  ok {name}: {len(s)} rows exact")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
