#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — STRICT.

Usage: python3 tools/check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query in <outDir>/oracle_sql.json: run the SQL in DuckDB over the
same parquet tables, load the Spark result parquet, and compare
rows / schema (column names) / values (sorted by all columns).

The driver's hash is REPRESENTATION-sensitive (round-2 judge finding: 19
value-exact queries failed on Decimal-object vs float64). This checker is
therefore strictly dtype- and representation-exact: values must have the
same Python type AND the same repr after canonicalization — no float
tolerance, no cross-dtype coercion. Local green must predict driver green.
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
    """Strict: same type, same exact value/representation. None/NaN/NaT of
    any flavor are mutually equal (engines legitimately differ on null
    carriers); everything else must match type-name AND repr exactly."""
    def isnull(v):
        if v is None:
            return True
        if isinstance(v, float) and math.isnan(v):
            return True
        try:
            r = pd.isna(v)
            return r is True or r is np.True_
        except (ValueError, TypeError):
            return False
    na, nb = isnull(a), isnull(b)
    if na or nb:
        return na and nb
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    if type(a).__name__ != type(b).__name__:
        return False
    if isinstance(a, float):
        return a == b  # bit-exact (modulo +/-0.0); no tolerance
    return a == b and repr(a) == repr(b)


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
        sd, dd = s.dtypes.astype(str).to_dict(), d.dtypes.astype(str).to_dict()
        if sd != dd:
            diff = {c: (sd[c], dd[c]) for c in sd if sd[c] != dd[c]}
            print(f"  WARN {name}: dtype mismatch (spark, duck): {diff}")
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
