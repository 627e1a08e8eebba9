#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mimics the driver: registers each testdata parquet as a DuckDB view,
runs every query in oracle_sql.json, loads the Spark parquet result,
sorts columns by name and rows by all columns, and compares values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # Mirror the driver: iterate the spark outputs found on disk, look up
    # the oracle SQL by the literal directory name ("<name>.parquet").
    out_dirs = sorted(d for d in os.listdir(out_dir)
                      if d.endswith(".parquet")
                      and os.path.isdir(os.path.join(out_dir, d)))
    n_skip = 0
    for fname in out_dirs:
        name = fname[:-len(".parquet")]
        sql = oracle.get(fname) or oracle.get(name)
        if sql is None:
            # Driver records a weaker rows-only check for oracle-less ops.
            rows = len(pd.read_parquet(os.path.join(out_dir, fname)))
            tag = "rows>0" if rows > 0 else "ZERO ROWS"
            print(f"SKIP {name}: no oracle ({rows} rows, {tag})")
            n_skip += 1
            if rows == 0: n_fail += 1
            continue
        spark_dir = os.path.join(out_dir, fname)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.read_parquet(spark_dir))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1]}")
            # show first mismatching rows for debugging
            neq = (got.astype(str) != want.astype(str)).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                print("  spark:", got.iloc[i].to_dict())
                print("  duck :", want.iloc[i].to_dict())
            n_fail += 1; continue
        # Values match; the driver's hash is dtype-KIND-sensitive: int64
        # vs float64 hash differently (5 vs 5.0), but integer widths are
        # canonicalized (r02: s3/t6 hash-passed with int32 vs int64).
        # Exception: a NULL-bearing int column materializes as float64 on
        # whichever side promoted it (DuckDB .df() vs pyarrow nullable) —
        # treat an i/f pair as matching when the float side is integral
        # wherever non-null.
        # ... but ONLY when the float side actually carries nulls: an
        # all-integral float column against an int column is the
        # regression this gate exists to catch (an engine silently
        # materializing a float-typed result as int64), not a pandas
        # promotion artifact.
        def kind_ok(c):
            a, b = got[c], want[c]
            if a.dtype.kind == b.dtype.kind:
                return True
            pair = {a.dtype.kind, b.dtype.kind}
            if pair == {"i", "f"}:
                f = a if a.dtype.kind == "f" else b
                if not f.isna().any():
                    return False
                nn = f.dropna()
                return bool((nn == nn.round()).all())
            return False
        bad = [(c, str(got[c].dtype), str(want[c].dtype))
               for c in got.columns if not kind_ok(c)]
        if bad:
            print(f"FAIL {name}: dtype mismatch {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # Oracle entries with no spark output on disk = crashed-before-write.
    seen = set(out_dirs) | {f[:-len('.parquet')] for f in out_dirs}
    for key in sorted(oracle):
        base = key[:-len('.parquet')] if key.endswith('.parquet') else key
        if key not in seen and base not in seen and f"{base}.parquet" not in seen:
            print(f"FAIL {key}: no spark output on disk"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip (rows-only) ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
