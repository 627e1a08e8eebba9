#!/usr/bin/env python3
"""Suite head-to-head: DuckDB (32-thread, warm min-of-2) vs the Bench
per-query medians, over the SAME oracle SQL the correctness gate runs.

Usage: python3 tools/h2h.py <sfDir> <verifyOutDir> <benchJsonLine-file>

<verifyOutDir> must contain oracle_sql.json (graft.Verify writes it);
the bench file is the per-query JSON line graft.Bench prints (or a
file containing it as its first '{"metric"' line).
"""
import sys, os, json, re, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, bench_file):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    oracle = {k: v for k, v in oracle.items() if not k.endswith(".parquet")}
    txt = open(bench_file).read()
    bench = None
    for line in txt.splitlines():
        if '"queries"' not in line:
            continue
        d = json.loads(line)
        # prefer the per_query medians line; the samples line carries
        # lists and cannot be compared directly
        if d.get("metric") == "per_query" or (
                bench is None and all(
                  not isinstance(v, list) for v in d["queries"].values())):
            bench = d["queries"]
            if d.get("metric") == "per_query":
                break
    assert bench, "no per-query bench line found"
    rows, dtot, stot = [], 0.0, 0.0
    for name in sorted(oracle):
        sql = oracle[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                dt = time.time() - t0
            except Exception as e:
                print(f"{name}: DUCKDB ERR {str(e)[:80]}")
                dt = None
                break
            best = dt if best is None else min(best, dt)
        sp = bench.get(name)
        if best is None or sp is None or sp < 0:
            continue
        rows.append((name, best, sp))
        dtot += best; stot += sp
    rows.sort(key=lambda r: -r[1])
    print(f"{'query':30s} {'duckdb':>8s} {'spark':>8s}")
    for name, d, s in rows[:15]:
        print(f"{name:30s} {d:8.2f} {s:8.2f}")
    print(f"== {len(rows)} queries: DuckDB {dtot:.1f}s vs Spark {stot:.1f}s "
          f"-> ratio {stot/dtot:.2f} ==")

if __name__ == "__main__":
    main(*sys.argv[1:4])
