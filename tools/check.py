#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare row sets exactly (sorted columns by name, sorted rows).

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify]
"""
import sys, json, subprocess, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

if "--skip-verify" not in sys.argv:
    r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
                       capture_output=True, text=True, cwd="/root/repo")
    errlines = [l for l in r.stdout.splitlines() if "[verify]" in l or "[error]" in l]
    for l in errlines: print(l)
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); print(r.stdout[-3000:]); sys.exit(1)

con = duckdb.connect()
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]
for t in TABLES:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in oracle.items():
    resdir = f"{out}/{name}"
    if not os.path.isdir(resdir):
        print(f"{name}: MISSING spark result"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{resdir}/*.parquet'").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        print(f"{name}: SCHEMA MISMATCH spark={gcols} oracle={wcols}"); fails += 1; continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    w = want[wcols].sort_values(wcols).reset_index(drop=True)
    if len(g) != len(w):
        print(f"{name}: ROWCOUNT spark={len(g)} oracle={len(w)}"); fails += 1; continue
    eq = g.equals(w)
    if not eq:
        # locate first differing cell for debugging
        diff = (g != w) & ~(g.isna() & w.isna())
        idx = diff.any(axis=1)
        bad = idx[idx].index[:3]
        print(f"{name}: VALUE MISMATCH rows {list(bad)}")
        for i in bad[:2]:
            print("  spark :", g.loc[i].to_dict())
            print("  oracle:", w.loc[i].to_dict())
        fails += 1
    else:
        print(f"{name}: OK ({len(g)} rows, {len(gcols)} cols)")

print("RESULT:", "FAIL" if fails else "ALL OK")
sys.exit(1 if fails else 0)
