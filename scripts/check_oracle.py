#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs graft.Verify output
against the oracle SQL in DuckDB and compares row sets.

Usage: python3 scripts/check_oracle.py [sfDir] [outDir]
(outDir must already contain Verify output: <name>/ parquet dirs +
oracle_sql.json; run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, os, json, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out)
               if os.path.isdir(os.path.join(out, d)))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out), [cols[i] for i in order]

fails = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"  {name:24s} NO OUTPUT"); fails += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    grows, gcols = got.fetchall(), [d[0] for d in got.description]
    if name not in oracles:
        print(f"  {name:24s} rows-only: {len(grows)} rows "
              f"{'OK' if len(grows) > 0 else 'EMPTY(!)'}")
        continue
    try:
        want = con.execute(oracles[name])
        wrows, wcols = want.fetchall(), [d[0] for d in want.description]
    except Exception as e:
        print(f"  {name:24s} ORACLE SQL ERROR: {e}"); fails += 1; continue
    g, gc = canon(grows, gcols)
    w, wc = canon(wrows, wcols)
    if gc != wc:
        print(f"  {name:24s} SCHEMA MISMATCH spark={gc} duck={wc}"); fails += 1
    elif g != w:
        diff1 = [r for r in g if r not in set(w)][:3]
        diff2 = [r for r in w if r not in set(g)][:3]
        print(f"  {name:24s} VALUE MISMATCH rows {len(g)} vs {len(w)}; "
              f"spark-only={diff1} duck-only={diff2}"); fails += 1
    else:
        print(f"  {name:24s} MATCH ({len(g)} rows)")
print(f"{'FAIL' if fails else 'ALL OK'}: {fails} failures / {len(names)} queries")
sys.exit(1 if fails else 0)
