#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run DuckDB oracle SQL
(from Verify's oracle_sql.json) against the sf parquet tables and
compare with the Spark outputs written by graft.Verify.

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import duckdb, glob, json, math, os, sys

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))

def canon(rows, cols):
    # sort columns by name, normalize values, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)
    return sorted(tuple(norm(r[i]) for i in order) for r in rows), [cols[i] for i in order]

fails = 0
for name in sorted(oracles):
    pq = f"{out}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
    grows, gcols = got.fetchall(), [d[0] for d in got.description]
    try:
        want = con.execute(oracles[name])
        wrows, wcols = want.fetchall(), [d[0] for d in want.description]
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    g, gc = canon(grows, gcols)
    w, wc = canon(wrows, wcols)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}")
        fails += 1
    elif g != w:
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        gs, ws = set(g), set(w)
        for r in list(gs - ws)[:5]:
            print(f"   spark-only: {r}")
        for r in list(ws - gs)[:5]:
            print(f"   oracle-only: {r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(g)} rows")

# rows-only queries (no oracle)
for pq in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(pq.rstrip("/"))
    if name in oracles:
        continue
    n = con.execute(f"SELECT count(*) FROM '{pq}/*.parquet'").fetchone()[0]
    print(f"ROWS {name}: {n}")

sys.exit(1 if fails else 0)
