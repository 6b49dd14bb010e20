#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles and diff. Usage: check.py <outDir> <sfDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
# guard against stale results: oracle_sql.json must be newer than any
# result dir left over from a previous run (Verify rewrites everything)
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []
for name in sorted(os.listdir(outdir)):
    pdir = os.path.join(outdir, name)
    if not os.path.isdir(pdir):
        continue
    files = glob.glob(f"{pdir}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracles:
        rows_only.append((name, len(got)))
        continue
    try:
        import time
        t0 = time.time()
        exp = con.execute(oracles[name]).df()
        dt = time.time() - t0
        if dt > 10:
            print(f"SLOW  {name}: oracle took {dt:.0f}s in DuckDB")
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    got2 = got[sorted(got.columns)].reset_index(drop=True)
    exp2 = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got2.columns) != list(exp2.columns):
        fails.append((name, f"schema: got {list(got2.columns)} vs {list(exp2.columns)}"))
        continue
    if len(got2) != len(exp2):
        fails.append((name, f"rowcount: got {len(got2)} vs {len(exp2)}"))
        continue
    # order-insensitive canonical compare (stricter than needed if the
    # driver is order-sensitive, which our ORDER BYs already guarantee)
    try:
        g = got2.astype(str)
        e = exp2.astype(str)
        sg = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        se = e.sort_values(by=list(e.columns)).reset_index(drop=True)
        eq_ordered = g.equals(e)
        if sg.equals(se):
            passes.append((name, len(got2), "ordered" if eq_ordered else "UNORDERED-ONLY"))
        else:
            diff = (sg != se).any(axis=1)
            idx = diff[diff].index[:3]
            msg = "; ".join(
                f"row{i}: got={sg.loc[i].to_dict()} exp={se.loc[i].to_dict()}" for i in idx)
            fails.append((name, f"values: {msg}"))
    except Exception as e:
        fails.append((name, f"compare error: {e}"))

# a query that crashed in Verify produces no result dir — without this
# check it would silently vanish from the tally and the gate would pass
manifest_path = os.path.join(outdir, "manifest.json")
if os.path.exists(manifest_path):
    manifest = json.load(open(manifest_path))
    declared = set(manifest["queries"])
    # a crashed query may still have left a (partial) result dir —
    # the crash itself is a failure regardless
    for n in manifest.get("crashed", []):
        fails.append((n, "CRASHED in Verify (see its stderr)"))
else:
    declared = set(oracles)
present = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
for n in sorted(declared - present):
    fails.append((n, "MISSING: declared in SparkEntry.queries but no result dir (crashed?)"))

for n, c, o in passes:
    print(f"PASS  {n} ({c} rows, {o})")
for n, c in rows_only:
    print(f"ROWS  {n} ({c} rows, no oracle)")
for n, m in fails:
    print(f"FAIL  {n}: {m}")
print(f"\n{len(passes)} pass, {len(rows_only)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)
