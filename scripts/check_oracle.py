#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's
parquet against DuckDB running the oracle SQL on the same tables."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "target/verify-out"

con = duckdb.connect()
# scale-rehearsal controls: at sf1 DuckDB needs bounded threads (so a
# concurrent Spark job isn't starved), a big-disk temp dir (the knn
# oracle's token self-join spills >79GB), and an explicit memory cap
con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '32')}")
if os.environ.get("DUCKDB_TEMP"):
    con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMP']}'")
if os.environ.get("DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
# comma-separated oracle names whose DuckDB side is infeasible at the
# current scale (quadratic SQL twins); the Spark side still ran — record
# SKIP so the report distinguishes "oracle infeasible" from "mismatch"
skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
# ORACLE_ONLY: comma-separated allowlist for targeted re-checks
only = set(filter(None, os.environ.get("ORACLE_ONLY", "").split(",")))
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    # Spark writes directory-shaped tables (ScaleGen output); DuckDB needs a glob
    src = f"{t}/*.parquet" if os.path.isdir(t) else t
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    if name in skip:
        print(f"SKIP     {name}: oracle marked infeasible at this scale")
        continue
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"MISSING  {name}: no spark output")
        fail += 1
        continue
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fail += 1
        continue
    spark = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{spark_path}/*.parquet")],
                      ignore_index=True) if glob.glob(f"{spark_path}/*.parquet") else pd.DataFrame()
    # driver semantics: sort columns by name, then compare value multisets
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.astype(object).where(pd.notnull(df), None)
        rows = sorted([tuple(str(v) for v in r) for r in df.itertuples(index=False)])
        return df.columns.tolist(), rows
    sc, sr = norm(spark)
    dc, dr = norm(duck)
    if sc != dc:
        print(f"SCHEMA   {name}: spark={sc} duck={dc}")
        fail += 1
    elif sr != dr:
        diff_a = [r for r in sr if r not in set(dr)][:3]
        diff_b = [r for r in dr if r not in set(sr)][:3]
        print(f"ROWS     {name}: spark={len(sr)} duck={len(dr)} onlySpark={diff_a} onlyDuck={diff_b}")
        fail += 1
    else:
        print(f"OK       {name} ({len(sr)} rows)")
        ok += 1

print(f"\n{ok} ok, {fail} failed, {len(set(g.split('/')[-1] for g in glob.glob(out_dir + '/*') if os.path.isdir(g)) - set(oracle))} rows-only")
sys.exit(1 if fail else 0)
