#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same
parquet tables and compare row sets (columns sorted by name, rows
sorted, values normalized). Usage: check_oracle.py [sfdir] [outdir]
"""
import sys, json, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, int):
        return int(v)
    return v

fails = ok = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        duck = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    spark = con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetch_arrow_table()
    dcols = sorted(duck.column_names)
    scols = sorted(spark.column_names)
    if dcols != scols:
        print(f"FAIL {name}: columns differ duck={dcols} spark={scols}")
        fails += 1; continue
    drows = sorted([tuple(norm(r[c]) for c in dcols) for r in duck.to_pylist()])
    srows = sorted([tuple(norm(r[c]) for c in dcols) for r in spark.to_pylist()])
    if drows == srows:
        print(f"OK   {name}: {len(drows)} rows"); ok += 1
    else:
        fails += 1
        print(f"FAIL {name}: duck {len(drows)} rows vs spark {len(srows)} rows")
        only_d = [r for r in drows if r not in set(srows)][:3]
        only_s = [r for r in srows if r not in set(drows)][:3]
        print(f"  only-duck: {only_d}\n  only-spark: {only_s}")

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{outdir}/q*")):
    name = os.path.basename(d)
    if name in oracle or not os.path.isdir(d):
        continue
    n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
    print(f"ROWS {name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")

print(f"\n{ok} ok, {fails} fail")
sys.exit(1 if fails else 0)
