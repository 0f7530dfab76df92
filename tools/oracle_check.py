#!/usr/bin/env python3
"""Local replica of the driver's CORRECTNESS gate: for each query parquet in
the Verify outDir, run the matching oracle SQL in DuckDB and compare rows,
schema (sorted column names) and a value hash (columns sorted by name, rows
sorted, stringified). Usage: oracle_check.py <outDir>"""
import duckdb, json, sys, hashlib

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sqls = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return cols, len(rows), h, rows

fails = 0
import glob, os
names = sorted(os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p))
for name in names:
    try:
        spark_df = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"{name}: SPARK READ FAIL {e}"); fails += 1; continue
    if name not in sqls:
        print(f"{name}: NO ORACLE ({len(spark_df)} rows)"); fails += 1; continue
    try:
        ora_df = con.execute(sqls[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL FAIL {e}"); fails += 1; continue
    sc, sn, sh, srows = canon(spark_df)
    oc, on, oh, orows = canon(ora_df)
    ok = (sc == oc) and (sn == on) and (sh == oh)
    if not ok:
        fails += 1
        print(f"{name}: MISMATCH cols {sc}=={oc}:{sc==oc} rows {sn}=={on} hash {sh==oh}")
        for a, b in list(zip(srows, orows))[:200]:
            if a != b:
                print("  spark:", a)
                print("  duck :", b)
                break
    else:
        print(f"{name}: ok ({sn} rows)")
print(f"\n{len(names)-fails}/{len(names)} green")
sys.exit(1 if fails else 0)
