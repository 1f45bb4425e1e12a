#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare row count / schema-sorted value
hash with the Spark-written parquet results. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    # sort columns by name, round floats, hash all values row-major after
    # sorting rows for order-insensitivity
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for r in df.itertuples(index=False):
        rows.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    rows.sort(key=lambda t: tuple(str(x) for x in t))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), cols, h

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    spark_df = con.sql(f"SELECT * FROM '{files[0]}'").df()
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    a, b = canon(spark_df), canon(duck_df)
    status = "OK  " if a == b else "FAIL"
    if a != b: fails += 1
    print(f"{status} {name}: spark(rows={a[0]},cols={a[1]},h={a[2]}) duck(rows={b[0]},cols={b[1]},h={b[2]})")
no_oracle = [d.split("/")[-1] for d in glob.glob(f"{out}/q_*") if d.split("/")[-1] not in oracle]
print("rows-only (no oracle):", no_oracle)
sys.exit(1 if fails else 0)
