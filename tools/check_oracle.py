#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: reads Verify output dir,
runs each oracle SQL in DuckDB over the sf parquet tables, compares
row count / schema (sorted column names) / value hash."""
import sys, os, json, glob
import duckdb
import pandas as pd
import hashlib

outdir, sfdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # round floats to stabilize, stringify everything
    for c in df.columns:
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(6)
    rows = sorted(df.astype(str).values.tolist())
    return hashlib.sha256(json.dumps(rows).encode()).hexdigest(), len(rows), sorted(df.columns)

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        print(f"MISSING {name}"); n_fail += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in glob.glob(spark_dir + "/*.parquet")])
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        print(f"ORACLE_ERR {name}: {e}"); n_fail += 1; continue
    sh, sn, sc = canon(sdf)
    dh, dn, dc = canon(ddf)
    if sc != dc:
        print(f"SCHEMA_MISMATCH {name}: spark={sc} duck={dc}"); n_fail += 1
    elif sn != dn:
        print(f"ROWS_MISMATCH {name}: spark={sn} duck={dn}"); n_fail += 1
    elif sh != dh:
        print(f"HASH_MISMATCH {name} ({sn} rows)")
        m = sdf.reindex(sorted(sdf.columns), axis=1).astype(str)
        d = ddf.reindex(sorted(ddf.columns), axis=1).astype(str)
        sm = set(map(tuple, m.values.tolist())); dm = set(map(tuple, d.values.tolist()))
        only_s = list(sm - dm)[:3]; only_d = list(dm - sm)[:3]
        print("  spark-only:", only_s)
        print("  duck-only :", only_d)
        n_fail += 1
    else:
        print(f"PASS {name} ({sn} rows)"); n_pass += 1

print(f"== {n_pass} pass / {n_fail} fail ==")
sys.exit(1 if n_fail else 0)
