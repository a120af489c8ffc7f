#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
tables, and diffs: column names (sorted), row count, and values (rows
sorted by all columns, column order sorted by name). Dev tool only — not
part of the shipped library.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str) if s.dtype == object else s)
    return df

def canon(df):
    # stringify everything for value comparison (tolerate dtype drift)
    out = []
    for col in df.columns:
        s = df[col]
        out.append(s.map(lambda v: repr(v.tolist()) if hasattr(v, 'tolist') else repr(v)))
    return pd.concat(out, axis=1)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/q*"))
    fails = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output"); fails += 1; continue
        spark_df = pq.read_table(files).to_pandas()
        if name not in oracles:
            print(f"SKIP  {name}: rows-only ({len(spark_df)} rows)"); continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"ORAERR {name}: {str(e).splitlines()[0]}"); fails += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(d.columns)}"); fails += 1; continue
        if len(s) != len(d):
            print(f"FAIL  {name}: rows {len(s)} vs {len(d)}"); fails += 1; continue
        cs, cd = canon(s), canon(d)
        if not cs.equals(cd):
            neq = (cs != cd).any(axis=1)
            idx = neq[neq].index[:3]
            print(f"FAIL  {name}: {int(neq.sum())}/{len(s)} differing rows, e.g.:")
            for i in idx:
                print(f"   spark: {s.iloc[i].to_dict()}")
                print(f"   duck : {d.iloc[i].to_dict()}")
            fails += 1; continue
        print(f"OK    {name}: {len(s)} rows")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} ({len(names)} queries)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
