#!/usr/bin/env python3
"""Driver-like correctness compare: each Verify output parquet vs its DuckDB
oracle (columns sorted by name, values hashed row-set-insensitively).
Usage: compare_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to strings for hashing
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None))
    return rows

fails, okays, rowsonly = [], [], []
for name in sorted(oracle):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    s, d = canon(spark_df), canon(duck_df)
    if len(s) != len(d):
        fails.append((name, f"row count {len(s)} vs {len(d)}"))
    elif s != d:
        diff = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:3]
        detail = "; ".join(f"spark={s[i]} duck={d[i]}" for i in diff)
        fails.append((name, f"value mismatch at {len([1 for a,b in zip(s,d) if a!=b])} rows, e.g. {detail[:300]}"))
    else:
        okays.append((name, len(s)))

for name in sorted(set(p.split('/')[-1] for p in glob.glob(f"{out}/*")) - set(oracle) - {"oracle_sql.json"}):
    files = glob.glob(f"{out}/{name}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    rowsonly.append((name, n))

print(f"== OK ({len(okays)}) ==")
for n, c in okays: print(f"  {n}: {c} rows")
print(f"== ROWS-ONLY ({len(rowsonly)}) ==")
for n, c in rowsonly: print(f"  {n}: {c} rows" + (" *** EMPTY ***" if c == 0 else ""))
print(f"== FAIL ({len(fails)}) ==")
for n, m in fails: print(f"  {n}: {m}")
sys.exit(1 if fails else 0)
