#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate.

Runs graft.Verify via sbt at a given SF dir, then compares each dumped
parquet result against its DuckDB oracle (views over the same parquet
tables). Columns are sorted by name, rows sorted by all columns, values
stringified before compare — a stricter stand-in for the driver's hash.

Usage: python3 tools/local_verify.py [sfDir] [outDir] [--skip-spark]
           [--only=name1,name2,...]
"""
import json, subprocess, sys, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
skip_spark = "--skip-spark" in sys.argv
only = next((a.split("=", 1)[1] for a in sys.argv
             if a.startswith("--only=")), None)

if not skip_spark:
    names_arg = f" {only}" if only else ""
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}{names_arg}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:])
        sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

import duckdb, pandas as pd
import pyarrow.parquet as pq

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok, bad = [], []

expected = set(open(f"{out}/names.txt").read().split())
dumped = {n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n))}
for missing in sorted(expected - dumped):
    bad.append((missing, "SPARK-SIDE FAILURE (no output dir)"))

def canon(df):
    import numpy as np
    df = df[sorted(df.columns)]
    def fmt(v):
        if isinstance(v, np.ndarray): v = v.tolist()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(fmt(x) for x in v) + "]"
        if v is None: return "NULL"
        try:
            if v != v: return "NULL"
        except Exception: pass
        if isinstance(v, (float, np.floating)):
            return repr(round(float(v), 9))
        # Decimal & everything else: raw str() ON PURPOSE — a Decimal
        # here renders '1858320' while DuckDB's .df() renders the same
        # value 1858320.0, which is EXACTLY the driver-hash divergence
        # class this tool must surface (round-9 q_join_size_estimate).
        s = str(v)
        if s.endswith(" 00:00:00"): s = s[:-9]  # date-vs-midnight-ts
        return s
    rows = sorted(tuple(fmt(v) for v in row) for row in df.itertuples(index=False))
    return rows

for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        bad.append((name, "no spark output")); continue
    spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        print(f"  rows-only  {name}: {len(spark_df)} rows " +
              ("OK" if len(spark_df) > 0 else "EMPTY!"))
        if len(spark_df) == 0: bad.append((name, "rows-only but 0 rows"))
        continue
    try:
        ora_df = con.sql(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}")); continue
    a, b = canon(spark_df), canon(ora_df)
    if a == b:
        # Second read path: the driver hashes the Spark output through a
        # NON-DuckDB reader. Re-read via pyarrow and compare its value
        # rendering against the oracle frame — catches type-rendering
        # divergences (e.g. DECIMAL(38,0) → Decimal vs float) that a
        # DuckDB-reads-both-sides compare can never see.
        try:
            pa_df = pq.ParquetDataset(d).read().to_pandas()
            c = canon(pa_df)
        except Exception as e:
            bad.append((name, f"pyarrow read error: {e}")); continue
        if c != b:
            diff = next(((i, x, y) for i, (x, y) in enumerate(zip(c, b))
                         if x != y), ("len", len(c), len(b)))
            bad.append((name, f"PYARROW-RENDER mismatch {diff}")); continue
        ok.append(name)
    else:
        diff = next(((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y),
                    ("len", len(a), len(b)))
        bad.append((name, f"mismatch {diff}"))

print(f"\nPASS {len(ok)}: {' '.join(ok)}")
if bad:
    print(f"\nFAIL {len(bad)}:")
    for n, why in bad: print(f"  {n}: {str(why)[:400]}")
    sys.exit(2)
print("ALL GREEN")
