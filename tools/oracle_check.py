#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (schema-insensitive: columns sorted by name, rows
sorted, floats rounded)."""
import json, math, subprocess, sys, glob, os

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
SKIP_RUN = os.environ.get("SKIP_VERIFY_RUN") == "1"

if not SKIP_RUN:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stdout.write(r.stderr[-3000:])
        sys.exit(1)

import duckdb
con = duckdb.connect()
for p in glob.glob(f"{SF_DIR}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# Verify records thrown queries here (always written, possibly empty), so a
# crashed query surfaces with its exception instead of a bare missing-dir.
try:
    verify_errors = json.load(open(f"{OUT}/errors.json"))
except Exception:
    verify_errors = {}

import numpy as np


class ArrayCell(Exception):
    pass


def canon(v):
    # Mirror the driver's pandas bridge: values arrive as numpy scalars, so
    # int64 vs float64 is VISIBLE (DuckDB HUGEINT sums render as float64 —
    # "149174.0" — while Spark emits int64 "149174"; round-1 q23/q26/q34/
    # q47/q59 hash-mismatched on exactly this). Array cells crash the
    # driver's sort_values ("unhashable numpy.ndarray", round-1 q49/q54) —
    # flag them as failures here too.
    if isinstance(v, (list, np.ndarray)):
        raise ArrayCell("array cell would crash the driver's pandas sorter")
    if isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return "f:0.0" if r == 0 else "f:" + repr(r)
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, int):
        return "i:" + str(v)
    return str(v)

def table_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    out = sorted("\x01".join(canon(row[i]) for i in order) for row in rows)
    return names, out

fails, passes = [], []
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{OUT}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, ("spark CRASHED: " + verify_errors[name])
                      if name in verify_errors else "spark output missing"))
        continue
    try:
        # .df() (not fetchall) to go through pandas like the driver does:
        # HUGEINT→float64, int64-with-null→float64, etc.
        gdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        got = list(gdf.itertuples(index=False, name=None))
        gcols = list(gdf.columns)
        wdf = con.execute(sql).df()
        want = list(wdf.itertuples(index=False, name=None))
        wcols = list(wdf.columns)
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    try:
        gn, gk = table_key(gcols, got)
        wn, wk = table_key(wcols, want)
    except ArrayCell as e:
        fails.append((name, str(e)))
        continue
    if gn != wn:
        fails.append((name, f"columns differ: spark={gn} duck={wn}"))
    elif gk != wk:
        diff = next((i for i, (a, b) in enumerate(zip(gk, wk)) if a != b),
                    min(len(gk), len(wk)))
        detail = (f"rows spark={len(gk)} duck={len(wk)}; first diff @{diff}:\n"
                  f"  spark: {gk[diff] if diff < len(gk) else '<none>'}\n"
                  f"  duck : {wk[diff] if diff < len(wk) else '<none>'}")
        fails.append((name, detail))
    else:
        passes.append(name)

rows_only = [os.path.basename(p) for p in glob.glob(f"{OUT}/q*")
             if os.path.basename(p) not in oracle]
# Rows-only outputs still go through the driver's pandas sorter: verify
# rows>0 and no array cells (round-1 q49 errored as rows-only).
for name in sorted(rows_only):
    try:
        rdf = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
        rows = list(rdf.itertuples(index=False, name=None))
        if not rows:
            fails.append((name, "rows-only output is EMPTY"))
        else:
            # Scan a prefix, not just row 0 — a nullable array column can
            # have None in the first row.
            for row in rows[:100]:
                for v in row:
                    canon(v)
    except ArrayCell as e:
        fails.append((name, str(e)))
    except Exception as e:
        fails.append((name, f"rows-only read error: {e}"))
print(f"\nPASS {len(passes)}: {' '.join(passes)}")
print(f"ROWS-ONLY {len(rows_only)}: {' '.join(sorted(rows_only))}")
print(f"FAIL {len(fails)}:")
for n, msg in fails:
    print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)
