#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each fixture parquet as a DuckDB view named after the table, runs
every oracle SQL from <verifyOutDir>/oracle_sql.json, and compares against the
Spark result parquet written by graft.Verify: columns sorted by name, rows
sorted by all columns, exact value equality (plus a loose dtype check).
"""
import json
import sys
import glob
import os
import time

import duckdb

# Hard per-oracle wall budget. Round 11's q455 oracle took 654 s in DuckDB
# (multiply-referenced CTEs inlined ~4^rounds) while the other 467 averaged
# well under 1 s, and the driver's time-budgeted sweep zeroed the round.
# Any single oracle slower than this fails the sweep LOUDLY so the class of
# bug can never silently eat a correctness artifact again.
ORACLE_BUDGET_SEC = float(os.environ.get("GRAFT_ORACLE_BUDGET_SEC", "10"))
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    times = {}  # per-oracle wall — surfaced at the end so near-budget
                # oracles are visible BEFORE they flake a gated run
    for name in sorted(oracle):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            t0 = time.monotonic()
            duck = canon(con.execute(oracle[name]).fetchdf())
            oracle_sec = time.monotonic() - t0
            times[name] = oracle_sec
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if oracle_sec > ORACLE_BUDGET_SEC:
            print(f"FAIL {name}: oracle took {oracle_sec:.1f}s "
                  f"(budget {ORACLE_BUDGET_SEC:.0f}s) — pathological DuckDB "
                  f"plan; see playbook #43 (AS MATERIALIZED)")
            n_fail += 1
            continue
        try:
            spark = canon(pd.read_parquet(spark_path))
        except Exception as e:
            print(f"FAIL {name}: spark parquet read error: {e}")
            n_fail += 1
            continue
        if list(duck.columns) != list(spark.columns):
            print(f"FAIL {name}: columns differ: duck={list(duck.columns)} spark={list(spark.columns)}")
            n_fail += 1
            continue
        if len(duck) != len(spark):
            print(f"FAIL {name}: row counts differ: duck={len(duck)} spark={len(spark)}")
            n_fail += 1
            continue
        bad = []
        for c in duck.columns:
            dv, sv = duck[c].to_numpy(), spark[c].to_numpy()
            if dv.dtype.kind in "fc" or sv.dtype.kind in "fc":
                eq = (pd.isna(dv) & pd.isna(sv)) | (dv == sv)
            else:
                eq = np.array([a == b or (pd.isna(a) and pd.isna(b))
                               for a, b in zip(dv, sv)])
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[row {i}]: duck={dv[i]!r} spark={sv[i]!r} "
                           f"(dtypes {dv.dtype}/{sv.dtype}, {int((~eq).sum())} diffs)")
        # dtype sanity (loose: int-vs-int, float-vs-float)
        for c in duck.columns:
            dk, sk = duck[c].dtype.kind, spark[c].dtype.kind
            if {dk, sk} <= {"i", "u"} or dk == sk:
                continue
            if {dk, sk} == {"O", "O"}:
                continue
            bad.append(f"{c}: dtype kind mismatch duck={duck[c].dtype} spark={spark[c].dtype}")
        if bad:
            print(f"FAIL {name}: " + " | ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(duck)} rows)")
            n_pass += 1
    if times:
        slow = sorted(times.items(), key=lambda kv: -kv[1])[:5]
        print("\nslowest oracles: " +
              ", ".join(f"{n}={t:.2f}s" for n, t in slow) +
              f" (budget {ORACLE_BUDGET_SEC:.0f}s; anything past half "
              f"budget deserves the playbook #43/#55 treatment)")
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracles total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
