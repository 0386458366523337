#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir]
Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran.
Compares each <outdir>/<name> parquet against the oracle SQL in
<outdir>/oracle_sql.json executed by DuckDB over the same tables.
Strict compare: columns sorted by name, rows sorted by all columns,
values stringified exactly (decimals normalized).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np
from decimal import Decimal

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# GRAFT_DUCK_THREADS=n caps DuckDB's thread pool (default: all cores) so
# several long-clamp oracle re-adjudications can run side by side without
# thrashing the box.  Unset = driver-identical behavior.
_threads = os.environ.get("GRAFT_DUCK_THREADS", "")
if _threads:
    con.execute(f"SET threads = {int(_threads)}")
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table (gensf output): a directory
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

# Optional per-oracle wall clamp for above-gate scales (sf1): a naive
# quadratic oracle that the engine's scale twin exists to replace is
# interrupted and reported as ORACLE-TIMEOUT instead of hanging the
# sweep.  GRAFT_ORACLE_TIMEOUT=seconds; unset = driver-identical
# no-timeout behavior.
ORACLE_TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)

def run_oracle(sql):
    if not ORACLE_TIMEOUT:
        return con.execute(sql).fetchdf()
    import threading, time
    # The watchdog can fire in the window between fetchdf() returning
    # and done.set(); the pending interrupt then cancels the NEXT
    # (healthy) oracle.  An InterruptException that arrives well before
    # this query's own deadline is therefore a stale interrupt from the
    # previous watchdog -> retried once, not reported as a timeout.
    for attempt in (1, 2):
        done = threading.Event()
        def watchdog():
            if not done.wait(ORACLE_TIMEOUT):
                con.interrupt()
        w = threading.Thread(target=watchdog, daemon=True)
        start = time.monotonic()
        w.start()
        try:
            return con.execute(sql).fetchdf()
        except duckdb.InterruptException:
            if time.monotonic() - start >= ORACLE_TIMEOUT * 0.9 or attempt == 2:
                raise
        finally:
            done.set()
            w.join()

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

import datetime

def norm_cell(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, float):
        if np.isnan(v):
            return "NULL"  # duckdb fetchdf renders decimal NULL as NaN
        return repr(v)
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, np.ndarray):
        if v.ndim == 0:
            return norm_cell(v.item())
        return "[" + ",".join(norm_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, np.datetime64):
        return norm_cell(pd.Timestamp(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if v.hour == 0 and v.minute == 0 and v.second == 0 and v.microsecond == 0:
            return str(v.date())
        return str(v)
    if pd.isna(v):
        return "NULL"
    return str(v)

def canon(df):
    df = df[sorted(df.columns)]
    s = df.map(norm_cell) if hasattr(df, "map") else df.applymap(norm_cell)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s

def gate_hazards(df, oracle_checked=True):
    """Driver-gate strictness the value-compare can't see (round-2 verdict):
    the driver stringifies Decimal cells with trailing zeros (DuckDB side is
    float64 -> hash mismatch) and its row-sorter crashes on array cells.
    The row-sorter runs on EVERY entry (round 3 lost a rows-only DATE[]
    query to it), so arrays fail unconditionally; decimals only matter when
    an oracle hash-compare happens.  Scans FULL columns — only object-dtype
    columns can hold Decimal/array cells, and a mostly-null column's first
    offender may sit past any fixed-size head probe (round-3 ADVICE)."""
    haz = []
    for c in df.columns:
        if df[c].dtype != object:
            continue
        s = df[c].dropna()
        if not len(s):
            continue
        if oracle_checked and s.map(lambda x: isinstance(x, Decimal)).any():
            haz.append(f"col {c}: DECIMAL cells (driver renders trailing zeros)")
        if s.map(lambda x: isinstance(x, (np.ndarray, list))).any():
            haz.append(f"col {c}: ARRAY cells (driver row-sorter crashes)")
    return haz

# Above-gate-scale knobs (r13 ADVICE #4) — both default OFF so the
# default invocation stays driver-identical:
#   GRAFT_DIVERGE_OK=a,b,c  entries whose adaptive sizing rule is in its
#     BOUNDED (approximate) regime at this scale, so a value mismatch
#     against the exact oracle is BY DESIGN (e.g. the lineitem quantile
#     sketches at sf10, where adaptiveSketchCap snaps to 2^14).  They
#     are still compared — a match counts as a normal PASS; a mismatch
#     is reported as DIVERGE and does not fail the gate.
#   GRAFT_TIMEOUT_OK=1  count ORACLE-TIMEOUT entries (naive oracle
#     infeasible at this scale) as a named exclusion list instead of a
#     failure — pairs with GRAFT_ORACLE_TIMEOUT for sf10 sweeps.
DIVERGE_OK = set(x for x in os.environ.get("GRAFT_DIVERGE_OK", "").split(",") if x)
TIMEOUT_OK = bool(os.environ.get("GRAFT_TIMEOUT_OK", ""))

#   GRAFT_SHARD=i/n  process only entries with index % n == i (sorted
#     order) — lets a long sweep run as n parallel processes over the
#     same read-only data; concatenate the outputs for the full gate.
#   GRAFT_STREAM=1  print each verdict line as it is computed (flushed)
#     instead of only at the end — a multi-hour sf10 sweep is otherwise
#     a black box whose results are lost if it must be interrupted.
SHARD = os.environ.get("GRAFT_SHARD", "")
STREAM = bool(os.environ.get("GRAFT_STREAM", ""))

fails, passes, skipped, diverged, timeouts = [], [], [], [], []

def emit(kind, name, msg):
    if STREAM:
        print(f"{kind}  {name}: {msg}", flush=True)

def mismatch(name, msg):
    if name in DIVERGE_OK:
        diverged.append((name, msg)); emit("DIVERGE", name, msg)
    else:
        fails.append((name, msg)); emit("FAIL", name, msg)

#   GRAFT_ONLY=a,b,c  process only the named entries — re-adjudicate a
#     handful (e.g. ORACLE-TIMEOUT entries under a longer clamp) without
#     re-walking the registry.  Applied before sharding.
ONLY = set(x for x in os.environ.get("GRAFT_ONLY", "").split(",") if x)

names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
if ONLY:
    names = [nm for nm in names if nm in ONLY]
if SHARD:
    i, n = (int(x) for x in SHARD.split("/"))
    names = [nm for k, nm in enumerate(names) if k % n == i]
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); emit("FAIL", name, "no spark output")
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        haz = gate_hazards(spark_df, oracle_checked=False)
        if haz:
            fails.append((name, "driver-gate hazard: " + "; ".join(haz)))
            emit("FAIL", name, "driver-gate hazard")
        else:
            skipped.append((name, len(spark_df)))
            emit("SKIP", name, f"no oracle, {len(spark_df)} rows")
        continue
    haz = gate_hazards(spark_df)
    if haz:
        fails.append((name, "driver-gate hazard: " + "; ".join(haz)))
        emit("FAIL", name, "driver-gate hazard")
        continue
    try:
        duck_df = run_oracle(oracle[name])
    except duckdb.InterruptException:
        (timeouts if TIMEOUT_OK else fails).append(
            (name, f"ORACLE-TIMEOUT after {ORACLE_TIMEOUT}s "
                   "(naive oracle too slow at this scale)"))
        emit("TIMEOUT", name, f"after {ORACLE_TIMEOUT}s")
        continue
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        emit("FAIL", name, f"oracle error: {e}")
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        mismatch(name, f"schema: spark={list(a.columns)} duck={list(b.columns)}")
        continue
    if len(a) != len(b):
        mismatch(name, f"rows: spark={len(a)} duck={len(b)}")
        continue
    if not a.equals(b):
        diff = (a != b)
        idx = diff.any(axis=1)
        bad = a[idx].head(3), b[idx].head(3)
        mismatch(name, f"values differ on {int(idx.sum())} rows\nspark:\n{bad[0]}\nduck:\n{bad[1]}")
        continue
    passes.append((name, len(a))); emit("PASS", name, f"{len(a)} rows")

for n, r in passes:
    print(f"PASS  {n}  ({r} rows)")
for n, r in skipped:
    print(f"SKIP  {n}  (no oracle, {r} rows)")
for n, msg in diverged:
    print(f"DIVERGE  {n} (expected: bounded adaptive regime at this scale): {msg}")
for n, msg in timeouts:
    print(f"TIMEOUT  {n}: {msg}")
for n, msg in fails:
    print(f"FAIL  {n}: {msg}")
tail = ""
if diverged or DIVERGE_OK:
    tail += f", {len(diverged)} expected-divergent"
if timeouts or TIMEOUT_OK:
    tail += f", {len(timeouts)} oracle-timeout"
print(f"\n{len(passes)} pass, {len(skipped)} rows-only, {len(fails)} fail{tail}")
sys.exit(1 if fails else 0)
