#!/usr/bin/env python3
"""Host-speed canary: a FIXED set of DuckDB probe queries timed in-process.

Usage: python3 scripts/canary_duck.py <sfdir> [reps]
Prints ONE JSON line: {"canary_total": sec, "queries": {name: sec}}.

Why: the bench VM drifts 2-4x between boots (r12 cost two full re-benches
before the host was diagnosed — BASELINE.md r12 note).  graft.Bench runs
this in the SAME invocation as the Spark walls and embeds the result in
bench_out.json, so every wall ships with its own yardstick and any
cross-round comparison can be normalized by the canary ratio.

DO NOT EDIT THE QUERIES.  They are the fixed ruler; changing them breaks
cross-round normalization.  They deliberately exercise scan+aggregate,
hash join, global sort, and a partitioned window — the shapes host drift
hits hardest.
"""
import json, os, sys, time
import duckdb

sfdir = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

TABLES = ["customer", "orders", "lineitem", "events"]

CANARY = {
    "scan_agg": """
        SELECT l_returnflag, COUNT(*) AS n,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS s
        FROM lineitem GROUP BY 1 ORDER BY 1""",
    "hash_join": """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1""",
    "global_sort": """
        SELECT MIN(l_orderkey) FROM (
          SELECT l_orderkey FROM lineitem
          ORDER BY l_extendedprice DESC, l_orderkey LIMIT 10000)""",
    "window": """
        SELECT MAX(rn) FROM (
          SELECT ROW_NUMBER() OVER (
            PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey
          ) AS rn FROM lineitem)""",
}

con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

out = {}
for name, sql in CANARY.items():
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        con.execute(sql).fetchall()
        times.append(time.monotonic() - t0)
    out[name] = round(min(times), 4)

print(json.dumps({"canary_total": round(sum(out.values()), 4),
                  "queries": out}))
