#!/usr/bin/env python3
"""DuckDB wall-times for oracle SQL — the BASELINE.md protocol at any sf.

Usage: python3 scripts/bench_duck.py <sfdir> <oracle_sql.json> [reps] [names...]
Times each oracle (min of reps, in-process, after view setup) and prints
one line per query.  Names default to every oracle in the file; a name
list restricts it (the BASELINE.md "slowest comparable entries" subset).
Set GRAFT_ORACLE_TIMEOUT=seconds to interrupt a runaway naive oracle —
reported as `timeout`, which IS the measurement (the scale-twin rationale).
"""
import json, os, re, sys, time, threading
import duckdb

sfdir = sys.argv[1]
oracle_path = sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
names = sys.argv[4:]

# Population-rule mirror of SparkEntry.demotedAt (r12 advice #1): above
# gate scale the exact single-task scaffolds are skipped on BOTH engines,
# so a cross-engine total always compares the same population.  The name
# list must stay in sync with SparkEntry.exactScaffolds — PopulationSpec
# asserts this file contains every scaffold name.  GRAFT_RUN_EXACT=1
# restores them, same as the Scala side.
EXACT_SCAFFOLDS = {
    "q_dedup_containment": "q_dedup_containment_hashed",
    "q_dedup_token_jaccard": "q_dedup_token_jaccard_hashed",
    "q_an_mad": "q_an_mad_sketch",
    "q_an_histogram_eqdepth": "q_an_histogram_eqdepth_sketch",
    "q_an_percentiles": "q_an_quantile_sketch",
    "q_an_outliers": "q_an_outliers_sketch",
}

def is_gate_scale(d):
    # Trailing sf<number> of the basename (SparkEntry.isGateScale twin);
    # unrecognized names count as gate scale so ad-hoc dirs keep all oracles.
    m = re.search(r"sf([0-9]*\.?[0-9]+)$", os.path.basename(os.path.normpath(d)))
    return m is None or float(m.group(1)) <= 0.011

DEMOTED = ({} if is_gate_scale(sfdir)
           or os.environ.get("GRAFT_RUN_EXACT") == "1" else EXACT_SCAFFOLDS)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)

con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
todo = names if names else sorted(oracle)
for name in todo:
    if name in DEMOTED:
        print(f"{name}\tdemoted (exact scaffold above gate scale; "
              f"production twin {DEMOTED[name]})")
        continue
    sql = oracle.get(name)
    if not sql:
        print(f"{name}\tno-oracle")
        continue
    times = []
    timed_out = False
    for _ in range(reps):
        # Same stale-interrupt guard as check.py: a watchdog firing in
        # the window between fetchall() returning and done.set() leaves
        # a pending interrupt that cancels the NEXT healthy query —
        # an interrupt long before this rep's own deadline is retried
        # once instead of being reported as a timeout.
        for attempt in (1, 2):
            done = threading.Event()
            w = None
            if TIMEOUT:
                def watchdog():
                    if not done.wait(TIMEOUT):
                        con.interrupt()
                w = threading.Thread(target=watchdog, daemon=True)
                w.start()
            # monotonic, not wall-clock: a clock step mid-rep would
            # misclassify a timeout vs a stale interrupt (check.py twin).
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
                times.append(time.monotonic() - t0)
                break
            except duckdb.InterruptException:
                if time.monotonic() - t0 >= TIMEOUT * 0.9 or attempt == 2:
                    timed_out = True
                    break
            finally:
                done.set()
                if w is not None:
                    w.join()
        if timed_out:
            break
    if timed_out:
        print(f"{name}\ttimeout>{TIMEOUT}s")
    else:
        print(f"{name}\t{min(times):.3f}\t({', '.join(f'{x:.3f}' for x in times)})")
