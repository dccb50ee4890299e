#!/usr/bin/env python3
"""Engine-vs-engine baseline: time each oracle SQL in DuckDB on the
same parquet tables the Spark queries read (same machine, all cores).

The oracle SQL is the correctness formulation (SparkEntry.oracleSql) —
for most queries an idiomatic analytic query, but for a few
deliberately brute-force shapes (trend-scan lead sweeps, recursive
scans) written for verifiability, not speed; those are flagged in the
SURVEY §6k table rather than silently counted as DuckDB's best.

Usage: python3 tools/duckbench.py <sfDir> <oracle_sql.json> [limitSec]
Prints one JSON object: {query: {"sec": best, "reps": n}} with
{"timeout": limit} for queries interrupted at the limit.
"""
import json
import sys
import threading
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sfdir, oracle_path, limit=180.0):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        import os
        if os.path.isdir(p):
            # Spark-written table: a directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    out = {}
    for name, sql in sorted(oracle.items()):
        best, reps = None, 0
        for rep in range(3):
            timer = threading.Timer(limit, con.interrupt)
            timer.start()
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                reps += 1
            except duckdb.InterruptException:
                out[name] = {"timeout": limit}
                break
            except Exception as e:
                out[name] = {"error": str(e)[:200]}
                break
            finally:
                timer.cancel()
            # slow queries: one measured rep is enough
            if dt > 5.0:
                break
        if name not in out:
            out[name] = {"sec": round(best, 4), "reps": reps}
        print(f"  {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 180.0)
