#!/usr/bin/env python3
"""Single-node comparison point: run every oracle SQL from a Verify dump
in DuckDB over the same parquet and time it.

Usage: bench_duckdb.py <sfDir> <verifyOutDir> [threads] [queries] [timeout_s]

  queries    optional comma-separated subset of oracle names — the soak
             control runs only the scale-path SQLs, not all 63
  timeout_s  optional per-query budget; a query past it is interrupted
             and reported in "timeout" (the replica-storm corpora make
             some exact-enumeration SQLs effectively unbounded)

The oracle SQL is the SAME computation each engine query performs (the
t2 gate proves result equality), so total wall-clock here vs graft.Bench
is an apples-to-apples single-node throughput comparison against a
state-of-the-art embedded OLAP engine. Dev-only tool (driver-side
python deps); not part of the engine.
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, threads: int = 32,
         subset=None, timeout_s=None) -> int:
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        # driver testdata is one file per table; Spark-written soak
        # corpora are directories of part files. Table-subset soak
        # corpora (ScaleSoak's 5th arg) hold only the tables their
        # queries read — skip the rest, a subset control never
        # references them
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if subset is not None:
        unknown = subset - set(oracle)
        if unknown:  # a typo'd name must not silently shrink the control
            sys.exit(f"unknown oracle queries: {sorted(unknown)}")
    names = sorted(oracle) if subset is None else [n for n in sorted(oracle) if n in subset]
    times, failed, timed_out = {}, {}, {}
    for name in names:
        timer, fired = None, threading.Event()
        if timeout_s:
            def _interrupt():
                fired.set()
                con.interrupt()
            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
        t0 = time.time()
        try:
            con.sql(oracle[name]).fetchall()
            times[name] = time.time() - t0
        except duckdb.InterruptException:
            timed_out[name] = time.time() - t0
        except Exception as e:
            failed[name] = f"{type(e).__name__}: {e}"
        finally:
            if timer:
                timer.cancel()
                timer.join()
                # timer fired but the query did not end as a timeout
                # (completed, or died on a real error first): the pending
                # interrupt flag would abort the NEXT query as a phantom
                # instant timeout — absorb it on a no-op first
                if fired.is_set() and name not in timed_out:
                    try:
                        con.sql("SELECT 1").fetchall()
                    except duckdb.InterruptException:
                        pass
    total = sum(times.values())
    print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                      "threads": threads, "queries": times, "failed": failed,
                      "timeout": timed_out, "sf": sf_dir}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 32,
                  set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None,
                  float(sys.argv[5]) if len(sys.argv) > 5 else None))
