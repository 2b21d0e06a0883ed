#!/usr/bin/env python3
"""Single-node comparison point: run every oracle SQL from a Verify dump
in DuckDB over the same parquet and time it.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [threads]

The oracle SQL is the SAME computation each engine query performs (the
t2 gate proves result equality), so total wall-clock here vs graft.Bench
is an apples-to-apples single-node throughput comparison against a
state-of-the-art embedded OLAP engine. Dev-only tool (driver-side
python deps); not part of the engine.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, threads: int = 32) -> int:
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times, failed = {}, {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.sql(oracle[name]).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            failed[name] = f"{type(e).__name__}: {e}"
    total = sum(times.values())
    print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                      "threads": threads, "queries": times, "failed": failed,
                      "sf": sf_dir}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 32))
