#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over views named
after the tables in <sfDir>, sorts columns by name and rows by all
columns, and reports exact-match / mismatch per query.

Dev-only tool (driver-side python deps); not part of the engine.
"""
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # soak corpora: Spark writes a DIRECTORY of part files, and a
        # table-subset corpus (ScaleSoak's 5th arg) omits tables its
        # queries never read — glob the former, skip the latter
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af, bf = a.astype(float), b.astype(float)
                eq = (af.values == bf.values) | (af.isna().values & bf.isna().values)
                if not eq.all():
                    i = int(np.argmax(~eq))
                    bad.append(f"{c}[{i}]: {af.iloc[i]!r} != {bf.iloc[i]!r} "
                               f"(diff {abs(af.iloc[i]-bf.iloc[i]):.3e})")
            else:
                if not a.astype(str).equals(b.astype(str)):
                    i = int(np.argmax((a.astype(str) != b.astype(str)).values))
                    bad.append(f"{c}[{i}]: {a.iloc[i]!r} != {b.iloc[i]!r}")
        if bad:
            print(f"FAIL  {name}: " + "; ".join(bad[:3]))
            failures += 1
        else:
            # dtype note (schema-level drift worth knowing about)
            dt = [f"{c}:{g[c].dtype}/{w[c].dtype}" for c in g.columns
                  if g[c].dtype != w[c].dtype]
            note = f"  [dtype drift: {', '.join(dt)}]" if dt else ""
            print(f"OK    {name} ({len(g)} rows){note}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
