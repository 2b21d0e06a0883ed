#!/usr/bin/env python3
"""Resolve the r14 (81-query) subset to full registry names and compare
an interleaved full-registry vs subset-registry clean-bench battery.

Usage:
  subset_ab.py names                 -> print comma-joined full names of the
                                        r14 subset (for SPARK_GRAFT_BENCH_ONLY)
  subset_ab.py compare A1,A2,.. B1,B2,..
                                     -> per-query median ratio of the shared
                                        queries across the two session lists
                                        (each arg a BENCH_DETAIL.json path)
"""
import json, sys, statistics, glob, os

def shorts_r14():
    return set(json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                           "BENCH_CLEAN_r14.json")))["queries"])

def full_names(detail_path):
    d = json.load(open(detail_path))
    return [q["name"] for q in d["queries"]]

def load(path):
    d = json.load(open(path))
    return {q["name"]: q["dur_s"] for q in d["queries"]}, \
           {q["name"]: q.get("ext_cpu", -1) for q in d["queries"]}

if sys.argv[1] == "names":
    # resolve shorts via any existing BENCH_DETAIL (full names recorded there)
    detail = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    r14 = shorts_r14()
    names = [n for n in full_names(detail) if n.split("_")[0] in r14]
    missing = r14 - {n.split("_")[0] for n in names}
    if missing:
        sys.stderr.write(f"WARNING: shorts not found in {detail}: {sorted(missing)}\n")
    print(",".join(sorted(names)))
elif sys.argv[1] == "compare":
    As, Bs = sys.argv[2].split(","), sys.argv[3].split(",")
    da = [load(p) for p in As]
    db = [load(p) for p in Bs]
    shared = set.intersection(*[set(d[0]) for d in da + db])
    rows = []
    for n in sorted(shared):
        ma = statistics.median([d[0][n] for d in da])
        mb = statistics.median([d[0][n] for d in db])
        ea = max(d[1][n] for d in da)
        eb = max(d[1][n] for d in db)
        rows.append((n, ma, mb, ma / mb if mb > 0 else float("nan"), ea, eb))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':34s} {'full_s':>8s} {'subset_s':>9s} {'ratio':>6s} {'extA':>5s} {'extB':>5s}")
    for n, ma, mb, r, ea, eb in rows:
        print(f"{n:34s} {ma:8.3f} {mb:9.3f} {r:6.2f} {ea:5.2f} {eb:5.2f}")
    ta = sum(r[1] for r in rows); tb = sum(r[2] for r in rows)
    print(f"\nshared-suite sum: full={ta:.1f}s subset={tb:.1f}s ratio={ta/tb:.3f}")
else:
    sys.exit("unknown mode")
