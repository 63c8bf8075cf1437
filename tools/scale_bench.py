#!/usr/bin/env python3
"""Weak-scaling bench (dev tool): run graft.Bench on the heaviest gate
queries at sf0.1 and at the synthetic sf0.5 built by tools/make_scale.py
(5 key-disjoint replicas of sf0.1), and report per-query min-of-reps
times plus the scaling ratio.

A corpus-linear query should land near ratio 5 on local[32] (same
machine, 5x the rows); materially super-linear ratios flag shapes that
sf0.1 alone cannot expose — single-task sorts, pair-stage blowups,
broadcast limits (the q74 lesson: a 3-value-key window was invisible at
sf0.1 and fatal at 100x). Sub-linear ratios are fine (fixed overheads
amortizing).

Usage: python3 tools/scale_bench.py <queries.csv> [out.json]
"""
import json
import os
import re
import subprocess
import sys

QUERIES = sys.argv[1]
OUT = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALING_r13.json"
SF01 = "/root/testdata/sf0.1"
SF05 = "/root/repo/.scale/sf0.5"


def run(sf_dir):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_ONLY=QUERIES)
    p = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    mins = {}
    for line in p.stdout.splitlines():
        if '"metric":"detail_min"' in line:
            mins = json.loads(line)["queries"]
    if not mins:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
        raise SystemExit(f"no detail_min line from bench at {sf_dir}")
    return mins


def main():
    if not os.path.isdir(SF05):
        raise SystemExit(f"{SF05} missing - run tools/make_scale.py first")
    t01 = run(SF01)
    t05 = run(SF05)
    rows = {}
    for q in sorted(t01):
        a, b = t01.get(q), t05.get(q)
        rows[q] = {"sf0.1_s": a, "sf0.5_s": b,
                   "ratio": round(b / a, 2) if a and b and a > 0 else None}
    doc = {
        "metric": "weak_scaling",
        "construction": "sf0.5 = 5 key-disjoint replicas of sf0.1 "
                        "(tools/make_scale.py; documents word-salted so "
                        "cross-replica docs share no shingles)",
        "reps": "min-of-reps per graft.Bench (heavy queries min-of-3)",
        "linear_expectation": 5.0,
        "queries": rows,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    for q, r in sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0)):
        print(f"{q}: {r['sf0.1_s']}s -> {r['sf0.5_s']}s  x{r['ratio']}")


if __name__ == "__main__":
    main()
