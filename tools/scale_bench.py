#!/usr/bin/env python3
"""Weak-scaling bench (dev tool): run graft.Bench on the heaviest gate
queries at sf0.1 and at one or more synthetic 5x corpora built by
tools/make_scale.py, and report per-query min-of-reps times plus the
scaling ratio per corpus mode.

A corpus-linear query should land near ratio 5 on local[32] (same
machine, 5x the rows); materially super-linear ratios flag shapes that
sf0.1 alone cannot expose — single-task sorts, pair-stage blowups,
broadcast limits (the q74 lesson: a 3-value-key window was invisible at
sf0.1 and fatal at 100x). Sub-linear ratios are fine (fixed overheads
amortizing).

Modes (r13 verdict item 4): the default `verbatim` corpus replicates
embedding vectors bit-exactly, so every replicated vector is an EXACT
copy and LSH buckets densify maximally — exact-copy physics. A `jitter`
corpus (make_scale.py with jitterEps > 0) perturbs replica vectors by a
documented epsilon — near-dup physics. Running LSH-stage queries under
both separates construction artifacts from real densification.

Usage: python3 tools/scale_bench.py <queries.csv> [out.json] [mode=dir ...]
  default mode set: verbatim=/root/repo/.scale/sf0.5
"""
import json
import os
import subprocess
import sys

QUERIES = sys.argv[1]
OUT = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALING_r14.json"
MODES = dict(kv.split("=", 1) for kv in sys.argv[3:]) or {
    "verbatim": "/root/repo/.scale/sf0.5"}
SF01 = "/root/testdata/sf0.1"


def run(sf_dir, only=None):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_ONLY=only or QUERIES)
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
    for mode, d in MODES.items():
        if not os.path.isdir(d):
            raise SystemExit(f"{d} ({mode}) missing - run tools/"
                             "make_scale.py first")
    t01 = run(SF01)
    per_mode = {mode: run(d) for mode, d in MODES.items()}
    rows = {}
    for q in sorted(t01):
        a = t01.get(q)
        entry = {"sf0.1_s": a, "modes": {}}
        for mode in MODES:
            b = per_mode[mode].get(q)
            entry["modes"][mode] = {
                "sf0.5_s": b,
                "ratio": round(b / a, 2) if a and b and a > 0 else None}
        rows[q] = entry
    doc = {
        "metric": "weak_scaling",
        "construction": {
            "verbatim": "5 key-disjoint replicas of sf0.1 (tools/"
                        "make_scale.py; documents word-salted so cross-"
                        "replica docs share no shingles; embedding "
                        "vectors replicated bit-exactly — exact-copy "
                        "physics)",
            "jitter": "same replicas with every replica-vector component "
                      "multiplied by (1 + eps*u), u deterministic from "
                      "md5(r, vec_id, dim) — near-dup physics "
                      "(make_scale.py jitterEps arg)",
            "sharedBands": "replicas with documents replicated VERBATIM "
                           "(ids shifted, text untouched) — cross-replica "
                           "copies share every MinHash band bucket, so "
                           "text band buckets densify K-fold "
                           "(make_scale.py sharedBands arg)"},
        "reps": "min-of-reps per graft.Bench (heavy queries min-of-3)",
        "linear_expectation": 5.0,
        "queries": rows,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    for q, r in sorted(rows.items()):
        ratios = ", ".join(
            f"{m}: x{v['ratio']}" for m, v in sorted(r["modes"].items()))
        print(f"{q}: {r['sf0.1_s']}s -> {ratios}")


if __name__ == "__main__":
    main()
