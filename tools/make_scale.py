#!/usr/bin/env python3
"""Build a synthetic weak-scaling corpus for the scaling bench (dev tool,
not part of the library; driver-side deps only).

sfK = K disjoint key-shifted replicas of /root/testdata/sf0.1 — a true
weak-scaling point: every replica is structurally identical to sf0.1 and
key-disjoint from the others, so a query whose cost is linear in the
corpus should run ~K x the sf0.1 time, and anything super-linear (a
single-task sort, a corpus-quadratic pair blowup) shows up as a bend.

Replica construction, per table:
  - every BIGINT entity key gets + r*1e9 (replicas join only within
    themselves — orders->customer, lineitem->orders etc. stay consistent)
  - documents: every WORD is suffixed `_r<r>` for r > 0, so cross-replica
    docs share ZERO shingles — dedup/LSH workloads see K independent
    corpora (replicating text verbatim would instead make every doc a
    5-way exact duplicate and quadratically inflate the pair stage,
    measuring the data, not the engine). n_chars is recomputed.
  - embeddings: vec_id shifted; by default vectors are kept verbatim
    (cosine workloads see a 5x-denser corpus; exact all-pairs baselines
    are O(n^2) in count regardless of content). Verbatim replication
    makes every replicated vector an EXACT copy, so LSH buckets densify
    maximally — that measures exact-copy physics. The optional JITTER
    mode (r13 verdict item 4) instead multiplies every component of a
    replica-r>0 vector by (1 + eps*u), u in [-1, ~0.992] derived
    deterministically from md5(r, vec_id, dim) — near-dup physics with a
    documented epsilon, separating "the corpus is 5x denser" from "the
    corpus is 5 exact copies". Noted caveat: IVF bucket histograms scale
    in density, not spread.
  - region/nation: single copy (fixed dimensions).

  - sharedBands mode (r16 verdict item 1's done-bar): documents are
    replicated VERBATIM (ids shifted, text untouched), so every replica
    of a doc shares EVERY MinHash band bucket with its copies — band
    buckets grow K-fold and the text-LSH candidate join's hot-bucket
    physics (one key carrying a B² fan-out) actually materializes. The
    default word-salted mode structurally CANNOT surface it (replicas
    share zero shingles), which is exactly how the un-capped text path
    stayed invisible to the scaling bench through r16. Embeddings stay
    verbatim in this mode.

Usage: python3 tools/make_scale.py <dstDir> [K] [jitterEps|sharedBands]
  jitterEps > 0 (e.g. 0.02) enables the jittered-embedding mode;
  the literal string `sharedBands` enables verbatim-text replication.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf0.5"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 5
SHARED_BANDS = len(sys.argv) > 3 and sys.argv[3] == "sharedBands"
JITTER = (float(sys.argv[3])
          if len(sys.argv) > 3 and not SHARED_BANDS else 0.0)
OFF = 1_000_000_000

# table -> list of BIGINT key columns to shift per replica
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def replica_select(table, cols, r):
    parts = []
    for name, typ in cols:
        if name in SHIFTS.get(table, []):
            parts.append(f"{name} + {r * OFF} AS {name}")
        elif (table == "embeddings" and name == "embedding" and r > 0
              and JITTER > 0):
            # deterministic per-(replica, vec, dim) jitter: two md5 hex
            # digits -> h in 0..255 -> u = (h-128)/128 in [-1, ~0.992];
            # component *= 1 + eps*u. No RNG state - the same corpus
            # always builds bit-identically.
            parts.append(
                "CAST(list_transform(range(1, len(embedding) + 1), d -> "
                "embedding[d] * (1.0 + "
                f"{JITTER!r} * (((strpos('0123456789abcdef', "
                f"substr(md5({r}::VARCHAR || '_' || vec_id::VARCHAR || "
                "'_' || d::VARCHAR), 1, 1)) - 1) * 16 + "
                f"strpos('0123456789abcdef', substr(md5({r}::VARCHAR || "
                "'_' || vec_id::VARCHAR || '_' || d::VARCHAR), 2, 1)) - 1 "
                "- 128) / 128.0))) AS FLOAT[]) AS embedding")
        elif (table == "documents" and name == "text" and r > 0
              and not SHARED_BANDS):
            parts.append(
                "array_to_string(list_transform(string_split(text, ' '),"
                f" x -> x || '_r{r}'), ' ') AS text")
        elif (table == "documents" and name == "n_chars" and r > 0
              and not SHARED_BANDS):
            parts.append(
                "CAST(length(array_to_string(list_transform("
                "string_split(text, ' '),"
                f" x -> x || '_r{r}'), ' ')) AS BIGINT) AS n_chars")
        else:
            parts.append(name)
    return f"SELECT {', '.join(parts)} FROM src"


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table in list(SHIFTS) + COPY_ONLY:
        src = f"{SRC}/{table}.parquet"
        dst = f"{DST}/{table}.parquet"
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}'")
        cols = [(d[0], d[1]) for d in con.execute(
            "DESCRIBE SELECT * FROM src").fetchall()]
        if table in COPY_ONLY:
            sql = "SELECT * FROM src"
        else:
            sql = " UNION ALL ".join(
                replica_select(table, cols, r) for r in range(K))
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
