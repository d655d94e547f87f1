#!/usr/bin/env python
"""Focused micro-bench: time a named subset of registry queries in a FRESH
session, isolated from the full 26-query bench loop.

Purpose (round 7): adjudicate the three LSH-family warm regressions the
round-6 notes mislabelled as noise (`dedup_incremental_probe` +52 %,
`minhash_lsh_candidates` +49 %, `simhash_fingerprint` +44 % vs r5, each
outside its r6 min/max spread).  The code paths are unchanged r5->r6
(`git diff c1c9bab..HEAD -- seisdb_spark/functions/text.py` is empty and
none of the three query bodies changed), so the candidate causes are
(a) shared-session context — 3 more queries and ~15 more registered plans
in the same JVM mean more JIT'd code, more plan-cache entries, more GC
pressure by the time the loop reaches these queries — or (b) machine
drift.  Running the SAME subset isolated at HEAD and at the r5 tag on the
same machine minutes apart separates the two.

Usage: python tools/bench_focus.py q1 q2 ... [--n 7] [--sf-dir DIR]
Prints one JSON line {"queries": {name: median}, "min_max": {...}, "n": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=7)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from seisdb_spark.queries import REGISTRY
    from seisdb_spark.session import get_spark

    spark = get_spark(app_name="seisdb-bench-focus")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(args.sf_dir, "region.parquet")).count()

    med: dict[str, float] = {}
    mm: dict[str, list[float]] = {}
    for name in args.names:
        spec = REGISTRY[name]

        def one_pass() -> float:
            # fixpoint (driver-loop) queries iterate at plan build: defeat
            # the plan cache inside the timed region, same as bench.py
            if spec.fixpoint:
                spark.__dict__.get("_seisdb_plan_cache", {}).pop(
                    (name, args.sf_dir), None
                )
            t0 = time.perf_counter()
            spec.spark(spark, args.sf_dir).count()
            return time.perf_counter() - t0

        one_pass()  # cold pass, untimed
        samples = []
        for _ in range(args.n):
            samples.append(one_pass())
        med[name] = round(statistics.median(samples), 4)
        mm[name] = [round(min(samples), 4), round(max(samples), 4)]
    print(json.dumps({"queries": med, "min_max": mm, "n": args.n}))
    spark.stop()


if __name__ == "__main__":
    main()
