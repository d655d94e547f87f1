#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registry queries into plans/<tag>/.

Optimization-round deliverable (r18): the judge cannot run Spark, so every
plan claim in OPTIMIZATION_r{N}.md is checked against committed
``plans/r{N}/<query>_{before,after}.txt`` files.  For driver-loop fixpoint
queries the returned DataFrame's plan shows only the final aggregate over
the last checkpointed iterate — the supersteps execute behind
localCheckpoint boundaries at plan build — so this tool additionally
appends the captured per-round executed plans (``*_ROUND_PLANS``) when the
query family exposes them; building the plan runs the loop once, which is
exactly what populates those lists.

Usage:
    python tools/dump_plans.py before [query ...]      # default: bench set
    python tools/dump_plans.py after graph_kcore_membership ...
Writes plans/r18/<query>_<tag>.txt (override dir with --out-dir).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query -> (module attr holding that loop's captured round plans)
ROUND_PLAN_SOURCES = {
    "graph_kcore_membership": "KCORE_ROUND_PLANS",
    "graph_bfs_hops": "BFS_ROUND_PLANS",
    "graph_sssp_cost": "SSSP_ROUND_PLANS",
    "graph_wcc_membership": "CC_ROUND_PLANS",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--out-dir", default="plans/r18")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from seisdb_spark.queries import REGISTRY
    from seisdb_spark.queries import graph_queries
    from seisdb_spark.session import get_spark

    names = args.names or [n for n, s in REGISTRY.items() if s.bench]
    os.makedirs(args.out_dir, exist_ok=True)

    spark = get_spark(app_name="seisdb-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in sorted(names):
        spec = REGISTRY[name]
        # bypass the plan cache so a prior invocation in this process can't
        # hand back a stale plan (and so fixpoint loops re-run, repopulating
        # their round-plan lists for the capture below)
        spark.__dict__.get("_seisdb_plan_cache", {}).pop((name, args.sf_dir), None)
        df = spec.spark(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = [f"== {name} [{args.tag}] sf_dir={args.sf_dir} ==\n", buf.getvalue()]
        attr = ROUND_PLAN_SOURCES.get(name)
        if attr:
            plans = getattr(graph_queries, attr)
            out.append(f"\n== captured per-round executed plans ({attr}, "
                       f"{len(plans)} rounds) ==\n")
            for i, p in enumerate(plans, 1):
                out.append(f"\n-- round {i} --\n{p}\n")
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write("".join(out))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
