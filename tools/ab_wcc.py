#!/usr/bin/env python
"""Same-session A/B of graph_wcc_membership (full registry query, plan
cache defeated per pass) with the loop-state broadcast gating ON vs OFF —
interleaved passes so machine drift hits both arms equally."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import seisdb_spark.functions.graph as G  # noqa: E402
from seisdb_spark.queries import REGISTRY  # noqa: E402
from seisdb_spark.session import get_spark  # noqa: E402

NAME = "graph_wcc_membership"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-wcc")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spec = REGISTRY[NAME]
    real_hint = G.hint_broadcast_if_small

    def one_pass() -> float:
        spark.__dict__.get("_seisdb_plan_cache", {}).pop((NAME, sf_dir), None)
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).count()
        return time.perf_counter() - t0

    one_pass()  # warmup
    on, off = [], []
    for _ in range(4):
        G.hint_broadcast_if_small = real_hint
        on.append(one_pass())
        G.hint_broadcast_if_small = lambda df, n: df  # type: ignore[assignment]
        off.append(one_pass())
    print(f"hint ON : median={statistics.median(on):.3f} all={[round(x,3) for x in on]}")
    print(f"hint OFF: median={statistics.median(off):.3f} all={[round(x,3) for x in off]}")
    spark.stop()


if __name__ == "__main__":
    main()
