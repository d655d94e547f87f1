#!/usr/bin/env python
"""r18 profiling: execute graph_triangle_counts at sf0.1 and print the
AQE-FINAL plan — the initial plan shows the deg subtree ~5x and the adj
aggregate 2x with zero ReusedExchange; this checks whether AQE's runtime
exchange reuse actually dedups them (guide §1/§7.2)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seisdb_spark.plancheck import final_plan  # noqa: E402
from seisdb_spark.queries import REGISTRY  # noqa: E402
from seisdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "graph_triangle_counts"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    t0 = time.perf_counter()
    df.count()
    print(f"cold pass: {time.perf_counter() - t0:.3f}s")
    for _ in range(3):
        t0 = time.perf_counter()
        df.count()
        print(f"warm pass: {time.perf_counter() - t0:.3f}s")
    plan = final_plan(df)
    print(plan)
    reused = plan.lower().count("reusedexchange")
    print(f"\nReusedExchange nodes in final plan: {reused}")
    spark.stop()


if __name__ == "__main__":
    main()
