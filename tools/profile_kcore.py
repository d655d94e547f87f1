#!/usr/bin/env python
"""r18 profiling harness: per-round wall times + executed plans for the
k-core peel (and optionally the other driver loops) at sf0.1.

Instruments kcore_core's round structure WITHOUT changing the library:
re-implements the loop inline with timers around each driver action, so
the measured breakdown (degree-agg job vs survivor count vs plan capture
vs checkpoint release) attributes the 8 s bench median to its parts.
Guide §1: measure first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.functions.graph import (  # noqa: E402
    hint_broadcast_if_small,
    release_checkpoint,
)
from seisdb_spark.plancheck import final_plan  # noqa: E402
from seisdb_spark.queries.graph_queries import (  # noqa: E402
    KCORE_K,
    KCORE_MAX_PEELS,
    copurchase_edges,
)
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-kcore")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    t0 = time.perf_counter()
    li = load_table(spark, sf_dir, "lineitem")
    e = copurchase_edges(li)
    m = e.count()
    t1 = time.perf_counter()
    print(f"edge build + count: {t1 - t0:.3f}s  m={m}")

    k = KCORE_K
    e_owned = False
    for rnd in range(1, KCORE_MAX_PEELS + 1):
        if m == 0:
            break
        r0 = time.perf_counter()
        deg = (
            e.select(F.col("u").alias("n"))
            .unionByName(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("n").localCheckpoint(eager=False)
        r1 = time.perf_counter()
        n_keep = keep.count()
        r2 = time.perf_counter()
        e2_join = (
            e.join(hint_broadcast_if_small(keep.select(F.col("n").alias("u")), n_keep), "u")
            .join(hint_broadcast_if_small(keep.select(F.col("n").alias("v")), n_keep), "v")
            .select("u", "v")
        )
        e2 = e2_join.localCheckpoint(eager=False)
        r3 = time.perf_counter()
        m2 = e2.count()
        r4 = time.perf_counter()
        plan = final_plan(e2_join)
        r5 = time.perf_counter()
        release_checkpoint(keep)
        print(
            f"round {rnd}: n_keep={n_keep} m2={m2} | build_deg={r1 - r0:.3f} "
            f"keep_count={r2 - r1:.3f} build_e2={r3 - r2:.3f} "
            f"e2_count={r4 - r3:.3f} plan_capture={r5 - r4:.3f}"
        )
        if rnd <= 3:
            print(f"--- round {rnd} executed plan ---")
            print(plan)
        if m2 == m:
            release_checkpoint(e2)
            break
        if e_owned:
            release_checkpoint(e)
        e, m, e_owned = e2, m2, True
    total = time.perf_counter() - t0
    print(f"total: {total:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
