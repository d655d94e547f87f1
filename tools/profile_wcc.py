#!/usr/bin/env python
"""r18 profiling: per-round wall times for the WCC pointer-jump loop at
sf0.1, with the gated broadcast ON (default) or OFF (--no-hint) — the
r18 baseline bench flagged graph_wcc_membership at 1.66x the r17
normalized ratio, and the only code change on its path is the gating
commit.  Guide §1: same-session A/B isolates the cause."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import seisdb_spark.functions.graph as G  # noqa: E402
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    no_hint = "--no-hint" in sys.argv
    if no_hint:
        G.hint_broadcast_if_small = lambda df, n: df  # type: ignore[assignment]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-wcc")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    from pyspark.sql import functions as F

    from seisdb_spark.plancheck import final_plan
    from seisdb_spark.queries.graph_queries import wcc_edges

    li = load_table(spark, sf_dir, "lineitem")
    t0 = time.perf_counter()
    e = wcc_edges(li)
    edges = G.undirect(e, "u", "v").localCheckpoint(eager=True)
    m = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("v"), F.col("src").alias("l"))
        .localCheckpoint(eager=True)
    )
    seed = m.agg(
        F.count(F.lit(1)),
        F.try_sum("l").cast("bigint"),
        F.max("l").cast("bigint"),
    ).first()
    prev_cert = (seed[0], seed[1])
    n_vertices = int(seed[0] or 0)
    print(f"setup (edges+labeling+seed): {time.perf_counter() - t0:.3f}s  |V|={n_vertices}")

    for i in range(1, 25):
        r0 = time.perf_counter()
        nxt_join = G._cc_round(m, edges, None if no_hint else n_vertices)
        nxt = nxt_join.localCheckpoint(eager=False)
        r1 = time.perf_counter()
        cert = tuple(nxt.agg(F.count(F.lit(1)), F.sum("l").cast("bigint")).first())
        r2 = time.perf_counter()
        plan = final_plan(nxt_join)
        G.release_checkpoint(m)
        m = nxt
        print(f"round {i}: build={r1 - r0:.3f} action={r2 - r1:.3f}")
        if i <= 2:
            print(plan)
        if cert == prev_cert:
            break
        prev_cert = cert
    print(f"total: {time.perf_counter() - t0:.3f}s rounds={i}")
    spark.stop()


if __name__ == "__main__":
    main()
