#!/usr/bin/env python
"""Warm-session cost split for the fixpoint graph queries: edge derivation
vs loop, measured separately (guide §1).  Also times the windowed WCC
derivation and a full warm pass of each registry query for reference."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import seisdb_spark.functions.graph as G  # noqa: E402
from seisdb_spark.queries import REGISTRY  # noqa: E402
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-split")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    from seisdb_spark.queries.graph_queries import (
        bfs_hops,
        copurchase_edges,
        kcore_core,
        sssp_cost,
        wcc_edges,
    )

    li = load_table(spark, sf_dir, "lineitem")

    # warm the parquet/codegen path once
    copurchase_edges(li).count()

    for tag, fn in (("copurchase_edges", copurchase_edges), ("wcc_edges", wcc_edges)):
        for i in range(3):
            t0 = time.perf_counter()
            e = fn(li)
            n = e.count()
            dt = time.perf_counter() - t0
            print(f"{tag} warm pass {i}: {dt:.3f}s rows={n}")
            G.release_checkpoint(e)
            # deregistered by release; the session list stays flat

    # loops over a pre-materialized edge set
    e = copurchase_edges(li)
    e.count()
    for tag, fn in (
        ("kcore_core", kcore_core),
        ("bfs_hops", bfs_hops),
        ("sssp_cost", sssp_cost),
    ):
        for i in range(2):
            t0 = time.perf_counter()
            fn(e).count()
            print(f"{tag} loop-only warm pass {i}: {time.perf_counter() - t0:.3f}s")

    ew = wcc_edges(li)
    ew.count()
    for i in range(2):
        t0 = time.perf_counter()
        labels, rounds = G.connected_components(ew, "u", "v", max_rounds=24)
        labels.count()
        print(f"wcc loop-only warm pass {i}: {time.perf_counter() - t0:.3f}s rounds={rounds}")
    spark.stop()


if __name__ == "__main__":
    main()
