#!/usr/bin/env python
"""Interleaved same-session A/B: r17 k-core loop shape (keep checkpoint +
two actions/round, canonical edge representation) vs the r18 shape
(symmetric src-partitioned survivor set, one action/round)."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.functions.graph import (  # noqa: E402
    hint_broadcast_if_small,
    release_checkpoint,
)
from seisdb_spark.queries.graph_queries import (  # noqa: E402
    KCORE_K,
    KCORE_MAX_PEELS,
    copurchase_edges,
    kcore_core,
)
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402


def kcore_old(edges, k=KCORE_K, max_peels=KCORE_MAX_PEELS):
    e, e_owned = edges, False
    m = e.count()
    for _ in range(max_peels):
        if m == 0:
            break
        deg = (
            e.select(F.col("u").alias("n"))
            .unionByName(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("n").localCheckpoint(eager=False)
        n_keep = keep.count()
        e2_join = (
            e.join(hint_broadcast_if_small(keep.select(F.col("n").alias("u")), n_keep), "u")
            .join(hint_broadcast_if_small(keep.select(F.col("n").alias("v")), n_keep), "v")
            .select("u", "v")
        )
        e2 = e2_join.localCheckpoint(eager=False)
        m2 = e2.count()
        release_checkpoint(keep)
        if m2 == m:
            release_checkpoint(e2)
            break
        if e_owned:
            release_checkpoint(e)
        e, m, e_owned = e2, m2, True
    else:
        raise RuntimeError("no converge")
    return (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .select(F.col("n").cast("bigint").alias("part_id"), "core_degree")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-kcore")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    li = load_table(spark, sf_dir, "lineitem")
    e = copurchase_edges(li)
    e.count()

    def sig(df):
        r = df.agg(F.count(F.lit(1)), F.sum(F.col("part_id") * F.col("core_degree"))).first()
        return (int(r[0]), int(r[1]))

    s_old = sig(kcore_old(e))
    s_new = sig(kcore_core(e))
    assert s_old == s_new, (s_old, s_new)
    print("signatures match:", s_new)

    olds, news = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sig(kcore_old(e)); olds.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); sig(kcore_core(e)); news.append(time.perf_counter() - t0)
    print(f"OLD: median={statistics.median(olds):.3f} all={[round(x,3) for x in olds]}")
    print(f"NEW: median={statistics.median(news):.3f} all={[round(x,3) for x in news]}")
    spark.stop()


if __name__ == "__main__":
    main()
