#!/usr/bin/env python
"""Interleaved same-session A/B: r17 BFS/SSSP loop shapes (per-round
two-scan union projection of the canonical edges) vs the r18 shapes
(one symmetric src-partitioned checkpoint, filter-before-distinct seeds,
BFS symmetric flip in the broadcast regime)."""

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
    BFS_MAX_HOPS,
    BFS_SEED_MOD,
    SSSP_MAX_EDGES,
    SSSP_WEIGHT_MOD,
    bfs_hops,
    copurchase_edges,
    sssp_cost,
)
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402


def bfs_old(edges, seed_mod=BFS_SEED_MOD, max_hops=BFS_MAX_HOPS):
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    seeds = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .where(F.col("node") % seed_mod == 0)
        .localCheckpoint(eager=False)
    )
    n_frontier = seeds.count()
    n_visited = n_frontier
    dist = seeds.select("node", F.lit(0).cast("bigint").alias("hops"))
    frontier = seeds
    for h in range(1, max_hops + 1):
        nxt_join = (
            sym.join(hint_broadcast_if_small(frontier, n_frontier), sym.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(hint_broadcast_if_small(dist.select("node"), n_visited), "node", "left_anti")
        )
        nxt = nxt_join.localCheckpoint(eager=False)
        c = nxt.count()
        n_frontier, n_visited = c, n_visited + c
        if c == 0:
            release_checkpoint(nxt)
            break
        dist = dist.unionByName(nxt.select("node", F.lit(h).cast("bigint").alias("hops")))
        frontier = nxt
    return dist.select(F.col("node").cast("bigint").alias("part_id"), F.col("hops").alias("hops"))


def sssp_old(edges, seed_mod=BFS_SEED_MOD, max_edges=SSSP_MAX_EDGES):
    w = (F.lit(1) + (F.col("u") + F.col("v")) % SSSP_WEIGHT_MOD).cast("bigint")
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst"), w.alias("w")).unionByName(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"), w.alias("w"))
    )
    dist = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .where(F.col("node") % seed_mod == 0)
        .select("node", F.lit(0).cast("bigint").alias("cost"))
        .localCheckpoint(eager=False)
    )
    dist_owned = True
    prev_cert = None
    n_dist = dist.count()
    for _ in range(max_edges):
        relax = sym.join(hint_broadcast_if_small(dist, n_dist), sym.src == dist.node).select(
            F.col("dst").alias("node"), (F.col("cost") + F.col("w")).alias("cost")
        )
        new_join = (
            dist.select("node", "cost").unionByName(relax).groupBy("node").agg(F.min("cost").alias("cost"))
        )
        new = new_join.localCheckpoint(eager=False)
        cert = tuple(new.agg(F.count(F.lit(1)), F.sum("cost").cast("bigint")).first())
        if dist_owned:
            release_checkpoint(dist)
        dist, dist_owned = new, True
        n_dist = int(cert[0] or 0)
        if cert == prev_cert:
            break
        prev_cert = cert
    return dist.select(F.col("node").cast("bigint").alias("part_id"), F.col("cost").alias("min_cost"))


def bfs_r18(edges, seed_mod=BFS_SEED_MOD, max_hops=BFS_MAX_HOPS):
    """The r18 single-hop-per-action loop (symmetrize + gated broadcast +
    lazy scale checkpoint), frozen as the A side of the r19 batching A/B."""
    from seisdb_spark.functions.graph import (
        LOOP_STATE_ROW_BYTES,
        _auto_broadcast_bytes,
        symmetrize,
    )

    spark = edges.sparkSession
    sym = symmetrize(edges, "u", "v")
    seeds = (
        sym.select(F.col("src").alias("node"))
        .where(F.col("node") % seed_mod == 0)
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_frontier = seeds.count()
    n_visited = n_frontier
    bcast_limit = _auto_broadcast_bytes(spark)
    dist = seeds.select("node", F.lit(0).cast("bigint").alias("hops"))
    frontier = seeds
    for h in range(1, max_hops + 1):
        if n_frontier * LOOP_STATE_ROW_BYTES <= bcast_limit:
            expand = sym.join(
                F.broadcast(frontier), sym.src == frontier.node
            ).select(F.col("dst").alias("node"))
        else:
            expand = sym.join(frontier, sym.src == frontier.node).select(
                F.col("dst").alias("node")
            )
        nxt = (
            expand.distinct()
            .join(
                hint_broadcast_if_small(dist.select("node"), n_visited),
                "node",
                "left_anti",
            )
            .localCheckpoint(eager=False)
        )
        c = nxt.count()
        n_frontier, n_visited = c, n_visited + c
        if c == 0:
            release_checkpoint(nxt)
            break
        dist = dist.unionByName(
            nxt.select("node", F.lit(h).cast("bigint").alias("hops"))
        )
        frontier = nxt
    return dist.select(
        F.col("node").cast("bigint").alias("part_id"), F.col("hops").alias("hops")
    )


def sssp_r18(edges, seed_mod=BFS_SEED_MOD, max_edges=SSSP_MAX_EDGES):
    """The r18 single-relaxation-per-action loop, frozen as the A side."""
    from seisdb_spark.functions.graph import (
        LOOP_STATE_ROW_BYTES,
        _auto_broadcast_bytes,
        symmetrize,
    )

    w = (F.lit(1) + (F.col("u") + F.col("v")) % SSSP_WEIGHT_MOD).cast("bigint")
    sym = symmetrize(edges.select("u", "v", w.alias("w")), "u", "v", "w")
    bcast_limit = _auto_broadcast_bytes(edges.sparkSession)
    dist = (
        sym.select(F.col("src").alias("node"))
        .where(F.col("node") % seed_mod == 0)
        .distinct()
        .select("node", F.lit(0).cast("bigint").alias("cost"))
        .localCheckpoint(eager=False)
    )
    dist_owned = True
    prev_cert = None
    n_dist = dist.count()
    for _ in range(max_edges):
        dist_side = (
            F.broadcast(dist)
            if n_dist * LOOP_STATE_ROW_BYTES <= bcast_limit
            else dist
        )
        relax = sym.join(dist_side, sym.src == dist.node).select(
            F.col("dst").alias("node"), (F.col("cost") + F.col("w")).alias("cost")
        )
        new = (
            dist.select("node", "cost")
            .unionByName(relax)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=False)
        )
        cert = tuple(
            new.agg(F.count(F.lit(1)), F.sum("cost").cast("bigint")).first()
        )
        if dist_owned:
            release_checkpoint(dist)
        dist, dist_owned = new, True
        n_dist = int(cert[0] or 0)
        if cert == prev_cert:
            break
        prev_cert = cert
    return dist.select(
        F.col("node").cast("bigint").alias("part_id"),
        F.col("cost").alias("min_cost"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-bfs-sssp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    li = load_table(spark, sf_dir, "lineitem")
    e = copurchase_edges(li)
    e.count()

    def sig(df, col):
        r = df.agg(F.count(F.lit(1)), F.sum(F.col("part_id") * (F.col(col) + 1))).first()
        return (int(r[0]), int(r[1]))

    for tag, old_fn, new_fn, col in (
        ("bfs", bfs_r18, bfs_hops, "hops"),
        ("sssp", sssp_r18, sssp_cost, "min_cost"),
    ):
        assert sig(old_fn(e), col) == sig(new_fn(e), col), tag
        olds, news = [], []
        for _ in range(5):
            t0 = time.perf_counter(); sig(old_fn(e), col); olds.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); sig(new_fn(e), col); news.append(time.perf_counter() - t0)
        print(f"{tag} OLD: median={statistics.median(olds):.3f} all={[round(x,3) for x in olds]}")
        print(f"{tag} NEW: median={statistics.median(news):.3f} all={[round(x,3) for x in news]}")
    spark.stop()


if __name__ == "__main__":
    main()
