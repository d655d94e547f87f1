#!/usr/bin/env python
"""Experiment: per-round cost of WCC loop variants at sf0.1 (guide §1.1
first-principles vs empirical).

Variants:
  A: current loop (gated broadcast, AQE on, src-agg exchange per round)
  B: edges checkpointed hash-partitioned by src with AQE off during the
     checkpoint build -> neighbour-min aggregate plans with no Exchange;
     round checkpoints also built AQE-off (their plans have no exchanges,
     so AQE contributes nothing to them anyway)
  C: B + two-hop neighbour-min per round (fewer rounds, same fixpoint)
Each variant runs the full loop to convergence 3x; prints rounds + wall.
Certificate/labels identical across variants (asserted: same final label
sum + count + sample hash).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import seisdb_spark.functions.graph as G  # noqa: E402
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402


def run_variant(spark, ew, variant: str):
    edges = G.undirect(ew, "u", "v")
    if variant in ("B", "C"):
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        edges = edges.repartition(n_shuffle, "src").localCheckpoint(eager=True)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    else:
        edges = edges.localCheckpoint(eager=True)
    m = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("v"), F.col("src").alias("l"))
        .localCheckpoint(eager=True)
    )
    seed = m.agg(F.count(F.lit(1)), F.sum("l").cast("bigint")).first()
    prev_cert = (seed[0], seed[1])
    n_vertices = int(seed[0] or 0)

    def one_round(mdf):
        nb = (
            edges.join(
                G.hint_broadcast_if_small(
                    mdf.select(F.col("v").alias("dst"), "l"), n_vertices
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("l").alias("nb_l"))
            .select(F.col("src").alias("v"), "nb_l")
        )
        m1 = mdf.join(G.hint_broadcast_if_small(nb, n_vertices), "v", "left").select(
            "v", F.least("l", F.coalesce("nb_l", F.col("l"))).alias("l")
        )
        if variant == "C":
            nb2 = (
                edges.join(
                    G.hint_broadcast_if_small(
                        m1.select(F.col("v").alias("dst"), "l"), n_vertices
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("l").alias("nb_l"))
                .select(F.col("src").alias("v"), "nb_l")
            )
            m1 = m1.join(G.hint_broadcast_if_small(nb2, n_vertices), "v", "left").select(
                "v", F.least("l", F.coalesce("nb_l", F.col("l"))).alias("l")
            )
        lk = m1.select(F.col("v").alias("lv"), F.col("l").alias("ll"))
        return m1.join(
            G.hint_broadcast_if_small(lk, n_vertices), F.col("l") == F.col("lv")
        ).select("v", F.col("ll").alias("l"))

    rounds = 0
    for i in range(1, 31):
        nxt_join = one_round(m)
        if variant in ("B", "C"):
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            nxt = nxt_join.localCheckpoint(eager=False)
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        else:
            nxt = nxt_join.localCheckpoint(eager=False)
        cert = tuple(nxt.agg(F.count(F.lit(1)), F.sum("l").cast("bigint")).first())
        G.release_checkpoint(m)
        m = nxt
        rounds = i
        if cert == prev_cert:
            break
        prev_cert = cert
    final = m.select(F.md5(F.concat_ws(",", "v", "l")).alias("h")).agg(
        F.count(F.lit(1)), F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint"))
    ).first()
    G.release_checkpoint(m)
    G.release_checkpoint(edges)
    return rounds, (int(final[0]), int(final[1]))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-wcc-variants")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    from seisdb_spark.queries.graph_queries import wcc_edges

    li = load_table(spark, sf_dir, "lineitem")
    ew = wcc_edges(li)
    ew.count()

    sigs = {}
    for variant in ("A", "B", "C", "A", "B", "C", "A", "B", "C"):
        t0 = time.perf_counter()
        rounds, sig = run_variant(spark, ew, variant)
        dt = time.perf_counter() - t0
        sigs.setdefault(variant, sig)
        ok = "OK" if sigs[variant] == sig and sig == sigs.get("A", sig) else "MISMATCH"
        print(f"variant {variant}: rounds={rounds} wall={dt:.3f}s sig={sig} {ok}")
    spark.stop()


if __name__ == "__main__":
    main()
