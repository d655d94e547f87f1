#!/usr/bin/env python
"""Experiment: broadcast-regime CC round shapes at sf0.1.

D: current library round (two-hop; nb materialized via its own broadcast)
E: right-outer pipelined round — m1 = nb.join(B(m), v, right_outer), so
   the neighbour-min never becomes its own broadcast build; B(m)/B(m1)
   are each built once per round and reused (same build key).
Both must produce identical labelings; interleaved timing."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import seisdb_spark.functions.graph as G  # noqa: E402
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table  # noqa: E402


def run(spark, ew, shape: str):
    n_pairs = ew.count()
    edges = G.partitioned_edge_checkpoint(
        G.symmetrize(ew, "u", "v"), "src", 2 * n_pairs
    )
    m = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("v"), F.col("src").alias("l"))
        .localCheckpoint(eager=False)
    )
    seed = m.agg(F.count(F.lit(1)), F.sum("l").cast("bigint")).first()
    prev = (seed[0], seed[1])
    nv = int(seed[0] or 0)

    def round_D(mdf):
        return G._cc_round(mdf, edges, nv)

    def round_E(mdf):
        m1 = mdf
        for _ in range(2):
            bm = F.broadcast(
                m1.select(F.col("v").alias("mv"), F.col("l").alias("ml"))
            )
            nb = (
                edges.join(bm, edges.dst == F.col("mv"))
                .groupBy("src")
                .agg(F.min("ml").alias("nb_l"))
                .select(F.col("src").alias("v"), "nb_l")
            )
            # right-outer against the SAME broadcast (same build key v):
            # the min pipeline feeds its consumer in-stage, no nb broadcast
            m1 = nb.join(bm, nb.v == F.col("mv"), "right_outer").select(
                F.col("mv").alias("v"),
                F.least("ml", F.coalesce("nb_l", "ml")).alias("l"),
            )
        lk = m1.select(F.col("v").alias("lv"), F.col("l").alias("ll"))
        return m1.join(
            F.broadcast(lk), F.col("l") == F.col("lv")
        ).select("v", F.col("ll").alias("l"))

    fn = round_D if shape == "D" else round_E
    rounds = 0
    for i in range(1, 31):
        nxt = fn(m).localCheckpoint(eager=False)
        cert = tuple(nxt.agg(F.count(F.lit(1)), F.sum("l").cast("bigint")).first())
        G.release_checkpoint(m)
        m = nxt
        rounds = i
        if cert == prev:
            break
        prev = cert
    sig = m.agg(
        F.count(F.lit(1)), F.sum(F.col("v") * (F.col("l") + 7)).cast("bigint")
    ).first()
    G.release_checkpoint(m)
    G.release_checkpoint(edges)
    return rounds, (int(sig[0]), int(sig[1]))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-round-shape")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    from seisdb_spark.queries.graph_queries import wcc_edges

    li = load_table(spark, sf_dir, "lineitem")
    ew = wcc_edges(li)
    ew.count()

    sigs = {}
    times = {"D": [], "E": []}
    for _ in range(5):
        for shape in ("D", "E"):
            t0 = time.perf_counter()
            rounds, sig = run(spark, ew, shape)
            times[shape].append(time.perf_counter() - t0)
            sigs.setdefault(shape, sig)
            assert sigs[shape] == sig
    assert sigs["D"] == sigs["E"], sigs
    print("signatures identical:", sigs["D"])
    for shape in ("D", "E"):
        print(f"{shape}: median={statistics.median(times[shape]):.3f} all={[round(x,3) for x in times[shape]]}")
    spark.stop()


if __name__ == "__main__":
    main()
