#!/usr/bin/env python
"""Interleaved same-session A/B for repeated_passage_spans' flagged-gram
stage (r18 opt round):

A (current) — grams computed TWICE (once under the distinct+groupBy rep
              aggregate, once as the shuffle-hash join's probe side): the
              tokenize+explode+md5 scan is the pipeline's dominant map
              work and no exchange is shared between the two subtrees.
B (window)  — grams computed ONCE, shuffled ONCE by g; the >=MIN_DOCS
              distinct-doc flag comes from max(dense_rank) over the same
              partitioning (two window passes sharing one sort), then the
              flagged positions project straight into the islands stage.

Both must produce IDENTICAL (doc_id, span_start, span_end, n_grams) rows;
timing is interleaved A/B x N with a noop sink (guide §1.4).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.queries.ext_dedup import (  # noqa: E402
    PASSAGE_MIN_DOCS,
    passage_grams,
    passage_hits,
    passage_rep,
    passage_spans_from_hits,
)
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table, spread  # noqa: E402


def spans_a(docs):
    grams = passage_grams(docs)
    return passage_spans_from_hits(passage_hits(grams, passage_rep(grams)))


def spans_b(docs):
    grams = passage_grams(docs)
    byg = Window.partitionBy("g").orderBy("doc_id")
    over_g = Window.partitionBy("g")
    hits = (
        grams.withColumn("_nd", F.max(F.dense_rank().over(byg)).over(over_g))
        .filter(F.col("_nd") >= PASSAGE_MIN_DOCS)
        .select("doc_id", "i")
    )
    return passage_spans_from_hits(hits)


def spans_d(docs):
    # B with ONE window pass: min/max doc_id over the g partition (no
    # ordering — the sort is by g alone) flags >= 2 distinct docs; valid
    # exactly when PASSAGE_MIN_DOCS == 2.
    assert PASSAGE_MIN_DOCS == 2
    grams = passage_grams(docs)
    over_g = Window.partitionBy("g")
    hits = (
        grams.select(
            "doc_id",
            "i",
            F.min("doc_id").over(over_g).alias("_mn"),
            F.max("doc_id").over(over_g).alias("_mx"),
        )
        .filter(F.col("_mn") != F.col("_mx"))
        .select("doc_id", "i")
    )
    return passage_spans_from_hits(hits)


def spans_c(docs):
    # grams computed ONCE and exchanged ONCE by g; the repeated-gram set is
    # aggregated FROM that exchange (min!=max partial agg — constant state,
    # no Expand, map-side-combinable) and the flag join's probe side reads
    # the SAME exchange (ReusedExchange) co-partitioned with the aggregate.
    grams = passage_grams(docs).repartition("g")
    rep = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("g")
    )
    hits = grams.join(rep, "g").select("doc_id", "i")
    return passage_spans_from_hits(hits)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-passage")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    docs = spread(load_table(spark, sf_dir, "documents"))

    def sig(df):
        r = df.agg(
            F.count(F.lit(1)),
            F.sum(
                F.col("doc_id") * 1000003
                + F.col("span_start") * 1009
                + F.col("span_end") * 31
                + F.col("n_grams")
            ),
        ).first()
        return (int(r[0]), int(r[1]))

    sa, sb, sc, sd = (
        sig(spans_a(docs)), sig(spans_b(docs)), sig(spans_c(docs)),
        sig(spans_d(docs)),
    )
    assert sa == sb == sc == sd, (sa, sb, sc, sd)
    print("signatures match:", sa)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    times = {"A": [], "B": [], "C": [], "D": []}
    for _ in range(7):
        t0 = time.perf_counter(); noop(spans_a(docs)); times["A"].append(time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(spans_b(docs)); times["B"].append(time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(spans_c(docs)); times["C"].append(time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(spans_d(docs)); times["D"].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k}: median={statistics.median(ts):.3f} all={[round(x, 3) for x in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
