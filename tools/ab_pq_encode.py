#!/usr/bin/env python
"""Interleaved same-session A/B for the PQ encode kernel (r18 opt round):

A  (current)  — one projection where each subspace's 16-fold HOF `dists`
               array literal appears 3x (argmin position, argmin value,
               qerr term): HOFs are CodegenFallback, so the folds may be
               evaluated up to 3x per row.
B  (hoisted)  — two-level select: `_d{s}` arrays computed ONCE in an inner
               projection (CollapseProject keeps non-cheap exprs referenced
               >1x separate), codes/err read the columns.
C  (unrolled) — same two-level shape but each distance is an inline
               left-associated subscript chain (whole-stage codegen,
               no HOF) — candidate per guide §4.1/§1.2; risk is the Janino
               JIT tax documented in functions/vectors.py.

All three must produce BYTE-IDENTICAL (vec_id, codes, qerr) rows; timing is
interleaved A/B/C x N with a noop sink (guide §1.4).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.functions import pq as pq_lib  # noqa: E402
from seisdb_spark.functions.cluster import _dist2_expr  # noqa: E402
from seisdb_spark.queries.vector_store import (  # noqa: E402
    PQ_N_SUB,
    PQ_SEED_K,
    _books_from_seeds,
    _seed_vectors,
)
from seisdb_spark.session import get_spark  # noqa: E402
from seisdb_spark.sources.tables import load_table, spread  # noqa: E402


def encode_a(emb, books):
    # the pre-r18-opt pq_encode, frozen inline: ONE projection where each
    # subspace's `dists` HOF array appears 3x (argmin position, argmin
    # value, qerr term) — kept as the A side after pq.py adopted B
    sublen = len(books[0][0])
    code_exprs, err_exprs = [], []
    for s, cents in enumerate(books):
        sub = f"slice(embedding, {s * sublen + 1}, {sublen})"
        dists = "array(" + ", ".join(_dist2_expr(sub, c) for c in cents) + ")"
        code_exprs.append(f"(array_position({dists}, array_min({dists})) - 1)")
        err_exprs.append(f"array_min({dists})")
    codes = "array(" + ", ".join(code_exprs) + ")"
    err = "(" + ") + (".join(err_exprs) + ")"
    return emb.select(
        "vec_id",
        F.expr(codes).cast("array<int>").alias("codes"),
        F.round(F.expr(err), 6).alias("qerr"),
    )


def _mid(emb, books, dist_fn):
    sublen = len(books[0][0])
    d_cols = []
    for s, cents in enumerate(books):
        dists = (
            "array(" + ", ".join(dist_fn(s, sublen, c) for c in cents) + ")"
        )
        d_cols.append(F.expr(dists).alias(f"_d{s}"))
    mid = emb.select("vec_id", *d_cols)
    codes = "array(" + ", ".join(
        f"(array_position(_d{s}, array_min(_d{s})) - 1)"
        for s in range(len(books))
    ) + ")"
    err = "(" + ") + (".join(
        f"array_min(_d{s})" for s in range(len(books))
    ) + ")"
    return mid.select(
        "vec_id",
        F.expr(codes).cast("array<int>").alias("codes"),
        F.round(F.expr(err), 6).alias("qerr"),
    )


def encode_b(emb, books):  # hoisted, HOF folds — now the committed pq_encode
    return pq_lib.pq_encode(emb, books)


def encode_c(emb, books):  # hoisted, unrolled codegen chains
    def dist_fn(s, sublen, c):
        terms = [
            f"(CAST(embedding[{s * sublen + j}] AS DOUBLE)"
            f" - CAST({v!r} AS DOUBLE))"
            f" * (CAST(embedding[{s * sublen + j}] AS DOUBLE)"
            f" - CAST({v!r} AS DOUBLE))"
            for j, v in enumerate(c)
        ]
        return "(" + ") + (".join(terms) + ")"

    return _mid(emb, books, dist_fn)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-pq-encode")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    books = _books_from_seeds(_seed_vectors(spark, sf_dir, PQ_SEED_K), PQ_N_SUB)

    variants = {"A": encode_a, "B": encode_b, "C": encode_c}

    def sig(df):
        r = df.agg(
            F.count(F.lit(1)),
            F.sum(F.expr("vec_id * (aggregate(codes, 0L, (a, x) -> a * 17 + x) + 7)")),
            F.sum(F.round(F.col("qerr") * 1e6).cast("bigint")),
        ).first()
        return tuple(int(x) for x in r)

    sigs = {k: sig(fn(emb, books)) for k, fn in variants.items()}
    assert sigs["A"] == sigs["B"] == sigs["C"], sigs
    print("signatures match:", sigs["A"])

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    cold = {}
    for k, fn in variants.items():  # first-execution (JIT) cost per variant
        t0 = time.perf_counter()
        noop(fn(emb, books))
        cold[k] = time.perf_counter() - t0
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(7):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            noop(fn(emb, books))
            times[k].append(time.perf_counter() - t0)
    for k in variants:
        print(
            f"{k}: cold={cold[k]:.3f} median={statistics.median(times[k]):.3f} "
            f"all={[round(x, 3) for x in times[k]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
