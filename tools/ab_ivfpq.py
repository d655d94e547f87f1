#!/usr/bin/env python
"""Interleaved same-session A/B for the IVF-PQ probe (r19 opt round):

A (union)  — the pre-r19 ivfpq_topk, frozen inline: one filtered branch
             per probed list, unioned.  codes_df is a LAZY map-only plan
             (scan -> coarse assign -> residual -> 8x16 encode folds), so
             the union re-plans and RE-EXECUTES that whole chain once per
             probed list — no exchange in it for ReuseExchange to dedup.
B (case)   — the r19 pq.ivfpq_topk: ONE scan filtered `list IN probed`,
             per-list distance as a CASE over the same literal tables.

Both must produce IDENTICAL (vec_id, adc_dist2) top-k rows; timing is
interleaved A/B x N over the full composed ivfpq_adc_topk pipeline
(guide §1.4: count() on a 10-row result executes the whole plan).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.functions import pq as pq_lib  # noqa: E402
from seisdb_spark.queries import vector_store as vs  # noqa: E402
from seisdb_spark.session import get_spark  # noqa: E402


def ivfpq_topk_union(codes_df, coarse, books, query, nprobe=2, topk=10):
    """The pre-r19 union-of-filtered-branches form, frozen for the A side."""
    q = np.asarray(query, dtype=np.float64)
    d2 = []
    for c in coarse:
        s = 0.0
        for a, b in zip(q.tolist(), c):
            s += (a - float(b)) * (a - float(b))
        d2.append(s)
    probed = sorted(range(len(coarse)), key=lambda i: (d2[i], i))[:nprobe]
    parts = []
    for li in probed:
        table = pq_lib.adc_table(books, q - np.asarray(coarse[li]))
        terms = []
        for s, row in enumerate(table):
            lit = (
                "array("
                + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in row)
                + ")"
            )
            terms.append(f"element_at({lit}, codes[{s}] + 1)")
        dist = "(" + ") + (".join(terms) + ")"
        parts.append(
            codes_df.filter(F.col("list") == li).select(
                "vec_id", F.round(F.expr(dist), 6).alias("adc_dist2")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("adc_dist2", "vec_id").limit(topk)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark(app_name="ab-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")

    # Build the composed pipeline twice, swapping only the probe stage.
    import unittest.mock as mock

    def run(form):
        if form == "A":
            with mock.patch.object(pq_lib, "ivfpq_topk", ivfpq_topk_union):
                return vs.ivfpq_adc_topk(spark, sf_dir)
        return vs.ivfpq_adc_topk(spark, sf_dir)

    rows_a = [tuple(r) for r in run("A").collect()]
    rows_b = [tuple(r) for r in run("B").collect()]
    assert rows_a == rows_b, f"result drift!\nA={rows_a}\nB={rows_b}"
    print(f"identical top-k rows ({len(rows_a)})")

    times = {"A": [], "B": []}
    for _ in range(n):
        for form in ("A", "B"):
            df = run(form)
            t0 = time.perf_counter()
            df.count()
            times[form].append(time.perf_counter() - t0)
    import json

    print(
        json.dumps(
            {
                f: {
                    "median": round(statistics.median(ts), 4),
                    "min": round(min(ts), 4),
                    "max": round(max(ts), 4),
                }
                for f, ts in times.items()
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
