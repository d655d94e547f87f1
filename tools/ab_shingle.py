#!/usr/bin/env python
"""Interleaved same-session A/B for the shingle-generation kernel (r19):

A (subscript) — the pre-r19 ``shingle_tokens``: explode a sequence of
                start positions, build each shingle AFTER the explode
                from array subscripts.  The Generate then carries the
                whole word array ``w`` as a child output — the ~doc-sized
                array is copied into every one of the ~50x-more-numerous
                shingle rows.
B (transform) — the r19 form: shingle STRINGS assembled per document
                inside a transform() HOF; only they cross the Generate.

Identity is asserted on the (doc_id, sh) multiset crc; timing is the
affected bench queries interleaved A/B x N (count() like the bench).
The md5-heavy passage gram scan was A/B'd the same way and the transform
form LOST there (0.23 -> 0.30 s — the heavy per-element expression runs
interpreted inside the HOF), so only shingle_tokens adopts it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import unittest.mock as mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.functions import text as text_lib  # noqa: E402
from seisdb_spark.functions.text import SHINGLE_K  # noqa: E402
from seisdb_spark.session import get_spark  # noqa: E402

QUERIES = (
    "curation_keep_set",
    "dedup_cluster_components",
    "dedup_keep_best",
    "dedup_incremental_probe",
    "minhash_lsh_candidates",
    "split_leakage_audit",
    "bloom_decontamination",
    "curation_pipeline_stats",
)


def shingle_tokens_subscript(docs, k=SHINGLE_K, distinct=True):
    """The pre-r19 form, frozen for the A side."""
    w = F.split(F.col("text"), " ")
    starts = F.when(
        F.size(w) >= k, F.sequence(F.lit(1), F.size(w) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select("doc_id", w.alias("w"), F.explode(starts).alias("i"))
    sh = F.concat_ws(" ", *[F.expr(f"w[i + {j - 1}]") for j in range(k)])
    out = exploded.select("doc_id", sh.alias("sh"))
    return out.distinct() if distinct else out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-shingle")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # every consumer module that imported the symbol by name
    import seisdb_spark.queries.ext_common as ext_common
    import seisdb_spark.queries.ext_dedup as ext_dedup
    import seisdb_spark.queries.ext_retrieval as ext_retrieval
    import seisdb_spark.queries.ext_text as ext_text

    patch_sites = [
        m
        for m in (text_lib, ext_common, ext_dedup, ext_retrieval, ext_text)
        if getattr(m, "shingle_tokens", None) is not None
    ]

    from seisdb_spark.queries import REGISTRY

    def run(form, name):
        # defeat the registry plan cache so each pass re-plans with the
        # patched kernel
        spark.__dict__.get("_seisdb_plan_cache", {}).pop((name, sf_dir), None)
        if form == "A":
            with mock.patch.multiple(
                patch_sites[0], shingle_tokens=shingle_tokens_subscript
            ), mock.patch.multiple(
                patch_sites[1], shingle_tokens=shingle_tokens_subscript
            ), mock.patch.multiple(
                patch_sites[2], shingle_tokens=shingle_tokens_subscript
            ), mock.patch.multiple(
                patch_sites[3], shingle_tokens=shingle_tokens_subscript
            ), mock.patch.multiple(
                patch_sites[4], shingle_tokens=shingle_tokens_subscript
            ):
                return REGISTRY[name].spark(spark, sf_dir)
        return REGISTRY[name].spark(spark, sf_dir)

    out = {}
    for name in QUERIES:
        ra = sorted(map(tuple, run("A", name).collect()))
        rb = sorted(map(tuple, run("B", name).collect()))
        assert ra == rb, f"result drift in {name}"
        times = {"A": [], "B": []}
        for _ in range(n):
            for form in ("A", "B"):
                df = run(form, name)
                t0 = time.perf_counter()
                df.count()
                times[form].append(time.perf_counter() - t0)
        out[name] = {
            f: round(statistics.median(ts), 3) for f, ts in times.items()
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
