"""Stage-level attribution for the two superlinear x1000 decades flagged by
the r11 verdict (watch item #1): ``repeated_passage_spans`` (x100 ratio 32.2
-> x1000 415.4) and ``dedup_cluster_components`` (12.8 -> 181.4).  Both are
strongly sub-linear overall, but ~13-14x across the last 10x of data means
the NEXT decade is not free — this tool names the term that grows.

It times each pipeline's stages cumulatively (each stage's DataFrame is
counted, so stage N's time includes re-running stages < N — the per-stage
cost is the DELTA between consecutive rows) at every provided sf_dir, and
records the stage output cardinalities, which separates "the data grew
superlinearly" from "constant data, growing cost" (spill / single-task
serialization / partition pressure).

Usage:
    python tools/profile_decades.py /root/testdata/sf0.1 \
        /tmp/seisdb_scale/x100 /tmp/seisdb_scale/x1000
Prints one JSON object; paste the verdict into BENCH_SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seisdb_spark.functions.graph import cc_exact_lazy  # noqa: E402
from seisdb_spark.queries.ext_common import _jaccard_on_candidates  # noqa: E402
from seisdb_spark.queries.ext_dedup import (  # noqa: E402
    JACCARD_THRESHOLD,
    passage_grams,
    passage_hits,
    passage_rep,
    passage_spans_from_hits,
)
from seisdb_spark.sources.tables import load_table, spread  # noqa: E402


def timed_count(df) -> tuple[float, int]:
    t0 = time.time()
    n = df.count()
    return round(time.time() - t0, 2), n


def profile_passages(spark, sf_dir: str) -> dict:
    docs = spread(load_table(spark, sf_dir, "documents"))
    grams = passage_grams(docs)
    rep = passage_rep(grams)
    hits = passage_hits(grams, rep)
    spans = passage_spans_from_hits(hits)
    out = {}
    out["t_grams"], out["n_grams"] = timed_count(grams)
    out["t_rep"], out["n_rep"] = timed_count(rep)
    out["t_hits"], out["n_hits"] = timed_count(hits)
    out["t_spans"], out["n_spans"] = timed_count(spans)
    return out


def profile_cc(spark, sf_dir: str) -> dict:
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh_pairs = _jaccard_on_candidates(docs)
    edges = sh_pairs.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b"
    )
    labels = cc_exact_lazy(edges)
    out = {}
    out["t_edges"], out["n_edges"] = timed_count(edges)
    out["t_cc"], out["n_vertices"] = timed_count(labels)
    return out


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    from seisdb_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    report = {"dirs": dirs, "passages": {}, "cc": {}}
    for d in dirs:
        key = os.path.basename(d.rstrip("/"))
        report["passages"][key] = profile_passages(spark, d)
        print(f"passages {key}: {report['passages'][key]}", file=sys.stderr)
        report["cc"][key] = profile_cc(spark, d)
        print(f"cc {key}: {report['cc'][key]}", file=sys.stderr)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
