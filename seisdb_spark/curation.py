"""End-to-end corpus curation: the composed training-set build.

``build_training_set`` chains the engine's curation operators into the
pipeline a 100 TB corpus actually runs, as lazy plans plus exactly two
actions (the shard write and the manifest):

1. **quality gate** — length window + stopword-ratio ceiling (pushed
   predicates, no shuffle);
2. **exact dedup** — md5 content hash, keep the minimum doc_id per hash
   (one shuffle on the digest);
3. **near-dup clustering** — banded MinHash-LSH candidates, exact-Jaccard
   verify on candidates only, connected components over the verified
   pairs, keep each component's canonical (minimum) doc;
4. **stratified sample** — per-language keep rates via a content-stable
   hash bucket (reproducible across runs/engines);
5. **deterministic shards** — ``write_training_shards``: content-hash
   shard assignment, per-shard sorted parquet, audit manifest.

Every stage is the already-verified registry operator (the per-stage
oracles live on ``quality_filter_pipeline`` / ``dedup_exact`` /
``dedup_cluster_components`` / ``stratified_sample`` /
``training_shard_manifest``); this module owns only the composition.
The composed keep-set is cross-checked against an independent pandas
re-implementation in tests/test_curation_build.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seisdb_spark.functions.graph import cc_auto, cc_exact_lazy
from seisdb_spark.queries.extensions import (
    CURATION_MAX_WORDS as MAX_WORDS,
)
from seisdb_spark.queries.extensions import (
    CURATION_MIN_WORDS as MIN_WORDS,
)
from seisdb_spark.queries.extensions import (
    CURATION_MAX_STOPWORD_RATIO as MAX_STOPWORD_RATIO,
)
from seisdb_spark.queries.extensions import (
    JACCARD_THRESHOLD,
    SAMPLE_RATES,
    STOPWORD_PATTERN,
    _jaccard_on_candidates,
)
from seisdb_spark.sources.tables import load_table, spread, write_training_shards


def curate(
    docs: DataFrame, cc: Callable[[DataFrame], DataFrame] = cc_exact_lazy
) -> DataFrame:
    """The keep-set plan over a documents table: gate -> exact dedup ->
    near-dup canonical selection -> stratified sample.  Returns the
    surviving (doc_id, lang, text) rows.

    ``cc`` picks the connected-components form for the near-dup stage.
    The default (:func:`cc_exact_lazy`) keeps the whole plan lazy — the
    ``curation_keep_set`` driver-query contract; action paths
    (:func:`build_training_set`) pass :func:`cc_auto`, which counts the
    verified pairs and switches to distributed pointer jumping when the
    edge list outgrows one task.

    Any gate changed HERE must be mirrored in the ``curation_keep_set``
    oracle and the pandas cross-check in tests/test_curation_build.py, or
    the driver hash gate silently breaks."""
    n_words = F.length("text") - F.length(F.translate(F.col("text"), " ", "")) + 1
    stopword_hits = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(STOPWORD_PATTERN), 0)
    )
    gated = docs.filter(
        n_words.between(MIN_WORDS, MAX_WORDS)
        & (stopword_hits.cast("double") / n_words <= MAX_STOPWORD_RATIO)
    )

    # exact dedup: keep the minimum doc_id per content hash
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    exact_kept = gated.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")

    # near-dup clustering over the gated+exact-deduped survivors: a doc
    # survives iff it IS its component's canonical (or is in no component)
    pairs = _jaccard_on_candidates(exact_kept).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    members = cc(pairs)
    losers = members.filter(F.col("v") != F.col("component")).select(
        F.col("v").alias("doc_id")
    )
    neardup_kept = exact_kept.join(losers, "doc_id", "left_anti")

    # deterministic stratified sample (content-stable hash bucket)
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
    rate = F.lit(0.5)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return neardup_kept.filter(bucket < 65536 * rate).select("doc_id", "lang", "text")


def build_training_set(
    spark: SparkSession, sf_dir: str, out_dir: str, n_shards: int = 8
) -> DataFrame:
    """Run the full curation over ``<sf_dir>/documents.parquet`` and write
    the surviving docs as deterministic training shards under ``out_dir``.
    Returns the executed shard manifest (shard, n_rows, key_checksum).

    This is an ACTION API (it writes), so the near-dup clustering goes
    through :func:`cc_auto`: the verified-pair list is materialized once,
    counted, and routed to distributed pointer jumping when it outgrows a
    single task — at a web-scale dup rate the pair list is billions of
    edges, which the lazy single-task union-find must never receive."""
    kept = curate(spread(load_table(spark, sf_dir, "documents")), cc=cc_auto)
    return write_training_shards(kept, out_dir, "doc_id", n_shards=n_shards)
