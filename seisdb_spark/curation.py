"""End-to-end corpus curation: the composed training-set build.

``build_training_set`` chains the engine's curation operators into the
pipeline a 100 TB corpus actually runs, as lazy plans plus exactly two
actions (the shard write and the manifest):

1. **decontamination** — drop the benchmark holdout and every train doc
   sharing an 8-word shingle with it (broadcast semi-join — eval suites
   are MBs against the corpus);
2. **quality gate** — length window + stopword-ratio ceiling (pushed
   predicates, no shuffle);
3. **exact dedup** — md5 content hash, keep the minimum doc_id per hash
   (one shuffle on the digest);
4. **near-dup clustering** — banded MinHash-LSH candidates, exact-Jaccard
   verify on candidates only, connected components over the verified
   pairs, keep each component's canonical (minimum) doc;
5. **sample** — stratified per-language keep rates via a content-stable
   hash bucket (default), or greedy per-language token budgets
   (``sample="budgeted"``);
6. **deterministic shards** — ``write_training_shards``: content-hash
   shard assignment, per-shard sorted parquet, audit manifest; with
   ``pack=True`` each doc additionally carries its sequence-packing
   (seq, offset) assignment and shards coincide with packing shards.

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
    DECON_BENCH_MOD,
    JACCARD_THRESHOLD,
    SAMPLE_RATES,
    STOPWORD_PATTERN,
    _jaccard_on_candidates,
    budgeted_selection,
    decon_join,
    packing_assignment,
)
from seisdb_spark.sources.tables import load_table, spread, write_training_shards


def curate(
    docs: DataFrame,
    cc: Callable[[DataFrame], DataFrame] = cc_exact_lazy,
    sample: str = "stratified",
) -> DataFrame:
    """The keep-set plan over a documents table: decontaminate -> gate ->
    exact dedup -> near-dup canonical selection -> sample.  Returns the
    surviving (doc_id, lang, text) rows.

    Decontamination drops the benchmark holdout (doc_id % mod == 0, the
    eval-suite stand-in) and every train doc sharing an 8-word shingle
    with it — the broadcast semi-join of ``decontamination_overlap``
    applied as a gate stage.

    ``sample`` picks the final rebalancing stage: ``"stratified"`` (the
    driver-query contract: per-language keep rates via a content-stable
    hash bucket) or ``"budgeted"`` (greedy per-language token budgets via
    :func:`~seisdb_spark.queries.extensions.budgeted_selection`).

    ``cc`` picks the connected-components form for the near-dup stage.
    The default (:func:`cc_exact_lazy`) keeps the whole plan lazy — the
    ``curation_keep_set`` driver-query contract; action paths
    (:func:`build_training_set`) pass :func:`cc_auto`, which counts the
    verified pairs and switches to distributed pointer jumping when the
    edge list outgrows one task.

    Any gate changed HERE (on the default path) must be mirrored in the
    ``curation_keep_set`` oracle and the pandas cross-check in
    tests/test_curation_build.py, or the driver hash gate silently
    breaks."""
    contaminated = decon_join(docs).select("doc_id").distinct()
    n_words = F.length("text") - F.length(F.translate(F.col("text"), " ", "")) + 1
    stopword_hits = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(STOPWORD_PATTERN), 0)
    )
    gated = (
        docs.filter(
            (F.col("doc_id") % DECON_BENCH_MOD != 0)
            & n_words.between(MIN_WORDS, MAX_WORDS)
            & (stopword_hits.cast("double") / n_words <= MAX_STOPWORD_RATIO)
        )
        # the contaminated set is overlap-dependent: AQE broadcasts this
        # anti-join when it is small, as with the near-dup losers below
        .join(contaminated, "doc_id", "left_anti")
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

    if sample == "budgeted":
        # greedy per-language token budgets (id-reassignment-invariant
        # text-hash ordering) instead of rate-based thinning
        return budgeted_selection(neardup_kept).select("doc_id", "lang", "text")
    if sample != "stratified":
        raise ValueError(f"unknown sample mode {sample!r}")

    # deterministic stratified sample (content-stable hash bucket)
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
    rate = F.lit(0.5)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return neardup_kept.filter(bucket < 65536 * rate).select("doc_id", "lang", "text")


def build_training_set(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int = 8,
    sample: str = "stratified",
    pack: bool = False,
) -> DataFrame:
    """Run the full curation over ``<sf_dir>/documents.parquet`` and write
    the surviving docs as deterministic training shards under ``out_dir``.
    Returns the executed shard manifest (shard, n_rows, key_checksum).

    This is an ACTION API (it writes), so the near-dup clustering goes
    through :func:`cc_auto`: the verified-pair list is materialized once,
    counted, and routed to distributed pointer jumping when it outgrows a
    single task — at a web-scale dup rate the pair list is billions of
    edges, which the lazy single-task union-find must never receive.

    ``sample`` selects curate()'s final rebalancing stage (``"stratified"``
    or ``"budgeted"``).  ``pack=True`` appends the sequence-packing stage:
    each surviving doc gains (n_tokens, seq_in_shard, offset_in_seq) from
    :func:`~seisdb_spark.queries.extensions.packing_assignment` before the
    shard write, and the shard key switches to the TEXT digest so the
    writer's shard assignment coincides with the packing shards (both are
    content_hash32(text) mod n_shards) — the written layout IS the packed
    training set a dataloader streams."""
    kept = curate(
        spread(load_table(spark, sf_dir, "documents")), cc=cc_auto, sample=sample
    )
    if pack:
        packed = packing_assignment(kept, n_shards=n_shards)
        return write_training_shards(packed, out_dir, "text", n_shards=n_shards)
    return write_training_shards(kept, out_dir, "doc_id", n_shards=n_shards)
