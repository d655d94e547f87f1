"""Declarative Bloom filter (functions/bloom.py) and the bloom-prefiltered
decontamination query built on it."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from seisdb_spark.functions.bloom import (
    BLOOM_MAX_BITS,
    BLOOM_MIN_BITS,
    bloom_bits_for,
    bloom_hit,
    build_bloom,
)
from seisdb_spark.plancheck import final_plan, has_node
from seisdb_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_bloom_bits_sizing():
    assert bloom_bits_for(0) == BLOOM_MIN_BITS
    assert bloom_bits_for(10**9) == BLOOM_MAX_BITS
    m = bloom_bits_for(5000)
    assert m >= 5000 * 10 and m & (m - 1) == 0  # covers keys, power of two


def test_bloom_no_false_negatives_and_sane_fpr(spark):
    """Every inserted key must hit (the property bloom-then-exact-verify
    pipelines rely on for oracle sharing); non-inserted keys must mostly
    miss (FPR well under 10x the ~0.9% design point)."""
    keys = spark.range(2000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    m_bits = bloom_bits_for(2000)
    words = build_bloom(keys, "k", m_bits)
    probe = spark.range(4000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    got = (
        probe.crossJoin(F.broadcast(words))
        .select("k", bloom_hit(F.col("words"), F.col("k")).alias("hit"))
        .toPandas()
    )
    inserted = got[got.k.str.slice(4).astype(int) < 2000]
    others = got[got.k.str.slice(4).astype(int) >= 2000]
    assert inserted.hit.all()  # zero false negatives
    assert others.hit.mean() < 0.09  # false positives stay rare


def test_bloom_build_is_word_bounded(spark):
    """The filter row is exactly m_bits/64 words, dense, with missing
    words zero-filled."""
    keys = spark.range(3).select(F.col("id").cast("string").alias("k"))
    m_bits = 1024
    row = build_bloom(keys, "k", m_bits).collect()[0]
    assert len(row["words"]) == m_bits // 64
    assert any(w != 0 for w in row["words"])  # the 3 keys set bits
    assert sum(1 for w in row["words"] if w == 0) > 0  # and most stay 0
    assert row["bloom_k"] == 5  # the build embeds its hash count


def test_bloom_probe_k_mismatch_raises(spark):
    """A probe whose k disagrees with the build's embedded bloom_k must
    RAISE (raise_error), never silently return false — a silent false
    would be a false negative, the one failure mode the module exists
    to rule out.  A matching k passes the guard."""
    import pytest

    keys = spark.range(10).select(
        F.concat(F.lit("key_"), F.col("id")).alias("kk")
    )
    words = build_bloom(keys, "kk", 1024, k=5)
    probe = keys.crossJoin(F.broadcast(words))
    ok = probe.select(
        bloom_hit(F.col("words"), F.col("kk"), k=5, built_k=F.col("bloom_k"))
        .alias("hit")
    ).toPandas()
    assert ok.hit.all()
    with pytest.raises(Exception, match="does not match build k"):
        probe.select(
            bloom_hit(
                F.col("words"), F.col("kk"), k=7, built_k=F.col("bloom_k")
            ).alias("hit")
        ).collect()


def test_bloom_decontamination_equals_exact_twin(spark):
    """The bloom-prefiltered report must equal decontamination_overlap
    ROW-FOR-ROW (no false negatives + exact verify of survivors), which
    is why it can share the exact twin's oracle."""
    a = (
        REGISTRY["bloom_decontamination"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        REGISTRY["decontamination_overlap"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) > 0  # non-vacuous: the corpus does contain contamination
    pd.testing.assert_frame_equal(a, b)


def test_bloom_decontamination_plan_shape(spark):
    """The 1-row words table must arrive via a broadcast (nested-loop on
    a single row, never a cartesian of real extents) and the verify join
    must stay a broadcast hash join — no corpus-side shuffle before the
    bloom filter prunes it."""
    df = REGISTRY["bloom_decontamination"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert has_node(plan, "BroadcastNestedLoopJoin")
    assert has_node(plan, "BroadcastHashJoin")
    assert not has_node(plan, "CartesianProduct")
    assert not has_node(plan, "SortMergeJoin")
