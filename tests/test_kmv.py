"""KMV bottom-k set-operation sketch (functions/kmv.py) and the
kmv_jaccard_gate query — the fifth sketch class: mergeable
distinct/Jaccard/INTERSECTION estimation, which HLL's union-only merge
cannot express.

Reference parity note: the reference (/root/reference/seisdb) has no
sketch code; this surface belongs to the mandated LLM-data-pipeline
extension (SURVEY.md §2.11).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from seisdb_spark.functions import kmv
from seisdb_spark.plancheck import final_plan, has_node
from seisdb_spark.queries import REGISTRY
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def two_sets(spark):
    """Two groups with a planted overlap deep in the estimating regime:
    |A| = 20k, |B| = 20k, |A ∩ B| = 10k (keys 10k..20k shared), so
    exact Jaccard = 10k/30k = 1/3 — far past the k=1024 signature."""
    a = spark.range(20000).select(
        F.lit("A").alias("g"), F.concat(F.lit("key"), F.col("id")).alias("w")
    )
    b = spark.range(10000, 30000).select(
        F.lit("B").alias("g"), F.concat(F.lit("key"), F.col("id")).alias("w")
    )
    return a.unionAll(b)


def test_signature_is_k_bounded_and_sorted(spark, two_sets):
    sk = {r["g"]: r["ks"] for r in kmv.kmv_sketch(two_sets, "w", ["g"]).collect()}
    for g in ("A", "B"):
        assert len(sk[g]) == kmv.KMV_K  # 20k distinct >> k: exactly k
        assert sk[g] == sorted(sk[g])
    # sub-k group: the signature IS the full hashed set
    small = spark.range(7).select(
        F.lit("S").alias("g"), F.col("id").cast("string").alias("w")
    )
    srow = kmv.kmv_sketch(small, "w", ["g"]).collect()[0]
    assert len(srow["ks"]) == 7


def test_merge_equals_direct(spark, two_sets):
    """Merging the two per-group signatures must equal the signature
    built directly over the union — bottom-k of a union is the bottom-k
    of the merged bottom-ks (exact, order-free), the property that lets
    per-shard signatures persist and merge forever."""
    sk = {r["g"]: r["ks"] for r in kmv.kmv_sketch(two_sets, "w", ["g"]).collect()}
    merged = (
        spark.createDataFrame(
            [(sk["A"], sk["B"])], "a array<bigint>, b array<bigint>"
        )
        .select(kmv.kmv_merge_expr(F.col("a"), F.col("b")).alias("u"))
        .collect()[0]["u"]
    )
    direct = kmv.kmv_sketch(
        two_sets.withColumn("g", F.lit("all")), "w", ["g"]
    ).collect()[0]["ks"]
    assert merged == direct


def test_estimates_in_estimating_regime(spark, two_sets):
    """Distinct and Jaccard estimates at 20x past the signature size:
    RSE ~ 1/sqrt(k-2) ~ 3%, so 10% tolerances carry big margin.
    Exact: |A|=|B|=20k, |A∪B|=30k, J=1/3."""
    sk = {r["g"]: r["ks"] for r in kmv.kmv_sketch(two_sets, "w", ["g"]).collect()}
    row = (
        spark.createDataFrame(
            [(sk["A"], sk["B"])], "a array<bigint>, b array<bigint>"
        )
        .select(
            kmv.kmv_distinct_est_expr(F.col("a")).alias("da"),
            kmv.kmv_distinct_est_expr(
                kmv.kmv_merge_expr(F.col("a"), F.col("b"))
            ).alias("du"),
            kmv.kmv_jaccard_est_expr(F.col("a"), F.col("b")).alias("j"),
        )
        .collect()[0]
    )
    assert abs(row["da"] - 20000) <= 2000
    assert abs(row["du"] - 30000) <= 3000
    assert abs(row["j"] - 1 / 3) <= 0.05


def test_exact_below_k(spark):
    """Below k distinct keys every estimate must be EXACT — the regime
    that makes the driver-scale gate deterministic."""
    a = spark.range(100).select(
        F.lit("A").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("w")
    )
    b = spark.range(60, 160).select(
        F.lit("B").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("w")
    )
    sk = {
        r["g"]: r["ks"]
        for r in kmv.kmv_sketch(a.unionAll(b), "w", ["g"]).collect()
    }
    row = (
        a.sparkSession.createDataFrame(
            [(sk["A"], sk["B"])], "a array<bigint>, b array<bigint>"
        )
        .select(
            kmv.kmv_distinct_est_expr(
                kmv.kmv_merge_expr(F.col("a"), F.col("b"))
            ).alias("du"),
            kmv.kmv_jaccard_est_expr(F.col("a"), F.col("b")).alias("j"),
        )
        .collect()[0]
    )
    assert row["du"] == 160.0  # |A ∪ B| exactly
    assert row["j"] == 40 / 160  # intersection 60..99 exactly


def test_kmv_gate_planted(spark, tmp_path):
    """Planted two-source corpus: known intersection/union counts come
    out exact and both flags green."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["apple banana cherry", "banana cherry date egg"],
            "lang": ["en"] * 2,
            "source": ["src0", "src1"],
            "n_chars": [19, 22],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    out = REGISTRY["kmv_jaccard_gate"].spark(spark, str(tmp_path)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.src_a, r.src_b) == ("src0", "src1")
    assert r.n_inter == 2 and r.n_union == 5  # {banana,cherry} / 5 words
    assert r.jaccard_within == 1 and r.union_within == 1


def test_kmv_gate_plan_shape(spark):
    """At test SF: the signature build's window is group-partitioned
    (never a global sort), the pair join is a broadcast of the 5
    signature rows, no cartesian of real extents."""
    df = REGISTRY["kmv_jaccard_gate"].spark(spark, SF_DIR)
    out = df.toPandas()
    assert len(out) == 10  # all 5x4/2 source pairs present
    assert (out.jaccard_within == 1).all() and (out.union_within == 1).all()
    plan = final_plan(df)
    assert has_node(plan, "Broadcast")
    assert not has_node(plan, "BatchEvalPython")
