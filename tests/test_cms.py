"""Declarative count-min sketch (functions/cms.py) and the
cm_sketch_gate query built on it — the fourth sketch class (point
frequencies) next to quantiles, distinct counts, and top-k.

Reference parity note: the reference (/root/reference/seisdb) has no
sketch code; this surface belongs to the mandated LLM-data-pipeline
extension (SURVEY.md §2.11).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from seisdb_spark.functions import cms
from seisdb_spark.plancheck import final_plan, has_node
from seisdb_spark.queries import REGISTRY
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def zipfish(spark):
    """A collision-heavy synthetic stream: 30k distinct keys (7x the
    4096-counter width, so every row has real collisions) + a planted
    heavy hitter, spread over 4 groups."""
    base = spark.range(60000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.concat(F.lit("k"), F.col("id") % 30000).alias("w"),
    )
    hot = spark.range(5000).select(
        F.lit("0").alias("g"), F.lit("HOT").alias("w")
    )
    return base.unionAll(hot)


def test_merge_equals_direct(spark, zipfish):
    """Element-wise addition of per-group partials must equal the
    one-group direct build CELL FOR CELL — exact integer sums make the
    mergeability contract an equality, not an approximation (the
    hll_sketch_rollup merge-equals-direct analogue)."""
    merged = {
        (r["d"], r["col"]): r["n"]
        for r in cms.cm_merge(
            cms.cm_partials(zipfish, "w", ["g"])
        ).collect()
    }
    direct = {
        (r["d"], r["col"]): r["n"]
        for r in cms.cm_merge(
            cms.cm_partials(zipfish.withColumn("g", F.lit("all")), "w", ["g"])
        ).collect()
    }
    assert merged == direct
    # bounded state: never more than depth*width cells, whatever flowed in
    assert len(merged) <= cms.CMS_DEPTH * cms.CMS_WIDTH


def test_never_undercounts_and_bound_holds(spark, zipfish):
    """est >= exact for EVERY probe (CM's construction guarantee), and
    est <= exact + ceil(e*N/width) for all of them (the eps*N bound
    holds per probe with prob >= 1-e^-5; 40 probes at width 4096 on 65k
    tokens leave enormous slack).  The never-seen key must estimate
    within 0..eps*N too."""
    merged = cms.cm_merge(
        cms.cm_partials(zipfish, "w", ["g"])
    ).localCheckpoint(eager=True)
    total = cms.cm_total(merged).collect()[0]["total"]
    assert total == 65000  # the sketch carries N exactly
    bound = cms.cm_error_bound(total)
    probe_words = ["HOT", "zz_absent"] + [f"k{i}" for i in range(0, 30000, 789)]
    probes = spark.createDataFrame([(w,) for w in probe_words], "word string")
    est = {
        r["word"]: r["est"]
        for r in cms.cm_probe(probes, merged, "word").collect()
    }
    exact = {w: 2 for w in probe_words}
    exact["HOT"] = 5000
    exact["zz_absent"] = 0
    for w in probe_words:
        assert est[w] >= exact[w], w
        assert est[w] <= exact[w] + bound, (w, est[w], exact[w], bound)
    # collisions are real in this fixture: some probe genuinely overcounts
    assert any(est[w] > exact[w] for w in probe_words)


def test_probe_preserves_columns_and_broadcasts(spark, zipfish):
    """cm_probe keeps the probe table's other columns, and the merged
    table rides a broadcast (it is <= depth*width rows by construction)
    — no corpus-wide shuffle on the probe side."""
    merged = cms.cm_merge(cms.cm_partials(zipfish, "w", ["g"]))
    probes = spark.createDataFrame(
        [("HOT", 1), ("k5", 2)], "word string, tag int"
    )
    out = cms.cm_probe(probes, merged, "word")
    assert set(out.columns) == {"word", "tag", "est"}
    got = {r["word"]: (r["tag"], r["est"]) for r in out.collect()}
    assert got["HOT"][0] == 1 and got["HOT"][1] >= 5000
    plan = final_plan(out)
    assert has_node(plan, "Broadcast")
    assert not has_node(plan, "CartesianProduct")


def test_cm_gate_planted(spark, tmp_path):
    """On a planted corpus the gate must return every flag green, the
    planted hot word's exact count right, and the never-seen probe row
    present with exact_n 0."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["join join join hash", "join row row"],
            "lang": ["en"] * 2,
            "source": ["s0", "s1"],
            "n_chars": [19, 12],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    out = (
        REGISTRY["cm_sketch_gate"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("word")
    )
    assert len(out) == len(set(out.index)) == 11
    assert out.loc["join"].exact_n == 4
    assert out.loc["zzz_never_seen"].exact_n == 0
    assert (out.ge_exact == 1).all()
    assert (out.within_bound == 1).all()


def test_cm_gate_plan_shape(spark):
    """The gate's plan at test SF: probe/gate joins are broadcasts, no
    cartesian (the one crossJoin carries a broadcast 1-row total), no
    global sort; the sketch build's exchange is the (group,d,col)
    combiner shuffle, bounded by group x depth x width."""
    df = REGISTRY["cm_sketch_gate"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert has_node(plan, "Broadcast")
    assert not has_node(plan, "rangepartitioning")
    assert not has_node(plan, "BatchEvalPython")


def test_probe_survives_colliding_columns_and_duplicates(spark, zipfish):
    """Review finding: a probes frame carrying columns named n/d/col (a
    prior count attached, say) must not break or mis-bind the join, and
    duplicate probe rows must survive row-for-row instead of collapsing."""
    merged = cms.cm_merge(cms.cm_partials(zipfish, "w", []))
    probes = spark.createDataFrame(
        [("k1", 7, 1, 2), ("k1", 7, 1, 2), ("k9", 3, 0, 5)],
        "word string, n int, d int, col int",
    )
    out = cms.cm_probe(probes, merged, "word").toPandas()
    assert len(out) == 3  # duplicates preserved
    assert sorted(out.columns) == ["col", "d", "est", "n", "word"]
    # caller columns pass through untouched
    assert sorted(out.n) == [3, 7, 7] and (out.est >= 0).all()
    k1 = out[out.word == "k1"]
    assert len(k1) == 2 and k1.est.nunique() == 1
