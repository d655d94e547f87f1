"""Production-scale BPE apply: the Arrow-batched mapInPandas kernel twin
of the expression-form tokenizer, and the expression form's documented
merge-count bound (r10 verdict item #2).

Reference parity note: the reference (/root/reference/seisdb, 963 LoC of
seismology numpy) has no tokenizer; this surface exists for the mandated
LLM-data-pipeline extension (SURVEY.md §2.11).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from seisdb_spark.functions import bpe
from seisdb_spark.plancheck import final_plan, has_node
from tests.conftest import SMOKE_SF_DIR


def _fake_merges(k: int, seed: int = 0) -> list[dict]:
    """Synthetic (but well-formed) merge list: pairs over a small
    alphabet, including composite symbols chaining earlier merges the
    way real BPE training does."""
    rng = random.Random(seed)
    alphabet = list("abcdefghijklmnopqrstuvwxyz")
    merges = []
    for _ in range(k):
        left = rng.choice(alphabet)
        right = rng.choice(alphabet)
        merged = left + right
        merges.append({"left_sym": left, "right_sym": right, "merged": merged})
        if len(merged) <= 4:
            alphabet.append(merged)  # later merges can chain this one
    return merges


@pytest.fixture(scope="module")
def trained_golden(spark):
    """The real 8-merge sequence trained on the smoke corpus — the same
    golden the bpe_train_merges pytest pins."""
    from seisdb_spark.sources.tables import load_table

    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.length("word") >= 1
    )
    wfreq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("wn"))
    merges = bpe.train_merges(wfreq, iters=8)
    words = wfreq.select("word")
    return merges, words


def test_kernel_equals_expression_on_trained_golden(spark, trained_golden):
    """The Arrow kernel and the chained-fold expression form must produce
    IDENTICAL (word, syms, n_tokens) rows on the trained 8-merge golden
    — the equality that lets the kernel substitute for the expression
    form past its bound."""
    merges, words = trained_golden
    a = {
        r["word"]: (tuple(r["syms"]), r["n_tokens"])
        for r in bpe.segment_words(words, merges).collect()
    }
    b = {
        r["word"]: (tuple(r["syms"]), r["n_tokens"])
        for r in bpe.segment_words_kernel(words, merges).collect()
    }
    assert a == b
    assert len(a) == words.count()
    assert any(v[1] < len(k) for k, v in a.items())  # merges compress


def test_expression_form_bound_raises(spark, trained_golden):
    """Past SEGMENT_EXPR_MAX_MERGES the expression form must raise OUR
    ValueError (pointing at the kernel), never Spark's opaque analyzer
    fixed-point error."""
    _, words = trained_golden
    too_many = _fake_merges(bpe.SEGMENT_EXPR_MAX_MERGES + 1)
    with pytest.raises(ValueError, match="segment_words_kernel"):
        bpe.segment_words(words, too_many)
    # the bound itself is fine (the guard is > not >=)
    df = bpe.segment_words(
        spark.range(3).select(F.lit("ab").alias("word")),
        _fake_merges(bpe.SEGMENT_EXPR_MAX_MERGES),
    )
    assert df.schema  # analyzes without exhausting the Resolution budget


def test_expression_form_cliff_is_real(spark, monkeypatch):
    """Documents WHY the bound exists: with the guard lifted, ~96 chained
    folds exhaust Catalyst's Resolution fixed-point budget (one nested
    higher-order lambda resolved per analyzer iteration; maxIterations =
    100 on Spark 4.1) — the failure is at ANALYSIS time, before a single
    row moves, which is why the guard must fire first."""
    monkeypatch.setattr(bpe, "SEGMENT_EXPR_MAX_MERGES", 10_000)
    words = spark.range(2).select(F.lit("abcd").alias("word"))
    with pytest.raises(Exception, match="Max iterations"):
        bpe.segment_words(words, _fake_merges(96)).schema


def test_kernel_handles_production_size_merge_list(spark):
    """A 1000-merge list (15x past the expression bound, the road to a
    ~30k production vocabulary) must analyze instantly — the kernel's
    plan is CONSTANT in the merge count (one mapInPandas; merges ride a
    broadcast) — and match the pure-Python golden per word."""
    words_py = ["tokenization", "the", "thethe", "aaaa", "x", ""]
    words = spark.createDataFrame(
        [(w,) for w in words_py], "word string"
    )
    merges = _fake_merges(1000, seed=7)
    pairs = [(m["left_sym"], m["right_sym"], m["merged"]) for m in merges]
    out = bpe.segment_words_kernel(words, merges)
    plan_small = final_plan(bpe.segment_words_kernel(words, _fake_merges(10)))
    plan_big = final_plan(out)
    # constant plan: same node inventory regardless of merge count
    assert has_node(plan_big, "MapInPandas")
    assert not has_node(plan_big, "hashpartitioning")
    assert abs(len(plan_big) - len(plan_small)) < 64
    got = {r["word"]: list(r["syms"]) for r in out.collect()}
    for w in words_py:
        assert got[w] == (bpe.apply_merges_py(w, pairs) if w else [])


def test_auto_dispatch_picks_by_merge_count(spark):
    """segment_words_auto: expression form (no Python boundary) at or
    under the bound, kernel beyond it — identical rows either way."""
    words = spark.createDataFrame([("abab",), ("ba",)], "word string")
    few = _fake_merges(8)
    many = _fake_merges(bpe.SEGMENT_EXPR_MAX_MERGES + 10)
    p_few = final_plan(bpe.segment_words_auto(words, few))
    p_many = final_plan(bpe.segment_words_auto(words, many))
    assert not has_node(p_few, "MapInPandas")
    assert has_node(p_many, "MapInPandas")
    pairs_many = [(m["left_sym"], m["right_sym"], m["merged"]) for m in many]
    got = {
        r["word"]: list(r["syms"])
        for r in bpe.segment_words_auto(words, many).collect()
    }
    assert got == {
        w: bpe.apply_merges_py(w, pairs_many) for w in ("abab", "ba")
    }
