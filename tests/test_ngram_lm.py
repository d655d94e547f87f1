"""Tests for the trained bigram-LM perplexity gate
(``functions/ngram_lm.py`` + the ``ngram_lm_perplexity`` query).

Oracle parity (hash equality vs DuckDB) is covered by
test_oracle_parity.py; these tests pin the properties the oracle can't
express: exact agreement with a pure-Python golden LM (the integer
nanonat encoding is deterministic, so the match is EXACT, not
approximate), the surrogate's accuracy envelope vs true ``ln``, the
model actually discriminating in-domain text from gibberish, and the
plan staying expression-only.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_DIR

from seisdb_spark.functions.ngram_lm import LN2_NANO, nll_nano_sql
from seisdb_spark.queries.registry import REGISTRY


def py_nll_nano(a: int, b: int) -> int:
    """Pure-Python reference for the octave-Pade nanonat NLL — the same
    IEEE double arithmetic both engines run (Python floats are IEEE
    doubles; // and << are exact integer ops)."""
    assert 1 <= b <= a
    q = a // b
    k = q.bit_length() - 1
    m = a / (b << k)
    s = 2.0 * (m - 1.0) / (m + 1.0)
    return k * LN2_NANO + math.floor(s * 1e9)


def py_bigram_lm_scores(rows: list[tuple[int, str, str]], ref_sources):
    """Pure-Python golden: train the add-1 bigram LM on the reference
    slice, score every doc.  rows = (doc_id, text, source)."""
    def bigrams(text):
        w = [t for t in text.split(" ") if t]
        return list(zip(w, w[1:]))

    ref = [bg for _, t, s in rows if s in ref_sources for bg in bigrams(t)]
    c12: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab: set[str] = set()
    for w1, w2 in ref:
        c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
        c1[w1] = c1.get(w1, 0) + 1
        vocab.update((w1, w2))
    v = len(vocab) + 1
    out = {}
    for doc_id, text, _ in rows:
        bgs = bigrams(text)
        if not bgs:
            continue
        total = sum(
            py_nll_nano(c1.get(w1, 0) + v, c12.get((w1, w2), 0) + 1)
            for w1, w2 in bgs
        )
        out[doc_id] = (len(bgs), total, total // len(bgs))
    return out


def test_nll_nano_matches_python_golden_exactly(spark):
    """The engine's nanonat NLL must equal the pure-Python IEEE
    computation bit-for-bit over a range spanning every octave regime
    (q=1 boundary, mid-octave, huge ratios)."""
    pairs = [
        (1, 1), (2, 1), (3, 2), (7, 2), (1050, 3), (4096, 1),
        (10**6 + 7, 13), (10**12 + 7, 3), (999, 998), (2**40, 2**20 - 1),
    ]
    df = spark.createDataFrame(pairs, "a long, bb long")
    got = {
        (r.a, r.bb): r.nll
        for r in df.selectExpr(
            "a", "bb", nll_nano_sql("a", "bb", dialect="spark") + " AS nll"
        ).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == py_nll_nano(a, b), (a, b)


def test_nll_nano_accuracy_envelope():
    """Octave reduction keeps the Pade surrogate within 4 % relative of
    true ln across the whole ratio range (without it, ln V ~ 8 for an
    unseen bigram would saturate at 2.0 — a 75 % error)."""
    for a, b in [(3, 2), (2, 1), (10, 3), (100, 7), (1000, 1),
                 (12345, 17), (10**9, 11), (10**12, 3)]:
        true = math.log(a / b)
        approx = py_nll_nano(a, b) / 1e9
        assert abs(approx - true) <= 0.04 * true + 2e-9, (a, b, approx, true)


def test_lm_query_matches_python_golden(spark, tmp_path):
    """End-to-end on a planted corpus: the query's (n_bigrams, sum via
    mean*count check, mean_nll_nano, ppl_keep) must equal the pure-
    Python golden LM exactly — integer arithmetic leaves no tolerance."""
    rows = [
        (1, "the cat sat on the mat", "src0"),
        (2, "the dog sat on the rug", "src1"),
        (3, "the cat sat on the rug", "src2"),
        (4, "a cat and a dog sat", "src3"),
        (5, "the cat sat on the mat", "src9"),     # in-domain copy
        (6, "zq xv qqj vxk zzk jjq", "src9"),      # gibberish
        (7, "single", "src9"),                     # <2 tokens: no rows
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf.text.str.len().astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet")
    out = {
        r.doc_id: (r.n_bigrams, r.mean_nll_nano, r.ppl_keep)
        for r in REGISTRY["ngram_lm_perplexity"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    golden = py_bigram_lm_scores(rows, {"src0", "src1", "src2", "src3"})
    assert set(out) == set(golden)          # doc 7 dropped by both
    for doc_id, (n_bg, total, mean) in golden.items():
        assert out[doc_id][0] == n_bg, doc_id
        assert out[doc_id][1] == mean, doc_id
        assert out[doc_id][2] == (1 if mean < 3_400_000_000 else 0)
    # the model discriminates: the in-domain copy scores strictly below
    # the gibberish doc (every gibberish bigram is unseen -> NLL ~ ln V)
    assert out[5][1] < out[6][1]


def test_lm_corpus_reference_scores_below_out_of_domain(spark):
    """On the driver corpus the reference slice must average a lower
    mean NLL than out-of-domain sources — the property that makes the
    gate a quality filter rather than a random hash."""
    scored = (
        REGISTRY["ngram_lm_perplexity"].spark(spark, SF_DIR).toPandas()
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[
        ["doc_id", "source"]
    ]
    j = scored.merge(docs, on="doc_id")
    ref = j.source.isin(["src0", "src1", "src2", "src3"])
    assert j[ref].mean_nll_nano.mean() < j[~ref].mean_nll_nano.mean()
    # and the keep threshold splits: both classes present
    assert 0 < j.ppl_keep.sum() < len(j)


def test_lm_plan_expression_only(spark):
    """Scoring must stay JVM-side: no Python boundary, no cartesian
    corpus product (the 1-row vocab broadcast is a
    BroadcastNestedLoopJoin, which is fine), no global sort."""
    from seisdb_spark.plancheck import final_plan, has_node

    df = REGISTRY["ngram_lm_perplexity"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert not has_node(plan, "BatchEvalPython")
    assert not has_node(plan, "CartesianProduct")
    assert not has_node(plan, "rangepartitioning")
