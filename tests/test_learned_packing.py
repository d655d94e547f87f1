"""Learned-tokenizer counts wired into the packing/budget stages (r10
verdict item #3): ``learned_token_counts`` feeds ``packing_assignment``
and ``budgeted_selection`` real BPE counts in place of the regex
estimate, the packed-sequence invariants hold under them, and a planted
corpus shows the two count sources genuinely changing assignments."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from seisdb_spark.functions import bpe
from seisdb_spark.queries.extensions import (
    budgeted_selection,
    learned_token_counts,
    packing_assignment,
)


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """Docs of one repeated 8-char word ('zzzzzzzz' x k): 3 trained
    merges collapse every word to ONE token, so the learned count is k
    while the regex estimate is ~ceil(9k/4) ~ 2.25k — a >2x divergence
    big enough to move sequence/budget assignments."""
    root = tmp_path_factory.mktemp("planted_pack")
    ks = [500, 505, 510, 515, 520, 525]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, len(ks) + 1)),
            "text": [("zzzzzzzz " * k).strip() for k in ks],
            "lang": ["en"] * len(ks),
            "source": ["t"] * len(ks),
            "n_chars": [9 * k - 1 for k in ks],
        }
    )
    pdf.to_parquet(root / "documents.parquet")
    from seisdb_spark.sources.tables import load_table

    docs = load_table(spark, str(root), "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.length("word") >= 1
    )
    wfreq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("wn"))
    merges = bpe.train_merges(wfreq, iters=8)
    # z -> zz -> zzzz -> zzzzzzzz, then early-stop (nothing left to merge)
    assert [m["merged"] for m in merges] == ["zz", "zzzz", "zzzzzzzz"]
    return docs, merges, dict(zip(pdf.doc_id, ks))


def _check_packing_invariants(out: pd.DataFrame, seq_tokens: int) -> None:
    """Within each shard, rows sorted by running start (seq, offset) must
    chain: start_0 = 0, start_{i+1} = start_i + n_tokens_i, with
    seq/offset = divmod(start, seq_tokens)."""
    assert (out.n_tokens > 0).all()  # makes the start order total
    for _, g in out.groupby("shard"):
        g = g.sort_values(["seq_in_shard", "offset_in_seq"]).reset_index(
            drop=True
        )
        start = 0
        for r in g.itertuples():
            assert r.seq_in_shard == start // seq_tokens
            assert r.offset_in_seq == start % seq_tokens
            start += r.n_tokens


def test_learned_counts_match_planted_truth(spark, planted):
    docs, merges, truth = planted
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in learned_token_counts(docs, merges).collect()
    }
    assert got == truth  # one token per fully-merged word, k words


def test_packing_invariants_under_learned_counts(spark, planted):
    docs, merges, truth = planted
    tc = learned_token_counts(docs, merges)
    out = packing_assignment(docs, token_counts=tc).toPandas()
    assert dict(zip(out.doc_id, out.n_tokens)) == truth  # learned, not est
    _check_packing_invariants(out, seq_tokens=2048)


def test_budget_invariants_under_learned_counts(spark, planted):
    docs, merges, truth = planted
    tc = learned_token_counts(docs, merges)
    budget = 1200
    out = budgeted_selection(
        docs, budget_per_shard=budget, n_shards=1, token_counts=tc
    ).toPandas()
    assert (out.budget_used_before < budget).all()
    for _, g in out.groupby(["lang", "shard"]):
        g = g.sort_values("budget_used_before").reset_index(drop=True)
        used = 0
        for r in g.itertuples():
            assert r.budget_used_before == used
            assert r.n_tokens == truth[r.doc_id]
            used += r.n_tokens


def test_planted_divergence_changes_assignments(spark, planted):
    """The whole point of wiring learned counts in: on the planted corpus
    the regex estimate (~2.25x the learned count) must pack docs into
    LATER sequence windows and keep FEWER docs under the same budget —
    i.e. the count source genuinely changes decisions, it is not a
    cosmetic column swap."""
    docs, merges, truth = planted
    tc = learned_token_counts(docs, merges)
    est = packing_assignment(docs, n_shards=1).toPandas()
    lrn = packing_assignment(docs, n_shards=1, token_counts=tc).toPandas()
    _check_packing_invariants(lrn, seq_tokens=2048)
    est_seq = dict(zip(est.doc_id, est.seq_in_shard))
    lrn_seq = dict(zip(lrn.doc_id, lrn.seq_in_shard))
    assert est_seq != lrn_seq  # at least one doc lands in another window
    # ~2.25x token mass -> strictly more windows under the estimate
    assert est.seq_in_shard.max() > lrn.seq_in_shard.max()

    budget = 1200
    est_keep = set(
        budgeted_selection(docs, budget_per_shard=budget, n_shards=1)
        .toPandas()
        .doc_id
    )
    lrn_keep = set(
        budgeted_selection(
            docs, budget_per_shard=budget, n_shards=1, token_counts=tc
        )
        .toPandas()
        .doc_id
    )
    # estimate: first doc (~1130 est tokens) fills the budget; learned:
    # docs keep fitting until ~1200 real tokens are used
    assert est_keep != lrn_keep and len(lrn_keep) > len(est_keep)


def test_default_paths_unchanged(spark, planted):
    """token_counts=None must stay byte-identical to the r10 behavior
    (the driver oracle depends on it): n_tokens is the regex estimate."""
    docs, _, truth = planted
    out = packing_assignment(docs, n_shards=1).toPandas()
    k = pd.Series(truth)
    est = -((9 * k - 1) // -4)  # ceil(bytes/4); bytes = 9k-1 (stripped)
    got = out.set_index("doc_id").n_tokens
    assert (got.sort_index() == est.sort_index()).all()
