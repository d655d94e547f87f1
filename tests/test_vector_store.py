"""Plan-shape and scale-claim tests for the vector-store registry queries
(seisdb_spark/queries/vector_store.py).  Value correctness is covered by
tests/test_oracle_parity.py (every registered oracle runs against DuckDB);
these tests pin the SCALE claims the docstrings make:

* projection and encode are map-only (no hash/range exchange beyond the
  documented small-table spread);
* ADC search plans TakeOrderedAndProject over the codes table;
* the IVF list id really is a partition-pruning column when the codes
  table is written ``partitionBy("list")`` (the r7 verdict's item #7 —
  the same proof write_db has for the flagship layout).
"""

from __future__ import annotations

import numpy as np
import pytest

from seisdb_spark.plancheck import final_plan, has_node
from seisdb_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_hadamard_basis_exactly_orthonormal():
    from seisdb_spark.queries.vector_store import PCA_PROJECT_BASIS

    b = np.array(PCA_PROJECT_BASIS)
    # entries are +-1/8 — a power of two, exact in binary
    assert set(np.abs(b).ravel().tolist()) == {0.125}
    np.testing.assert_array_equal(b @ b.T, np.eye(len(b)))


def test_pca_project_is_map_only(spark):
    """After the (1-row) mean collect, the projection itself must add no
    hash/range exchange and no Python boundary — literal components, HOF
    folds, whole-stage codegen."""
    df = REGISTRY["pca_project"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert not has_node(plan, "hashpartitioning")
    assert not has_node(plan, "rangepartitioning")
    assert not has_node(plan, "BatchEvalPython")
    assert not has_node(plan, "Window")


def test_pq_encode_is_map_only(spark):
    df = REGISTRY["pq_encode_codes"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert not has_node(plan, "hashpartitioning")
    assert not has_node(plan, "rangepartitioning")
    assert not has_node(plan, "BatchEvalPython")
    assert not has_node(plan, "HashJoin")
    assert not has_node(plan, "SortMergeJoin")
    assert not has_node(plan, "NestedLoopJoin")


def test_pq_encode_evaluates_each_subspace_fold_once(spark):
    """The r18-opt hoist: each subspace's k-fold distance array must
    appear in the OPTIMIZED plan exactly once per (subspace, centroid) —
    n_sub * k zip_with folds total.  The pre-r18 single-projection form
    repeated each array 3x (argmin position, argmin value, qerr term),
    and HOFs are CodegenFallback (no codegen subexpression elimination),
    so every row paid the folds three times; this also pins that
    CollapseProject does not undo the two-level select (it would only
    inline a multiply-referenced produced attribute when cheap)."""
    from seisdb_spark.functions import pq as pq_lib
    from seisdb_spark.queries.vector_store import (
        PQ_N_SUB,
        PQ_SEED_K,
        _books_from_seeds,
        _seed_vectors,
    )
    from seisdb_spark.sources.tables import load_table, spread

    emb = spread(load_table(spark, SF_DIR, "embeddings"))
    books = _books_from_seeds(_seed_vectors(spark, SF_DIR, PQ_SEED_K), PQ_N_SUB)
    df = pq_lib.pq_encode(emb, books)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("zip_with") == PQ_N_SUB * PQ_SEED_K


def test_pq_adc_plans_takeordered(spark):
    df = REGISTRY["pq_adc_topk"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert has_node(plan, "TakeOrderedAndProject")
    assert not has_node(plan, "rangepartitioning")
    assert not has_node(plan, "HashJoin")
    assert not has_node(plan, "SortMergeJoin")
    assert not has_node(plan, "NestedLoopJoin")


def test_ivfpq_plans_takeordered_no_cartesian(spark):
    df = REGISTRY["ivfpq_adc_topk"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert has_node(plan, "TakeOrderedAndProject")
    assert not has_node(plan, "rangepartitioning")
    assert not has_node(plan, "CartesianProduct")


def test_ivfpq_probe_is_single_scan(spark):
    """r19 opt pin: the probe must be ONE corpus scan with a per-list CASE
    distance, not a union of per-list filtered branches — codes_df is a
    lazy map-only plan, so a union re-executes the whole encode chain
    (scan + coarse assign + residual + 8x16 folds) once per probed list
    with no exchange for ReuseExchange to dedup."""
    df = REGISTRY["ivfpq_adc_topk"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert not has_node(plan, "Union")
    assert plan.count("Scan parquet") == 1, plan


def test_ivfpq_codes_partition_pruning(spark, tmp_path):
    """The docstring's 100 TB claim, proven end-to-end: write the codes
    table ``partitionBy("list")``, probe one list, and the scan must show
    a PartitionFilters entry on ``list`` — probing is partition PRUNING,
    not a post-scan filter."""
    from seisdb_spark.queries.vector_store import (
        IVF_N_COARSE,
        PQ_N_SUB,
        PQ_SEED_K,
        _books_from_seeds,
        _seed_vectors,
    )
    from seisdb_spark.functions import pq as pq_lib
    from seisdb_spark.functions.cluster import assign_clusters
    from seisdb_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    coarse = _seed_vectors(spark, SF_DIR, IVF_N_COARSE)
    cents = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in c) + ")"
            for c in coarse
        )
        + ")"
    )
    resid = assign_clusters(emb, coarse).select(
        "vec_id",
        F.col("cluster").alias("list"),
        F.expr(
            f"zip_with(embedding, element_at({cents}, cluster + 1), "
            "(x, y) -> CAST(x AS DOUBLE) - y)"
        ).alias("embedding"),
    )
    books = _books_from_seeds(_seed_vectors(spark, SF_DIR, PQ_SEED_K), PQ_N_SUB)
    codes = pq_lib.pq_encode(resid, books, keep=("list",))
    out = str(tmp_path / "codes_by_list")
    codes.write.partitionBy("list").parquet(out)

    probe = spark.read.parquet(out).filter(F.col("list") == 1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # and the pruned read returns exactly that list's rows
    want = codes.filter(F.col("list") == 1).count()
    assert probe.count() == want > 0


def _mrl_fixture(tmp_path, vecs):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")


def test_mrl_eval_prefix_loaded_signal_is_perfect(spark, tmp_path):
    """When ALL information lives in the first 8 dims (the Matryoshka
    ideal), every truncation's ranking equals the exact one: recall 1.0
    and top-1 survival at d = 8, 16, 32."""
    rng = np.random.default_rng(21)
    vecs = np.zeros((40, 64))
    vecs[:, :8] = rng.normal(size=(40, 8))
    _mrl_fixture(tmp_path, vecs)
    out = (
        REGISTRY["mrl_truncation_eval"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("trunc_dim")
    )
    assert out.trunc_dim.tolist() == [8, 16, 32]
    assert (out.recall_at_10 == 1.0).all()
    assert (out.top1_match == 1).all()


def test_mrl_eval_tail_loaded_signal_is_blind(spark, tmp_path):
    """The adversarial mirror: dims 0..31 are ZERO and the signal lives
    in 32..63, so every prefix ranking degenerates to the vec_id
    tiebreak ({0..9}) while the exact top-10 is the planted {30..39} —
    recall 0.0 and a lost top-1 at every truncation."""
    rng = np.random.default_rng(22)
    t = rng.normal(size=32)
    vecs = np.zeros((40, 64))
    for j in range(30, 40):
        vecs[j, 32:] = (50 - j) * t  # dots 20|t|^2 .. 11|t|^2, all > |t|^2
    vecs[0, 32:] = t  # the query: self-dot |t|^2 is NOT the max
    _mrl_fixture(tmp_path, vecs)
    out = (
        REGISTRY["mrl_truncation_eval"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("trunc_dim")
    )
    assert (out.recall_at_10 == 0.0).all()
    assert (out.top1_match == 0).all()


def test_mrl_eval_plans_takeordered_no_global_sort(spark):
    df = REGISTRY["mrl_truncation_eval"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert has_node(plan, "TakeOrderedAndProject")
    assert not has_node(plan, "rangepartitioning")
    assert not has_node(plan, "CartesianProduct")


def test_pq_refined_encode_beats_seed_codebooks(spark):
    """Lloyd starts from exactly the seed codebooks pq_encode_codes pins,
    and each iteration is non-increasing in inertia — so the refined
    twin's TOTAL quantization error must come out at or below the
    seed-codebook row's (the property that justifies training at all)."""
    seed = (
        REGISTRY["pq_encode_codes"].spark(spark, SF_DIR).toPandas()
    )
    refined = (
        REGISTRY["pq_refined_encode"].spark(spark, SF_DIR).toPandas()
    )
    assert len(seed) == len(refined)
    assert refined.qerr.sum() <= seed.qerr.sum() * (1 + 1e-9)
    # and strictly better on this corpus (not a vacuous tie)
    assert refined.qerr.sum() < seed.qerr.sum()


def test_pq_recall_eval_planted_lossless_codebook(spark, tmp_path):
    """A 16-vector corpus of distinct patterns makes the 16-row seed set
    the WHOLE corpus, so the codebook contains every vector's subvectors
    exactly: PQ quantization error is zero and the ADC ranking equals the
    exact squared-L2 ranking (same distances, same (dist, vec_id) tie
    rule) — the pq row must score perfect recall with the true top-1 at
    rank 1.  (The ivfpq row is NOT asserted perfect: nprobe=2 of 4 lists
    can legitimately miss exact neighbors living in unprobed lists —
    that residual loss is precisely what the canary measures.)"""
    rng = np.random.default_rng(33)
    patterns = rng.normal(size=(16, 64)).astype(np.float32)
    vecs = patterns.astype(np.float64)
    _mrl_fixture(tmp_path, vecs)
    out = (
        REGISTRY["pq_recall_eval"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("method")
    )
    assert sorted(out.index) == ["ivfpq", "pq"]
    assert out.loc["pq"].recall_at_10 == 1.0
    assert out.loc["pq"].hits == 10
    assert out.loc["pq"].top1_rank == 1
    assert out.loc["pq"].top1_rr == 1.0
    # internal consistency holds for both methods regardless of loss
    for m in ("pq", "ivfpq"):
        r = out.loc[m]
        assert r.hits == round(r.recall_at_10 * 10)
        assert 0.0 <= r.recall_at_10 <= 1.0
        if r.top1_rank > 0:
            assert abs(r.top1_rr - round(1.0 / r.top1_rank, 6)) < 1e-12
        else:
            assert r.top1_rr == 0.0


def test_pq_recall_eval_seed_codebooks_lose_neighbors_on_real_data(spark):
    """On the real sf0.001 corpus the seed (Lloyd iters=0) operating
    point MUST show measurable quantization loss (recall < 1) — if the
    canary reported perfect recall here it would be measuring nothing.
    Both rows stay internally consistent."""
    out = (
        REGISTRY["pq_recall_eval"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("method")
    )
    assert sorted(out.index) == ["ivfpq", "pq"]
    assert (out.recall_at_10 < 1.0).any()
    for m in ("pq", "ivfpq"):
        r = out.loc[m]
        assert r.hits == round(r.recall_at_10 * 10)
        assert 0 <= r.top1_rank <= 10


def test_mrl_pq_prefix_adc_planted_prefix_signal(spark, tmp_path):
    """With a lossless codebook (16 distinct patterns = the seed set) AND
    all signal in the first 16 dims (the prefix the 2 used subspaces
    cover), the prefix-subspace ADC ranking must equal the exact
    full-dim squared-L2 ranking — the Matryoshka ideal served from 2
    code bytes."""
    rng = np.random.default_rng(44)
    patterns = np.zeros((16, 64), dtype=np.float32)
    patterns[:, :16] = rng.normal(size=(16, 16)).astype(np.float32)
    _mrl_fixture(tmp_path, patterns.astype(np.float64))
    out = (
        REGISTRY["mrl_pq_adc_topk"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("adc_dist2")
        .reset_index(drop=True)
    )
    x = patterns.astype(np.float64)
    d2 = ((x - x[0]) ** 2).sum(axis=1)
    want = sorted(range(16), key=lambda i: (round(d2[i], 6), i))[:10]
    assert out.vec_id.tolist() == want
    assert out.adc_dist2.iloc[0] == 0.0  # the query matches itself


def test_mrl_pq_prefix_adc_plans_takeordered_map_only(spark):
    """Same plan claims as the full ADC row: codes scan + literal lookup
    arrays + TakeOrderedAndProject, no keyed exchange, no join in the
    serving path after the bounded seed collects."""
    df = REGISTRY["mrl_pq_adc_topk"].spark(spark, SF_DIR)
    plan = final_plan(df)
    assert has_node(plan, "TakeOrderedAndProject")
    assert not has_node(plan, "hashpartitioning")
    assert not has_node(plan, "rangepartitioning")
    assert not has_node(plan, "SortMergeJoin")


def test_refined_codebooks_do_not_hurt_recall(spark):
    """Closes the loop between 'refinement lowers quantization error'
    (pinned above) and 'refinement does not hurt retrieval' (r9 verdict
    item #7): MEAN recall@10 over 20 probe queries against the same
    exact squared-L2 ground truth pq_recall_eval uses, scored at both
    codebook operating points — seed (Lloyd iters=0, the oracle-checked
    row) and refined (iters=2, the pq_refined_encode path).  The mean is
    the right statistic: a SINGLE probe's recall is high-variance under
    re-clustering (measured here: vec_id 0 drops 0.3 -> 0.1 while the
    20-probe mean rises 0.24 -> 0.33), so the pinned property is the
    population one — refinement must IMPROVE mean recall on this corpus,
    strictly, mirroring the strict qerr improvement pinned above.
    Codes come from the Spark encode; the ADC gather-sum runs in numpy
    over the same distance tables (recall sets don't depend on fp
    association order at these magnitudes)."""
    from seisdb_spark.functions import pq as pq_lib
    from seisdb_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    vids = pdf.vec_id.to_numpy()

    def mean_recall(iters: int) -> float:
        books = pq_lib.train_codebooks(emb, iters=iters)
        cp = (
            pq_lib.pq_encode(emb, books)
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        code_mat = np.array([np.asarray(c) for c in cp.codes])
        recs = []
        for qi in range(20):
            q = mat[qi]
            d2 = ((mat - q) ** 2).sum(axis=1)
            truth = set(vids[np.lexsort((vids, d2))[:10]])
            table = np.array(pq_lib.adc_table(books, q))
            adc = table[
                np.arange(code_mat.shape[1])[None, :], code_mat
            ].sum(axis=1)
            got = set(vids[np.lexsort((vids, adc))[:10]])
            recs.append(len(got & truth) / 10)
        return float(np.mean(recs))

    seed, refined = mean_recall(0), mean_recall(2)
    assert refined > seed  # strictly better in aggregate on this corpus
    assert refined >= 0.3  # and actually retrieving, not noise-level


def test_pq_adc_n_use_validated():
    """n_use=0 would build malformed empty-sum SQL and n_use > n_sub
    would silently no-op — both must raise (r9 advice)."""
    from seisdb_spark.functions import pq as pq_lib

    books = [[[0.0] * 8] * 4] * 8
    q = np.zeros(64)
    for bad in (0, -1, 9):
        with pytest.raises(ValueError, match="n_use"):
            pq_lib.pq_adc_topk(None, books, q, n_use=bad)
