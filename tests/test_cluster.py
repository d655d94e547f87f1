"""Lloyd k-means refinement (functions/cluster.py): planted-cluster
recovery, monotone inertia, and agreement with an independent numpy Lloyd
re-implementation from identical seeds."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from seisdb_spark.functions.cluster import (
    assign_clusters,
    lloyd_refine,
    seed_centroids,
)
from seisdb_spark.queries.registry import REGISTRY
from tests.conftest import SF_DIR


def _planted(tmp_path, n_per=40, k=3, dim=64, sep=20.0):
    """k well-separated Gaussian blobs, arranged so the k deterministic
    seeds (smallest md5(vec_id) digests) land in k DISTINCT blobs — with
    one seed per blob, Lloyd's local optimum IS the planted partition;
    with arbitrary seeds two could share a blob and recovery would be an
    unfair ask of any k-means."""
    n = n_per * k
    seed_ids = sorted(
        range(n), key=lambda v: hashlib.md5(str(v).encode()).hexdigest()
    )[:k]
    labels = [-1] * n
    for c, v in enumerate(seed_ids):
        labels[v] = c
    fill = [c for c in range(k) for _ in range(n_per - 1)]
    it = iter(fill)
    for v in range(n):
        if labels[v] < 0:
            labels[v] = next(it)
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(k, dim)) * sep
    vecs = [
        (centers[labels[v]] + rng.normal(scale=0.05, size=dim))
        .astype(np.float32)
        .tolist()
        for v in range(n)
    ]
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": vecs, "label": labels}
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    return pdf


def _numpy_lloyd(vecs, seeds, iters):
    cent = np.asarray(seeds, dtype=np.float64)
    x = np.asarray(vecs, dtype=np.float64)
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(len(cent)):
            if (a == c).any():
                cent[c] = x[a == c].mean(axis=0)
    d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), cent


def test_seeds_are_smallest_md5_digests(spark, tmp_path):
    pdf = _planted(tmp_path)
    from seisdb_spark.sources.tables import load_table

    emb = load_table(spark, str(tmp_path), "embeddings")
    seeds = seed_centroids(emb, 3)
    order = sorted(
        pdf.vec_id, key=lambda v: hashlib.md5(str(v).encode()).hexdigest()
    )[:3]
    expected = [
        [float(x) for x in pdf.set_index("vec_id").loc[v, "embedding"]]
        for v in order
    ]
    assert seeds == expected


def test_lloyd_recovers_planted_partition_and_matches_numpy(spark, tmp_path):
    pdf = _planted(tmp_path)
    from seisdb_spark.sources.tables import load_table

    emb = load_table(spark, str(tmp_path), "embeddings")
    assigned, cent = lloyd_refine(emb, k=3, iters=3)
    out = assigned.select("vec_id", "cluster").toPandas().set_index("vec_id")
    # exact recovery: every planted group lands in ONE cluster, all distinct
    got = pdf.assign(c=out.loc[pdf.vec_id, "cluster"].values)
    by_label = got.groupby("label").c.nunique()
    assert (by_label == 1).all(), "a planted cluster was split"
    assert got.groupby("label").c.first().nunique() == 3, "clusters merged"

    # numpy re-derivation from the same seeds: same partition + close means
    seeds = seed_centroids(emb, 3)
    np_assign, np_cent = _numpy_lloyd(list(pdf.embedding), seeds, iters=3)
    assert (got.c.values == np_assign).all()
    order = sorted(range(3))
    assert np.allclose(np.asarray(cent)[order], np_cent[order], atol=1e-4)


def test_lloyd_inertia_decreases(spark, tmp_path):
    _planted(tmp_path)
    from seisdb_spark.sources.tables import load_table

    emb = load_table(spark, str(tmp_path), "embeddings")
    seeds = seed_centroids(emb, 3)
    inertias = []
    centroids = seeds
    from seisdb_spark.functions.cluster import lloyd_refine as _lr

    for iters in (0, 1, 2):
        if iters == 0:
            assigned = assign_clusters(emb, seeds)
        else:
            assigned, _ = _lr(emb, k=3, iters=iters)
        inertias.append(
            assigned.agg({"dist2": "sum"}).head()[0]
        )
    assert inertias[0] >= inertias[1] >= inertias[2]
    assert inertias[2] < inertias[0]


def test_assignment_is_map_only(spark):
    """The 100 TB contract: assignment adds NO exchange beyond the input's
    own — centroid literals, HOF folds, argmin projection."""
    from seisdb_spark.plancheck import count_exchanges, final_plan
    from seisdb_spark.sources.tables import load_table, spread

    emb = spread(load_table(spark, SF_DIR, "embeddings"))
    base_df = emb.select("vec_id")
    base_df.collect()
    base = count_exchanges(final_plan(base_df))
    seeds = seed_centroids(emb, 4)
    df = assign_clusters(emb, seeds).select("vec_id", "cluster")
    df.collect()
    assert count_exchanges(final_plan(df)) == base


def test_registry_query_runs(spark):
    out = REGISTRY["kmeans_refine_assign"].spark(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    assert len(out) == len(emb)
    assert out.vec_id.is_unique
    assert out.cluster.between(0, 7).all()


def test_lloyd_derives_dim_and_rejects_ragged(spark, tmp_path):
    """dim comes from the SEED vectors, not a caller parameter: a short
    embedding hiding among full-length ones must raise (the round-6 advice
    flagged that a wrong dim silently zero-filled trailing centroid dims),
    and a clean short-dim corpus must work with no dim argument at all."""
    import pytest

    from seisdb_spark.sources.tables import load_table

    # clean 8-dim corpus: works, centroids have the derived length
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "vec_id": range(30),
            "embedding": [rng.normal(size=8).astype("f4").tolist() for _ in range(30)],
            "label": [0] * 30,
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    emb = load_table(spark, str(tmp_path), "embeddings")
    _, cent = lloyd_refine(emb, k=2, iters=1)
    assert all(len(c) == 8 for c in cent)

    # one ragged longer row -> posexplode emits a dim index outside the
    # seed dim -> loud ValueError instead of silently wrong centroids
    pdf2 = pdf.copy()
    # pick a ragged row that is NOT one of the k=2 seeds, so the seed dim
    # stays 8 and the ragged row must be caught at re-estimation
    seed2 = set(
        sorted(range(30), key=lambda v: hashlib.md5(str(v).encode()).hexdigest())[:2]
    )
    ragged = next(i for i in range(30) if i not in seed2)
    pdf2.at[ragged, "embedding"] = rng.normal(size=12).astype("f4").tolist()
    (tmp_path / "r").mkdir()
    pdf2.to_parquet(tmp_path / "r" / "embeddings.parquet")
    emb2 = load_table(spark, str(tmp_path / "r"), "embeddings")
    with pytest.raises(ValueError, match="outside the seed dim|ragged"):
        lloyd_refine(emb2, k=2, iters=1)


# --- distributed PCA (functions/pca.py, round-8 candidate surface) ---------


def test_pca_matches_numpy_and_is_map_only(spark, tmp_path):
    """Components/projection must match a pure-numpy PCA on the same data
    (up to the documented deterministic sign), and the projection plan
    must be map-only — no exchange of any kind."""
    import numpy as np
    import pandas as pd

    from seisdb_spark.functions.pca import pca_components, project
    from seisdb_spark.sources.tables import load_table

    rng = np.random.default_rng(17)
    # anisotropic data: variance concentrated along two planted directions
    base = rng.normal(size=(200, 64)) * 0.05
    d1, d2 = rng.normal(size=64), rng.normal(size=64)
    base += np.outer(rng.normal(size=200) * 3.0, d1 / np.linalg.norm(d1))
    base += np.outer(rng.normal(size=200) * 1.5, d2 / np.linalg.norm(d2))
    pdf = pd.DataFrame(
        {
            "vec_id": range(200),
            "embedding": [r.astype(np.float32).tolist() for r in base],
            "label": [0] * 200,
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    emb = load_table(spark, str(tmp_path), "embeddings")

    comps, mean = pca_components(emb, k=2)
    x = np.array([np.asarray(v, np.float64) for v in pdf.embedding])
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    want = vecs[:, ::-1][:, :2].T
    for i in range(2):
        w = want[i] if want[i][np.argmax(np.abs(want[i]))] > 0 else -want[i]
        np.testing.assert_allclose(comps[i], w, atol=1e-7)

    proj = project(emb, comps, mean)
    got = proj.toPandas().set_index("vec_id").sort_index()
    want_proj = np.round((x - x.mean(axis=0)) @ comps.T, 6)
    np.testing.assert_allclose(got[["pc0", "pc1"]].to_numpy(), want_proj, atol=2e-6)

    plan = proj._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final  # map-only: literal comps, no shuffle
    # the planted dominant direction carries more projected variance
    assert got.pc0.std() > got.pc1.std() * 1.5


def test_pca_gram_partials_bounded_by_partitions(spark, tmp_path):
    """The driver-merged state is one row per non-empty partition — the
    d^2-bounded partial-aggregation claim, checked directly."""
    import numpy as np
    import pandas as pd

    from seisdb_spark.functions.pca import gram_partials
    from seisdb_spark.sources.tables import load_table

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "vec_id": range(50),
            "embedding": [
                rng.normal(size=64).astype(np.float32).tolist()
                for _ in range(50)
            ],
            "label": [0] * 50,
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    emb = load_table(spark, str(tmp_path), "embeddings").repartition(8)
    parts = gram_partials(emb).collect()
    assert 1 <= len(parts) <= 8
    assert sum(r.n for r in parts) == 50
    assert all(len(r.g) == 64 * 64 and len(r.s) == 64 for r in parts)


def test_pca_driver_merge_bounded_by_dim_not_partitions(spark, tmp_path):
    """The r7 verdict's must-fix: ``covariance`` must read d^2 + d + 1
    MERGED rows from Spark (constant in the partition count), never one
    partial row per partition — and still match numpy exactly."""
    import numpy as np
    import pandas as pd

    from seisdb_spark.functions.pca import covariance, merged_gram
    from seisdb_spark.sources.tables import load_table

    rng = np.random.default_rng(11)
    x = rng.normal(size=(60, 64))
    pdf = pd.DataFrame(
        {
            "vec_id": range(60),
            "embedding": [r.astype(np.float32).tolist() for r in x],
            "label": [0] * 60,
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    emb = load_table(spark, str(tmp_path), "embeddings").repartition(16)
    assert merged_gram(emb).count() == 64 * 64 + 64 + 1
    # the exchange that merges partials is index-keyed (d^2-bounded), and
    # partial aggregation runs map-side before it
    plan = merged_gram(emb)._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower()
    xf = np.array([np.asarray(v, np.float64) for v in pdf.embedding])
    mean, cov = covariance(emb)
    np.testing.assert_allclose(mean, xf.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(
        cov, np.cov(xf, rowvar=False, bias=True), atol=1e-9
    )


# --- product quantization (functions/pq.py, round-8 candidate surface) -----


def _pq_fixture(tmp_path, n=120, seed=29):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    # clustered data so ADC recall is meaningful: 4 planted centers
    centers = rng.normal(size=(4, 64)) * 2.0
    x = centers[rng.integers(0, 4, size=n)] + rng.normal(size=(n, 64)) * 0.3
    pdf = pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [r.astype(np.float32).tolist() for r in x],
            "label": [0] * n,
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    return x


def test_pq_encode_matches_numpy_and_is_map_only(spark, tmp_path):
    """Codes must equal the numpy argmin against the SAME trained books,
    qerr must equal the summed chosen distances, and the encode plan must
    be exchange-free (map-only literal codebooks)."""
    import numpy as np

    from seisdb_spark.functions.pq import pq_encode, train_codebooks
    from seisdb_spark.sources.tables import load_table

    x = _pq_fixture(tmp_path)
    emb = load_table(spark, str(tmp_path), "embeddings")
    books = train_codebooks(emb, n_sub=8, k=8, iters=1)
    enc = pq_encode(emb, books)
    got = enc.toPandas().set_index("vec_id").sort_index()

    sublen = 8
    for i, xi in enumerate(x):
        want_codes, want_err = [], 0.0
        for s in range(8):
            sub = xi[s * sublen : (s + 1) * sublen]
            d = [((sub - np.asarray(c)) ** 2).sum() for c in books[s]]
            want_codes.append(int(np.argmin(d)))
            want_err += min(d)
        assert list(got.loc[i].codes) == want_codes, f"vec {i}"
        assert abs(got.loc[i].qerr - round(want_err, 6)) < 2e-6

    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


def test_pq_adc_recall_and_plan(spark, tmp_path):
    """ADC top-10 from codes alone must recover most of the exact top-10
    (clustered data, 8x8 codebooks), and the search plan must be
    TakeOrderedAndProject over a map-only projection."""
    import numpy as np

    from seisdb_spark.functions.pq import (
        pq_adc_topk,
        pq_encode,
        train_codebooks,
    )
    from seisdb_spark.sources.tables import load_table

    x = _pq_fixture(tmp_path)
    emb = load_table(spark, str(tmp_path), "embeddings")
    books = train_codebooks(emb, n_sub=8, k=8, iters=1)
    codes = pq_encode(emb, books)
    q = x[0]
    top = pq_adc_topk(codes, books, q, topk=10)
    got = set(top.toPandas().vec_id)
    exact = set(
        np.argsort(((x - q) ** 2).sum(axis=1), kind="stable")[:10].tolist()
    )
    assert len(got & exact) >= 6, f"ADC recall {len(got & exact)}/10"
    plan = top._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final
    assert "Exchange" not in final


def test_ivfpq_recall_pruning_and_residual_gain(spark, tmp_path):
    """The composed index must (a) beat a conservative recall floor while
    scanning only the probed lists (the filter is the pruning predicate),
    and (b) quantize residuals with LOWER error than raw-vector PQ at the
    same code budget — the reason production indexes encode residuals."""
    import numpy as np

    from seisdb_spark.functions.pq import (
        ivfpq_build,
        ivfpq_topk,
        pq_encode,
        train_codebooks,
    )
    from seisdb_spark.sources.tables import load_table

    x = _pq_fixture(tmp_path, n=160, seed=41)
    emb = load_table(spark, str(tmp_path), "embeddings")
    codes, coarse, books = ivfpq_build(emb, n_coarse=4, n_sub=8, k=8)
    got_codes = codes.toPandas()
    assert len(got_codes) == 160
    assert set(got_codes["list"].unique()) <= {0, 1, 2, 3}

    q = x[3]
    top = ivfpq_topk(codes, coarse, books, q, nprobe=2, topk=10)
    got = set(top.toPandas().vec_id)
    exact = set(
        np.argsort(((x - q) ** 2).sum(axis=1), kind="stable")[:10].tolist()
    )
    assert len(got & exact) >= 6, f"IVF-PQ recall {len(got & exact)}/10"
    plan = top._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final

    # residual PQ must beat raw PQ on mean quantization error
    raw_books = train_codebooks(emb, n_sub=8, k=8, iters=1)
    raw_err = pq_encode(emb, raw_books).agg({"qerr": "avg"}).head()[0]
    res_err = codes.agg({"qerr": "avg"}).head()[0]
    assert res_err < raw_err, (res_err, raw_err)


def test_semdedup_k_properties():
    """Pure-formula properties of the capped cluster count: bounds, sqrt
    behavior below the cap, cap above it, monotone non-decreasing."""
    from hypothesis import given
    from hypothesis import strategies as st

    from seisdb_spark.queries.extensions import (
        SEMDEDUP_K_CAP,
        SEMDEDUP_MIN_K,
        semdedup_k,
    )

    @given(st.integers(min_value=0, max_value=10**12))
    def check(n):
        import math

        k = semdedup_k(n)
        assert SEMDEDUP_MIN_K <= k <= SEMDEDUP_K_CAP
        if n > 1:
            want = math.isqrt(n - 1) + 1
            assert k == max(SEMDEDUP_MIN_K, min(SEMDEDUP_K_CAP, want))
        assert semdedup_k(n + 1) >= k  # monotone

    check()
