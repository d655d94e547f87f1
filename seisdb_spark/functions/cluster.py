"""Distributed Lloyd k-means refinement over ``array<float>`` embeddings.

The IVF ANN index (queries/extensions.py::ann_ivf_topk) and SemDeDup-style
semantic dedup (::semantic_dedup) both consume centroids; this module
supplies the ITERATIVE refinement step that turns their one-shot
deterministic seeds into converged Lloyd centroids — the standard k-means
loop re-expressed in Spark's execution model:

* **assignment is a map-only projection** — the k current centroids are
  plan LITERALS (k is bounded; centroids are k*dim doubles), so each row's
  nearest-centroid id is computed by k higher-order-function folds and an
  ``array_position(dists, array_min(dists))`` argmin with NO join and NO
  shuffle.  This is deliberately NOT an n x k crossJoin: at 100 TB the
  assignment stage must stay inside the scan's whole-stage codegen.
* **re-estimation is one aggregation** — ``posexplode`` the embedding to
  (cluster, dim, value) and average per (cluster, dim); partial aggregation
  reduces every partition to at most k*dim rows before the shuffle, so the
  exchange is k*dim-sized regardless of corpus size.
* **the driver holds only k*dim doubles per iteration** (the collected
  means) — the classic bounded-state Lloyd loop, same contract as
  ``ml.clustering.KMeans`` but dependency-free and deterministic.

Determinism: seeds are the k rows with the smallest md5(vec_id) digests
(content-stable, ties impossible), iteration count is fixed (no
data-dependent convergence test), and empty clusters keep their previous
centroid.  Exact reproducibility across CLUSTER SIZES is not claimed for
the centroid VALUES (fp mean accumulation order varies with partitioning —
inherent to any distributed mean); the planted-cluster tests therefore
assert assignment recovery and monotone inertia, not bitwise centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KMEANS_K = 8
KMEANS_ITERS = 2


def _dist2_expr(col: str, centroid: list[float]) -> str:
    """Squared L2 distance from ``col`` to a literal centroid, as one
    higher-order fold (loop codegen — see vectors.py on the JIT tax)."""
    lit = ", ".join(f"CAST({c!r} AS DOUBLE)" for c in centroid)
    return (
        f"aggregate(zip_with({col}, array({lit}), "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def assign_clusters(
    emb: DataFrame, centroids: list[list[float]], col: str = "embedding"
) -> DataFrame:
    """Adds ``cluster`` (0-based nearest-centroid id, ties to the lowest id)
    and ``dist2`` — a pure projection, no join, no shuffle."""
    dists = "array(" + ", ".join(_dist2_expr(col, c) for c in centroids) + ")"
    return emb.withColumn("_d", F.expr(dists)).select(
        "*",
        (F.expr("array_position(_d, array_min(_d))") - 1)
        .cast("int")
        .alias("cluster"),
        F.expr("array_min(_d)").alias("dist2"),
    ).drop("_d")


def seed_centroids(emb: DataFrame, k: int, col: str = "embedding") -> list[list[float]]:
    """The k rows with the smallest md5(vec_id) digests, as float lists —
    deterministic, content-stable, order-free (TakeOrderedAndProject)."""
    rows = (
        emb.select(col, F.md5(F.col("vec_id").cast("string").cast("binary")).alias("_h"))
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


def lloyd_refine(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """``iters`` Lloyd iterations from deterministic seeds; returns the
    final assignment DataFrame (input columns + ``cluster`` + ``dist2``)
    and the refined centroids.  Driver state: k*dim doubles per iteration.

    ``dim`` is DERIVED from the first seed vector rather than taken as a
    parameter: a caller-supplied dim longer than the actual embeddings
    would make ``_dist2_expr``'s zip_with NULL-pad and the re-estimation
    zero-fill unobserved trailing dims — wrong centroids with no error
    (flagged in the round-6 advice).  A mean row outside [0, dim) now
    raises instead of being silently dropped."""
    centroids = seed_centroids(emb, k, col)
    if not centroids:
        raise ValueError("lloyd_refine: input has no rows to seed from")
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = assign_clusters(emb, centroids, col)
        means = (
            assigned.select("cluster", F.posexplode(F.col(col)).alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty cluster keeps its centroid
        acc: dict[int, list[float]] = {}
        for r in means:
            if not (0 <= r.d < dim):
                raise ValueError(
                    f"lloyd_refine: dimension index {r.d} outside the seed "
                    f"dim {dim} — ragged embedding arrays in the input"
                )
            acc.setdefault(r.cluster, [0.0] * dim)[r.d] = r.m
        for cid, vec in acc.items():
            new[cid] = vec
        centroids = new
    return assign_clusters(emb, centroids, col), centroids
