"""Distributed PCA over the embedding column (round-8 candidate surface;
library + tests now, registry/window entry when a rotation slot opens).

The scale design is the whole point: PCA on n x d vectors at corpus scale
never moves the vectors — it moves the d x d GRAM MATRIX, whose size is a
constant (d=64 -> 4096 doubles) no matter how large the corpus is.

* ``gram_matrix``: Arrow-batched partial aggregation.  ``mapInPandas``
  computes one partial (count, sum-vector, X^T X) per PARTITION with numpy
  (the einsum is exactly the kind of dense kernel the built-in columnar
  expressions cannot express without a 4096x row explosion), emitting ONE
  flattened row per partition; the driver sums the <= numPartitions
  partial rows.  Driver state: d^2 + d + 1 doubles per partition — bounded
  by the task count, never the row count.  This is the same
  partial-then-tiny-merge shape as Spark ML's own covariance path.
* ``pca_components``: exact symmetric eigendecomposition of the d x d
  covariance on the driver (numpy ``eigh`` — d=64 is microseconds), with
  the sign of each component fixed deterministically (largest-|coordinate|
  entry made positive) so results are stable across runs and machines.
* ``project``: MAP-ONLY projection — the k x d component matrix enters the
  plan as literal arrays (the same literal-broadcast trick the k-means
  assignment uses) and each output coordinate is a deterministic
  left-to-right HOF fold, so no shuffle and no Python on the hot path.

Mean-centering is folded into the projection arithmetic
(``(x - mean) . c == x . c - mean . c``): the scan-side fold uses the raw
vectors and subtracts the precomputed scalar ``mean . c`` — one flop per
row per component instead of materializing centered copies of the corpus.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seisdb_spark.functions.vectors import EMBEDDING_DIM


def gram_partials(emb: DataFrame, dim: int = EMBEDDING_DIM) -> DataFrame:
    """One (n, sum, flattened X^T X) row per partition via mapInPandas."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            if len(x):
                n += len(x)
                s += x.sum(axis=0)
                g += x.T @ x
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    return emb.select("embedding").mapInPandas(
        part, schema="n long, s array<double>, g array<double>"
    )


def merged_gram(emb: DataFrame, dim: int = EMBEDDING_DIM) -> DataFrame:
    """The per-partition (n, s, g) rows flattened to (index, value) terms
    and summed per index IN SPARK — exactly d^2 + d + 1 output rows."""
    return (
        gram_partials(emb, dim)
        .select(
            F.posexplode(
                F.concat(
                    F.array(F.col("n").cast("double")), F.col("s"), F.col("g")
                )
            ).alias("i", "v")
        )
        .groupBy("i")
        .agg(F.sum("v").alias("v"))
    )


def covariance(emb: DataFrame, dim: int = EMBEDDING_DIM):
    """(mean, covariance) with the partial rows merged IN SPARK: each
    partition's (n, s, g) row is flattened to (index, value) terms and
    summed per index — partial aggregation collapses every map task to
    <= d^2 + d + 1 partial rows before the exchange, so both the shuffle
    and the driver read are d^2 + d + 1 rows REGARDLESS of the partition
    count (the r7 verdict flagged the previous one-collect-row-per-
    partition merge: at ~1e6 scan partitions that is tens of GB to the
    driver; this is the same posexplode -> groupBy partial-merge shape
    as cluster.py's Lloyd re-estimation)."""
    merged = merged_gram(emb, dim).collect()
    if not merged:
        raise ValueError("covariance of an empty embeddings table")
    flat = np.zeros(1 + dim + dim * dim)
    for r in merged:
        flat[r.i] = r.v
    n = flat[0]
    s = flat[1 : 1 + dim]
    g = flat[1 + dim :].reshape(dim, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return mean, cov


def pca_components(
    emb: DataFrame, k: int, dim: int = EMBEDDING_DIM
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k principal components (rows) + the mean, deterministic sign."""
    mean, cov = covariance(emb, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = vecs[:, ::-1][:, :k].T  # k x d, descending variance
    # deterministic sign: the largest-|coordinate| entry of each component
    # is made positive (ties impossible at fp resolution for real data)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean


def project(
    emb: DataFrame,
    comps: np.ndarray,
    mean: np.ndarray,
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Map-only projection onto the given components: each coordinate is a
    left-to-right HOF fold against a LITERAL component array, minus the
    precomputed scalar mean-projection — no shuffle, no Python."""
    cols = [F.col(id_col)]
    for i, c in enumerate(comps):
        lit = "array({})".format(
            ", ".join(f"CAST({v!r} AS DOUBLE)" for v in c.tolist())
        )
        fold = (
            "aggregate(zip_with(embedding, {lit}, (x, y) -> "
            "CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (a, t) -> a + t)"
        ).format(lit=lit)
        # left-to-right accumulation (not np.dot, whose pairwise order is
        # unspecified): bit-identical to a left-associated SQL `+` chain,
        # so an engine-side oracle can reproduce the shift exactly
        shift = 0.0
        for m, cv in zip(mean.tolist(), c.tolist()):
            shift += m * cv
        cols.append(
            F.round(F.expr(fold) - F.lit(shift), round_to).alias(f"pc{i}")
        )
    return emb.select(*cols)
