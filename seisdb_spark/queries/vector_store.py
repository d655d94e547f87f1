"""Driver-checked registry queries for the vector-store codec surface
(functions/pca.py + functions/pq.py) — the r7 verdict's top round-8 item.

These wrap the tested library (PCA projection, PQ encode, flat ADC top-k,
composed IVF-PQ probe) as oracle-bearing queries.  The one thing an
ANSI-SQL oracle cannot reproduce is ITERATIVE training (eigh / Lloyd), so
each query pins the trained artifact to its deterministic SQL-expressible
form and exercises the full production DATA PATH around it:

* ``pca_project`` projects onto a FIXED orthonormal Walsh–Hadamard basis
  (entries ±1/8, exact in binary — no rounding drift) with the mean taken
  from the data; the eigendecomposition itself is driver-side numpy over a
  d x d covariance and stays numpy-golden-tested (tests/test_cluster.py),
  exactly like the Lloyd loop behind ``kmeans_refine_assign``.
* the PQ family uses ONE-SHOT SEED CODEBOOKS — per-subspace centroids are
  the subvectors of the k rows with the smallest md5 id-hashes, the same
  deterministic seed rule ``cluster.seed_centroids`` / ``semantic_dedup``
  use (Lloyd ``iters=0``).  The encode / ADC / probe machinery is byte-for-
  byte the production one (``pq_encode`` / ``pq_adc_topk`` / ``ivfpq_topk``
  are called directly); only the codebook VALUES differ from the refined
  ones, and refinement is covered by the k-means driver row + pytest.

Engine-exactness: every driver-side scalar (codebook entries, ADC tables,
probe distances, the mean-projection shift) is collected floats widened to
double and accumulated LEFT-TO-RIGHT, so the literal expressions Spark
evaluates are bit-identical to the oracle's left-associated `+` chains —
the same discipline as dot_chain_col/dot_chain_sql.

Scale shape (unchanged from the library docstrings): seed selection is a
TakeOrderedAndProject of k rows; codebooks/components enter the plan as
literals (map-only encode/projection, no join, no shuffle); ADC search is
a scan of the 32x-smaller codes table + TakeOrdered; the IVF list id is
the partition-pruning column at 100 TB (asserted in
tests/test_vector_store.py::test_ivfpq_codes_partition_pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seisdb_spark.functions import pca as pca_lib
from seisdb_spark.functions import pq as pq_lib
from seisdb_spark.functions.cluster import assign_clusters
from seisdb_spark.functions.vectors import EMBEDDING_DIM
from seisdb_spark.queries.extensions import _hash32_sql
from seisdb_spark.queries.registry import query
from seisdb_spark.sources.tables import content_hash32, load_table, spread

# --- shared seed machinery --------------------------------------------------

PCA_PROJECT_K = 4
PQ_N_SUB = pq_lib.PQ_SUBSPACES  # 8 subspaces of 8 dims
PQ_SEED_K = pq_lib.PQ_K  # 16 centroids per subspace
IVF_N_COARSE = 4
IVF_NPROBE = 2


def _seed_vectors(spark: SparkSession, sf_dir: str, k: int) -> list[list[float]]:
    """The k embedding vectors with the smallest (md5-id-hash, vec_id) —
    content-stable, engine-reproducible (TakeOrderedAndProject, k rows to
    the driver).  Lockstep with the oracle's ``ranked`` CTE."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    rows = (
        emb.select("vec_id", "embedding", content_hash32("vec_id").alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r.embedding] for r in rows]


def _books_from_seeds(
    seeds: list[list[float]], n_sub: int
) -> list[list[list[float]]]:
    """Slice whole seed vectors into per-subspace codebooks (n_sub x k x
    d/n_sub) — the Lloyd iters=0 operating point."""
    sublen = len(seeds[0]) // n_sub
    return [
        [v[s * sublen : (s + 1) * sublen] for v in seeds]
        for s in range(n_sub)
    ]


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    """The probe vector every ANN oracle query uses: embedding of vec_id 0."""
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    return [float(x) for x in row.embedding]


#: ranked/seed CTE prefix shared by every oracle below (DuckDB twin of
#: :func:`_seed_vectors` — same hash, same (h, vec_id) order).
_RANKED_CTE = f"""
    eh AS (
        SELECT vec_id, embedding,
               {_hash32_sql("CAST(vec_id AS VARCHAR)")} AS h
        FROM embeddings
    ),
    ranked AS (
        SELECT vec_id, embedding,
               row_number() OVER (ORDER BY h, vec_id) AS rk
        FROM eh
    )
"""


def _sq(a: str, b: str) -> str:
    """((a) - (b))^2 — written out so the oracle's ops are the exact IEEE
    sequence the Spark fold evaluates."""
    return f"(({a}) - ({b})) * (({a}) - ({b}))"


def _chain(terms: list[str]) -> str:
    """Left-associated `+` chain (SQL grammar folds left), bit-matching a
    left-to-right fold from +0.0."""
    return " + ".join(terms)


# --- pca_project ------------------------------------------------------------

# Walsh–Hadamard rows 1, 2, 4, 8 of H_64, normalized: entries are exactly
# ±0.125 (a power of two — exact in binary, so NO rounding drift between
# the Python literals and the SQL literals), and distinct rows are exactly
# orthonormal.  popcount parity of (row & dim) gives the sign.
def _hadamard_row(r: int, dim: int = EMBEDDING_DIM) -> list[float]:
    scale = 1.0 / (dim ** 0.5)  # 1/8 for dim 64 — exact
    return [
        scale * (1.0 if bin(r & d).count("1") % 2 == 0 else -1.0)
        for d in range(dim)
    ]


PCA_PROJECT_BASIS: list[list[float]] = [
    _hadamard_row(r) for r in (1, 2, 4, 8)
]


# The mean must be DETERMINISTIC, not just rounded: round(avg(...), 3)
# is a partition-order-dependent fp sum, and a per-dim sum landing within
# an ulp of a 0.0005 rounding boundary would make the two engines (or two
# Spark runs with different partitioning) disagree (r8 advice).  Fix: sum
# EXACT fixed-point micro-units (floor(x * 1e6 + 0.5) as BIGINT — integer
# addition is order-independent) and divide once; both engines evaluate
# the identical text on identical doubles, so the mean is bit-stable under
# any partitioning.
_MEAN_SCALE = 1_000_000


def _mean_unit_sql(d: int) -> str:
    return (
        f"CAST(floor(CAST(embedding[{d + 1}] AS DOUBLE)"
        f" * CAST({_MEAN_SCALE} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )


@query(
    "pca_project",
    oracle=f"""
        WITH msum AS (
            SELECT count(*) AS n,
                   {", ".join(
                       f"CAST(sum({_mean_unit_sql(d)}) AS BIGINT) AS s{d}"
                       for d in range(EMBEDDING_DIM)
                   )}
            FROM embeddings
        ),
        m AS (
            SELECT {", ".join(
                f"CAST(s{d} AS DOUBLE)"
                f" / CAST(n * {_MEAN_SCALE} AS DOUBLE) AS m{d}"
                for d in range(EMBEDDING_DIM)
            )}
            FROM msum
        )
        SELECT e.vec_id,
               {", ".join(
                   "round(("
                   + _chain([
                       f"CAST(e.embedding[{d + 1}] AS DOUBLE)"
                       f" * CAST({c[d]!r} AS DOUBLE)"
                       for d in range(EMBEDDING_DIM)
                   ])
                   + ") - ("
                   + _chain([
                       f"m.m{d} * CAST({c[d]!r} AS DOUBLE)"
                       for d in range(EMBEDDING_DIM)
                   ])
                   + f"), 6) AS pc{i}"
                   for i, c in enumerate(PCA_PROJECT_BASIS)
               )}
        FROM embeddings e CROSS JOIN m
    """,
    doc=f"PCA PROJECTION surface (functions/pca.py::project): MAP-ONLY "
    f"centered projection of every embedding onto {PCA_PROJECT_K} "
    "components — each output coordinate is one HOF fold against a "
    "LITERAL component array minus a precomputed mean-projection scalar, "
    "no shuffle, no Python on the hot path. The driver row pins the "
    "components to a fixed orthonormal Walsh-Hadamard basis (entries "
    "exactly +-1/8) because an eigendecomposition is not ANSI-SQL-"
    "expressible; the mean is taken from the DATA as an EXACT fixed-point "
    "sum (floor(x*1e6+0.5) micro-units, DECIMAL(38,0) accumulator so "
    "overflow nulls loudly instead of wrapping, one division) — integer "
    "addition is partition-order-independent, so the mean is bit-stable "
    "across engines AND across Spark partitionings, unlike a rounded fp "
    "avg. The eigen path itself (d x d Gram collapse -> "
    "driver eigh) is numpy-golden-tested with a dimension-bounded driver "
    "merge. At 100 TB: the Gram collapse is the only exchange (d^2-sized) "
    "and the projection pipelines into the scan.",
    bench=True,
)
def pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    # Spark's embedding[d] is 0-based where the oracle's is 1-based, so the
    # shared expression text shifts the index by one; everything after the
    # element access is identical.  One agg row (count + 64 BIGINTs) to the
    # driver; the single float division below is the same two-double IEEE
    # division the oracle's CAST(s AS DOUBLE) / CAST(n*scale AS DOUBLE) is.
    # Per-term micro-units fit BIGINT, but the SUM accumulates in
    # DECIMAL(38,0): Spark's non-ANSI sum(BIGINT) silently WRAPS at 2^63
    # (~9e12 rows at unit-scale embeddings — reachable at the 100 TB
    # framing), whereas a decimal sum overflows to NULL, which the
    # assert below turns into a loud failure instead of a corrupt mean.
    # DuckDB's oracle side already sums exactly (HUGEINT accumulator).
    sums_row = emb.select(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(
                f"sum(CAST(CAST(floor(CAST(embedding[{d}] AS DOUBLE)"
                f" * CAST({_MEAN_SCALE} AS DOUBLE)"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT) AS DECIMAL(38,0)))"
            ).alias(f"s{d}")
            for d in range(EMBEDDING_DIM)
        ]
    ).collect()[0]
    import numpy as np

    if any(sums_row[f"s{d}"] is None for d in range(EMBEDDING_DIM)):
        raise ArithmeticError(
            "fixed-point mean sum overflowed DECIMAL(38,0)"
        )
    denom = float(sums_row["n"] * _MEAN_SCALE)
    mean = np.array(
        [float(int(sums_row[f"s{d}"])) / denom for d in range(EMBEDDING_DIM)]
    )
    comps = np.array(PCA_PROJECT_BASIS)
    return pca_lib.project(emb, comps, mean)


# --- pq_encode_codes --------------------------------------------------------

def _pq_encode_ctes() -> str:
    """Per-subspace argmin CTEs d0..d{n_sub-1}: (vec_id, code, d) with the
    Spark tie rule (first index reaching the min = ORDER BY d, code)."""
    sublen = EMBEDDING_DIM // PQ_N_SUB
    ctes = [
        _RANKED_CTE.strip(),
        f"seeds AS (SELECT rk, embedding AS c FROM ranked"
        f" WHERE rk <= {PQ_SEED_K})",
    ]
    for s in range(PQ_N_SUB):
        chain = _chain(
            [
                _sq(
                    f"CAST(e.embedding[{s * sublen + j + 1}] AS DOUBLE)",
                    f"CAST(s.c[{s * sublen + j + 1}] AS DOUBLE)",
                )
                for j in range(sublen)
            ]
        )
        ctes.append(
            f"""d{s} AS (
            SELECT vec_id, code, d FROM (
                SELECT vec_id, code, d,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d, code) AS rn
                FROM (SELECT e.vec_id, s.rk - 1 AS code, {chain} AS d
                      FROM embeddings e CROSS JOIN seeds s)
            ) WHERE rn = 1
        )"""
        )
    return ",\n".join(ctes)


@query(
    "pq_encode_codes",
    oracle=f"""
        WITH {_pq_encode_ctes()}
        SELECT d0.vec_id,
               {" || '-' || ".join(
                   f"CAST(d{s}.code AS VARCHAR)" for s in range(PQ_N_SUB)
               )} AS codes,
               round({_chain([f"d{s}.d" for s in range(PQ_N_SUB)])}, 6)
                   AS qerr
        FROM {" JOIN ".join(
            ["d0"]
            + [f"d{s} ON d{s}.vec_id = d0.vec_id" for s in range(1, PQ_N_SUB)]
        )}
    """,
    doc=f"PRODUCT QUANTIZATION ENCODE (functions/pq.py::pq_encode): each "
    f"embedding splits into {PQ_N_SUB} subvectors, each coded as the "
    f"argmin over a {PQ_SEED_K}-entry LITERAL codebook — "
    f"{PQ_N_SUB}x{PQ_SEED_K} small HOF folds inside whole-stage codegen, "
    "MAP-ONLY (no join, no shuffle), plus the summed per-vector "
    "quantization error. Storage drops 32x (d float32 -> n_sub code "
    "bytes) — the production vector-store codec. Codebooks here are the "
    "deterministic seed subvectors (smallest md5 id-hashes, Lloyd "
    "iters=0) so the oracle can re-derive them relationally; the Lloyd "
    "refinement that would replace them is the kmeans_refine_assign "
    "surface. Codes serialize as a '-'-joined string for the hash check.",
    bench=True,
)
def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    books = _books_from_seeds(
        _seed_vectors(spark, sf_dir, PQ_SEED_K), PQ_N_SUB
    )
    return pq_lib.pq_encode(emb, books).select(
        "vec_id",
        F.array_join(F.col("codes").cast("array<string>"), "-").alias(
            "codes"
        ),
        "qerr",
    )


# --- pq_adc_topk ------------------------------------------------------------

def _pq_adc_ctes() -> str:
    """Encode CTEs + per-subspace ADC-term CTEs a0..a{n_sub-1}: the term is
    the distance from the QUERY's subvector to the row's CHOSEN centroid —
    computed from codes + codebook + query only (never the row vector)."""
    sublen = EMBEDDING_DIM // PQ_N_SUB
    ctes = [
        _pq_encode_ctes(),
        "qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)",
    ]
    for s in range(PQ_N_SUB):
        chain = _chain(
            [
                _sq(
                    f"CAST(qv.qe[{s * sublen + j + 1}] AS DOUBLE)",
                    f"CAST(sc.c[{s * sublen + j + 1}] AS DOUBLE)",
                )
                for j in range(sublen)
            ]
        )
        ctes.append(
            f"""a{s} AS (
            SELECT d{s}.vec_id, {chain} AS qd
            FROM d{s} JOIN seeds sc ON sc.rk = d{s}.code + 1
            CROSS JOIN qv
        )"""
        )
    return ",\n".join(ctes)


@query(
    "pq_adc_topk",
    oracle=f"""
        WITH {_pq_adc_ctes()}
        SELECT a0.vec_id,
               round({_chain([f"a{s}.qd" for s in range(PQ_N_SUB)])}, 6)
                   AS adc_dist2
        FROM {" JOIN ".join(
            ["a0"]
            + [f"a{s} ON a{s}.vec_id = a0.vec_id" for s in range(1, PQ_N_SUB)]
        )}
        ORDER BY adc_dist2, a0.vec_id
        LIMIT 10
    """,
    doc="PQ ADC TOP-K (functions/pq.py::pq_adc_topk): approximate nearest "
    "neighbours computed from CODES ALONE — the query's n_sub x k "
    "distance table is built driver-side (n_sub*k doubles, left-to-right "
    "accumulation for engine-exactness) and enters the plan as literal "
    "lookup arrays; each row's distance is n_sub element_at lookups "
    "summed, then orderBy().limit() plans TakeOrderedAndProject. At 100 "
    "TB only the 32x-smaller codes table is scanned — the original "
    "vectors are never touched. Oracle recomputes codes relationally and "
    "joins each back to its centroid for the asymmetric distance.",
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    books = _books_from_seeds(
        _seed_vectors(spark, sf_dir, PQ_SEED_K), PQ_N_SUB
    )
    codes = pq_lib.pq_encode(emb, books)
    return pq_lib.pq_adc_topk(
        codes, books, _query_vector(spark, sf_dir), topk=10
    )


# --- ivfpq_adc_topk ---------------------------------------------------------

def _ivfpq_ctes() -> str:
    """The composed index, relationally: coarse seed centroids -> corpus
    list assignment -> residual seed codebooks -> per-subspace residual
    encode -> probed lists -> per-list ADC terms."""
    sublen = EMBEDDING_DIM // PQ_N_SUB
    full = range(1, EMBEDDING_DIM + 1)
    ctes = [
        _RANKED_CTE.strip(),
        f"coarse AS (SELECT rk AS crk, embedding AS c FROM ranked"
        f" WHERE rk <= {IVF_N_COARSE})",
        f"bseed AS (SELECT rk AS brk, embedding AS b FROM ranked"
        f" WHERE rk <= {PQ_SEED_K})",
    ]
    cdist = _chain(
        [
            _sq(
                f"CAST(e.embedding[{i}] AS DOUBLE)",
                f"CAST(co.c[{i}] AS DOUBLE)",
            )
            for i in full
        ]
    )
    ctes.append(
        f"""rasg AS (
        SELECT vec_id, crk - 1 AS list FROM (
            SELECT vec_id, crk, d,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d, crk) AS rn
            FROM (SELECT e.vec_id, co.crk, {cdist} AS d
                  FROM embeddings e CROSS JOIN coarse co)
        ) WHERE rn = 1
    )"""
    )
    bdist = _chain(
        [
            _sq(f"CAST(b.b[{i}] AS DOUBLE)", f"CAST(co.c[{i}] AS DOUBLE)")
            for i in full
        ]
    )
    ctes.append(
        f"""bsasg AS (
        SELECT brk, crk - 1 AS blist FROM (
            SELECT brk, crk, d,
                   row_number() OVER (PARTITION BY brk
                                      ORDER BY d, crk) AS rn
            FROM (SELECT b.brk, co.crk, {bdist} AS d
                  FROM bseed b CROSS JOIN coarse co)
        ) WHERE rn = 1
    )"""
    )
    for s in range(PQ_N_SUB):
        idx = [s * sublen + j + 1 for j in range(sublen)]
        chain = _chain(
            [
                _sq(
                    f"(CAST(e.embedding[{i}] AS DOUBLE)"
                    f" - CAST(ac.c[{i}] AS DOUBLE))",
                    f"(CAST(b.b[{i}] AS DOUBLE)"
                    f" - CAST(bc.c[{i}] AS DOUBLE))",
                )
                for i in idx
            ]
        )
        ctes.append(
            f"""enc{s} AS (
            SELECT vec_id, list, code, d FROM (
                SELECT vec_id, list, code, d,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d, code) AS rn
                FROM (SELECT e.vec_id, a.list, b.brk - 1 AS code, {chain} AS d
                      FROM embeddings e
                      JOIN rasg a ON a.vec_id = e.vec_id
                      JOIN coarse ac ON ac.crk = a.list + 1
                      CROSS JOIN bseed b
                      JOIN bsasg bs ON bs.brk = b.brk
                      JOIN coarse bc ON bc.crk = bs.blist + 1)
            ) WHERE rn = 1
        )"""
        )
    ctes.append(
        "qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)"
    )
    qdist = _chain(
        [
            _sq(f"CAST(qv.qe[{i}] AS DOUBLE)", f"CAST(co.c[{i}] AS DOUBLE)")
            for i in full
        ]
    )
    ctes.append(
        f"""probed AS (
        SELECT crk - 1 AS list FROM (
            SELECT crk, d, row_number() OVER (ORDER BY d, crk) AS rn
            FROM (SELECT co.crk, {qdist} AS d
                  FROM coarse co CROSS JOIN qv)
        ) WHERE rn <= {IVF_NPROBE}
    )"""
    )
    for s in range(PQ_N_SUB):
        idx = [s * sublen + j + 1 for j in range(sublen)]
        chain = _chain(
            [
                _sq(
                    f"(CAST(qv.qe[{i}] AS DOUBLE)"
                    f" - CAST(ac.c[{i}] AS DOUBLE))",
                    f"(CAST(b.b[{i}] AS DOUBLE)"
                    f" - CAST(bc.c[{i}] AS DOUBLE))",
                )
                for i in idx
            ]
        )
        ctes.append(
            f"""adc{s} AS (
            SELECT enc{s}.vec_id, {chain} AS qd
            FROM enc{s}
            JOIN coarse ac ON ac.crk = enc{s}.list + 1
            JOIN bseed b ON b.brk = enc{s}.code + 1
            JOIN bsasg bs ON bs.brk = b.brk
            JOIN coarse bc ON bc.crk = bs.blist + 1
            CROSS JOIN qv
            WHERE enc{s}.list IN (SELECT list FROM probed)
        )"""
        )
    return ",\n".join(ctes)


@query(
    "ivfpq_adc_topk",
    oracle=f"""
        WITH {_ivfpq_ctes()}
        SELECT adc0.vec_id,
               round({_chain([f"adc{s}.qd" for s in range(PQ_N_SUB)])}, 6)
                   AS adc_dist2
        FROM {" JOIN ".join(
            ["adc0"]
            + [
                f"adc{s} ON adc{s}.vec_id = adc0.vec_id"
                for s in range(1, PQ_N_SUB)
            ]
        )}
        ORDER BY adc_dist2, adc0.vec_id
        LIMIT 10
    """,
    doc=f"IVF-PQ PROBE (functions/pq.py::ivfpq_topk): the composed "
    f"production index — {IVF_N_COARSE} coarse lists (seed centroids, "
    "corpus assigned map-only via literal folds), PQ codebooks trained on "
    "RESIDUALS (x - list centroid; smaller and better-conditioned, the "
    f"FAISS IVFPQ composition), probe the {IVF_NPROBE} lists nearest the "
    "query with a PER-LIST residual ADC table, TakeOrdered the union. At "
    "100 TB the list id is the partition column (write.partitionBy) so "
    "probing is partition PRUNING over an already-32x-smaller codes table "
    "— asserted in tests/test_vector_store.py. Every stage is map-only or "
    "k-row-bounded; the oracle re-derives coarse assignment, residual "
    "codebooks, codes, probed lists, and ADC terms relationally.",
    bench=True,
)
def ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    # ONE seed collect serves both quantizers (r18 opt): _seed_vectors
    # orders by the same (md5-id-hash, vec_id) key for any k, so the
    # IVF_N_COARSE coarse seeds are exactly the first rows of the
    # PQ_SEED_K book seeds — the second TakeOrdered corpus scan the old
    # two-call form paid at every plan build (~0.5 s at sf0.1, a full
    # extra corpus pass at 100 TB) carried no new information.
    seeds = _seed_vectors(spark, sf_dir, max(PQ_SEED_K, IVF_N_COARSE))
    coarse = seeds[:IVF_N_COARSE]
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
    # book seeds = the 16 md5-smallest rows' RESIDUALS, computed driver-
    # side with the same exact IEEE ops the oracle's bseed/bsasg CTEs use
    seeds = seeds[:PQ_SEED_K]
    resid_seeds = []
    for v in seeds:
        d2 = []
        for c in coarse:
            acc = 0.0
            for a, b in zip(v, c):
                acc += (a - b) * (a - b)
            d2.append(acc)
        cl = min(range(len(coarse)), key=lambda j: (d2[j], j))
        resid_seeds.append([a - b for a, b in zip(v, coarse[cl])])
    books = _books_from_seeds(resid_seeds, PQ_N_SUB)
    codes = pq_lib.pq_encode(resid, books, keep=("list",))
    return pq_lib.ivfpq_topk(
        codes,
        coarse,
        books,
        _query_vector(spark, sf_dir),
        nprobe=IVF_NPROBE,
        topk=10,
    )


# --- Matryoshka truncation eval --------------------------------------------
# Matryoshka-style embeddings (MRL) front-load information so a PREFIX of
# the vector is a usable lower-cost embedding; adaptive retrieval serves
# most queries from a short prefix and escalates only when needed.  Before
# a pipeline can do that it must MEASURE what each truncation costs on its
# own corpus — this eval scores prefix-d retrieval (d = 8, 16, 32) against
# the exact full-dim top-10: recall@10 + whether the top-1 survives.  Same
# eval shape as retrieval_eval_recall (k-row-bounded joins, every top-k a
# TakeOrderedAndProject); a prefix dot is strictly cheaper than the full
# one, so the eval's own cost is ~4 corpus scans sharing one spread.
MRL_DIMS = (8, 16, 32)
MRL_TOPK = 10


def _mrl_topk_sql(d: int) -> str:
    from seisdb_spark.functions.vectors import dot_chain_sql

    chain = dot_chain_sql("e.embedding", "q.q_emb", dim=d)
    return (
        f"SELECT e.vec_id, {chain} AS dot FROM embeddings e CROSS JOIN q "
        f"ORDER BY {chain} DESC, e.vec_id LIMIT {MRL_TOPK}"
    )


def _mrl_oracle() -> str:
    ctes = ["q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)"]
    ctes.append(f"ex AS ({_mrl_topk_sql(EMBEDDING_DIM)})")
    ctes.append(
        "ex1 AS (SELECT vec_id FROM ex ORDER BY dot DESC, vec_id LIMIT 1)"
    )
    selects = []
    for d in MRL_DIMS:
        ctes.append(f"t{d} AS ({_mrl_topk_sql(d)})")
        ctes.append(
            f"t{d}_1 AS (SELECT vec_id FROM t{d}"
            " ORDER BY dot DESC, vec_id LIMIT 1)"
        )
        selects.append(
            f"""SELECT CAST({d} AS INT) AS trunc_dim,
               round(CAST((SELECT count(*) FROM t{d}
                           JOIN ex ON t{d}.vec_id = ex.vec_id) AS DOUBLE)
                     / {MRL_TOPK}, 6) AS recall_at_10,
               CAST(CASE WHEN (SELECT vec_id FROM t{d}_1)
                              = (SELECT vec_id FROM ex1)
                    THEN 1 ELSE 0 END AS INT) AS top1_match"""
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


@query(
    "mrl_truncation_eval",
    oracle=_mrl_oracle(),
    doc=f"MATRYOSHKA TRUNCATION EVAL: retrieval quality of prefix-"
    f"truncated embeddings (d = {', '.join(map(str, MRL_DIMS))}) vs the "
    f"exact full-dim top-{MRL_TOPK} for the standard probe query "
    "(vec_id 0) — recall@10 + top-1 survival per truncation, the "
    "measurement adaptive retrieval needs before serving short prefixes. "
    "Every top-k is a TakeOrderedAndProject (per-partition heap, k-row "
    "driver merge — never a global sort); the recall joins and top-1 "
    "comparisons run on <= 10-row sides by construction; a prefix dot "
    "fold is strictly cheaper than the full-dim one. Left-associated "
    "chains keep both engines' scores bit-identical, so the rankings "
    "and therefore the metrics match exactly.",
    bench=True,
)
def mrl_truncation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from seisdb_spark.functions.vectors import dot_chain_col

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )

    def topk(d: int) -> DataFrame:
        scored = emb.crossJoin(F.broadcast(q)).select(
            "vec_id", dot_chain_col("embedding", "q_emb", dim=d).alias("dot")
        )
        return scored.orderBy(F.col("dot").desc(), "vec_id").limit(MRL_TOPK)

    ex = topk(EMBEDDING_DIM)
    ex1 = (
        ex.orderBy(F.col("dot").desc(), "vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("ex1"))
    )
    parts = []
    for d in MRL_DIMS:
        t = topk(d)
        t1 = (
            t.orderBy(F.col("dot").desc(), "vec_id")
            .limit(1)
            .select(F.col("vec_id").alias("tr1"))
        )
        rec = (
            t.select("vec_id")
            .join(ex.select("vec_id"), "vec_id")
            .agg(
                F.round(
                    F.count(F.lit(1)).cast("double") / MRL_TOPK, 6
                ).alias("recall_at_10")
            )
        )
        parts.append(
            rec.crossJoin(t1)
            .crossJoin(ex1)
            .select(
                F.lit(d).cast("int").alias("trunc_dim"),
                "recall_at_10",
                F.when(F.col("tr1") == F.col("ex1"), 1)
                .otherwise(0)
                .cast("int")
                .alias("top1_match"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- Matryoshka x PQ: prefix-subspace ADC -----------------------------------
# The natural composition of the two r8 surfaces (r8 verdict item #7):
# mrl_truncation_eval proves prefix-truncated embeddings retain retrieval
# quality, and PQ proves subspace codes serve ADC from codes alone.
# Because PQ subspaces are CONTIGUOUS dim ranges, the first m code bytes
# of the existing codes table ARE a prefix-dim index — adaptive retrieval
# can serve a short-prefix query from a prefix of the SAME codes (no
# second index, no extra storage), escalating to the full code only when
# the short list is ambiguous.  This query is that serving path: ADC over
# the first MRL_PQ_SUB subspaces only (= the first
# MRL_PQ_SUB * EMBEDDING_DIM/PQ_N_SUB dims), top-10.
MRL_PQ_SUB = 2  # first 2 of 8 subspaces = 16-dim prefix


@query(
    "mrl_pq_adc_topk",
    oracle=f"""
        WITH {_pq_adc_ctes()}
        SELECT a0.vec_id,
               round({_chain([f"a{s}.qd" for s in range(MRL_PQ_SUB)])}, 6)
                   AS adc_dist2
        FROM {" JOIN ".join(
            ["a0"]
            + [
                f"a{s} ON a{s}.vec_id = a0.vec_id"
                for s in range(1, MRL_PQ_SUB)
            ]
        )}
        ORDER BY adc_dist2, a0.vec_id
        LIMIT 10
    """,
    doc=f"MATRYOSHKA PREFIX-SUBSPACE ADC (functions/pq.py::pq_adc_topk "
    f"n_use={MRL_PQ_SUB}): approximate top-10 served from the FIRST "
    f"{MRL_PQ_SUB} code bytes of the standard PQ codes table — i.e. a "
    f"{MRL_PQ_SUB * EMBEDDING_DIM // PQ_N_SUB}-dim prefix index carved "
    "out of the existing codes at zero extra storage, the adaptive-"
    "retrieval cheap tier mrl_truncation_eval justifies. The query's "
    "distance table simply has fewer rows; the plan is the same codes "
    "scan + TakeOrderedAndProject, with per-row work cut "
    f"{PQ_N_SUB // MRL_PQ_SUB}x. Oracle reuses the PQ encode/ADC CTE "
    "stack verbatim and sums only the prefix subspace terms.",
)
def mrl_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    books = _books_from_seeds(
        _seed_vectors(spark, sf_dir, PQ_SEED_K), PQ_N_SUB
    )
    codes = pq_lib.pq_encode(emb, books)
    return pq_lib.pq_adc_topk(
        codes,
        books,
        _query_vector(spark, sf_dir),
        topk=10,
        n_use=MRL_PQ_SUB,
    )


# --- PQ retrieval-quality canary --------------------------------------------
# ADC exactness (the hash-green codec rows) is NOT retrieval quality:
# quantization loses neighbors BY DESIGN, and an index whose loss nobody
# measures is an index nobody can trust after a retrain/reindex.  This is
# retrieval_eval_recall's composed-oracle pattern applied to the two
# quantized codec paths: recall@10 + true-top1 rank/RR of pq_adc_topk and
# ivfpq_adc_topk against the EXACT ground truth.  Ground truth is the exact
# squared-L2 top-10 (not similarity_topk_dot's dot-product list): ADC
# approximates L2 distance, so an L2 ground truth measures QUANTIZATION
# loss alone — a dot-product ground truth would conflate it with metric
# mismatch.  All three lists are 10 rows: every join/window here is
# k-row-bounded, the expensive work is the already-scale-shaped
# sub-pipelines.  At 100 TB this is the nightly codec-quality canary next
# to the unquantized one.


#: Single knob for the codec-quality canary: ground-truth list length,
#: recall denominator, and the recall column's NAME all derive from it
#: (r9 advice: the three were hardcoded independently).  Must equal the
#: topk of the codec rows it scores (pq_adc_topk / ivfpq_adc_topk, both
#: default 10) — their oracles pin their own LIMITs.
RECALL_K = 10
_RECALL_COL = f"recall_at_{RECALL_K}"


def _exact_l2_topk_sql() -> str:
    """Exact squared-L2 top-RECALL_K for the standard probe (vec_id 0),
    same left-associated squared-diff chain the codec oracles use."""
    chain = _chain(
        [
            _sq(
                f"CAST(e.embedding[{i}] AS DOUBLE)",
                f"CAST(qv.qe[{i}] AS DOUBLE)",
            )
            for i in range(1, EMBEDDING_DIM + 1)
        ]
    )
    return f"""
        WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, round({chain}, 6) AS d2
        FROM embeddings e CROSS JOIN qv
        ORDER BY d2, e.vec_id
        LIMIT {RECALL_K}
    """


@query(
    "pq_recall_eval",
    oracle=None,  # composed below from the registered codec sub-oracles
    doc="PQ CODEC QUALITY EVAL: recall@10 and true-top1 rank/RR of "
    "pq_adc_topk and ivfpq_adc_topk against the EXACT squared-L2 top-10 "
    "(the metric ADC approximates — a dot-product ground truth would "
    "conflate quantization loss with metric mismatch), one row per "
    "method. Ranks re-derive from each list's own rounded adc_dist2 with "
    "its oracle's total order (dist ASC, vec_id). The oracle composes "
    "both codec CTE stacks VERBATIM as nested-WITH CTEs plus the exact-L2 "
    "chain, so the metric is checked end-to-end through encode, probe, "
    "and ADC. Lists are k-row-bounded; the eval adds no scale cost beyond "
    "its inputs. This is the nightly index-quality canary for the "
    "quantized paths, closing the gap retrieval_eval_recall left (it "
    "covers only the unquantized sign-bucket/IVF paths).",
    bench=True,
)
def pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    chain = _chain(
        [
            _sq(
                f"CAST(element_at(embedding, {i}) AS DOUBLE)",
                f"CAST(element_at(qe, {i}) AS DOUBLE)",
            )
            for i in range(1, EMBEDDING_DIM + 1)
        ]
    )
    exact = (
        emb.crossJoin(F.broadcast(qv))
        .select("vec_id", F.round(F.expr(chain), 6).alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(RECALL_K)
    )
    exw = Window.orderBy("d2", "vec_id")
    exr = exact.select("vec_id", F.row_number().over(exw).alias("er"))
    annw = Window.orderBy("adc_dist2", "vec_id")

    def _metrics(method: str, ann: DataFrame) -> DataFrame:
        annr = ann.select("vec_id", F.row_number().over(annw).alias("r"))
        j = exr.join(annr, "vec_id", "left")
        top1 = F.max(F.when(F.col("er") == 1, F.col("r")))
        agg = j.agg(
            F.count("r").cast("int").alias("hits"),
            F.round(F.count("r").cast("double") / RECALL_K, 2).alias(
                _RECALL_COL
            ),
            F.coalesce(top1, F.lit(0)).cast("int").alias("top1_rank"),
            F.round(
                F.coalesce(
                    F.lit(1.0).cast("double") / top1,
                    F.lit(0.0).cast("double"),
                ),
                6,
            ).alias("top1_rr"),
        )
        return agg.select(F.lit(method).alias("method"), "*")

    return _metrics("pq", pq_adc_topk(spark, sf_dir)).unionByName(
        _metrics("ivfpq", ivfpq_adc_topk(spark, sf_dir))
    )


def _set_pq_recall_oracle() -> None:
    from dataclasses import replace

    from seisdb_spark.queries.registry import REGISTRY

    metric = f"""
        SELECT '{{method}}' AS method,
               CAST(count(r) AS INT) AS hits,
               round(CAST(count(r) AS DOUBLE) / {RECALL_K}, 2)
                   AS {_RECALL_COL},
               CAST(COALESCE(MAX(CASE WHEN er = 1 THEN r END), 0) AS INT)
                   AS top1_rank,
               round(COALESCE(CAST(1.0 AS DOUBLE)
                                  / MAX(CASE WHEN er = 1 THEN r END),
                              CAST(0.0 AS DOUBLE)), 6) AS top1_rr
        FROM exr LEFT JOIN {{annr}} USING (vec_id)
    """
    sql = f"""
        WITH exact AS ({_exact_l2_topk_sql()}),
        pql AS ({REGISTRY["pq_adc_topk"].oracle}),
        ivfl AS ({REGISTRY["ivfpq_adc_topk"].oracle}),
        exr AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY d2, vec_id) AS er
            FROM exact
        ),
        pqr AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY adc_dist2, vec_id) AS r
            FROM pql
        ),
        ivfr AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY adc_dist2, vec_id) AS r
            FROM ivfl
        )
        {metric.format(method="pq", annr="pqr")}
        UNION ALL
        {metric.format(method="ivfpq", annr="ivfr")}
    """
    REGISTRY["pq_recall_eval"] = replace(REGISTRY["pq_recall_eval"], oracle=sql)


_set_pq_recall_oracle()


# --- refined-codebook twin (rows-only) -------------------------------------
# pq_encode_codes pins its codebooks to the deterministic SEEDS (Lloyd
# iters=0) so a relational oracle can re-derive them; this twin runs the
# actual production training path — per-subspace Lloyd refinement — and
# the same map-only encode.  Refined centroids are iterative fp means
# (not ANSI-SQL-expressible, and bitwise partitioning-dependent like any
# distributed mean — see cluster.py), so the entry is rows-only; pytest
# pins the property that matters: refinement never increases total
# quantization error versus the seed codebooks it starts from.
@query(
    "pq_refined_encode",
    oracle=None,  # iterative Lloyd training — rows-only by design
    doc=f"PQ ENCODE WITH REFINED CODEBOOKS: the production path — "
    f"per-subspace Lloyd refinement ({pq_lib.PQ_SUBSPACES} subspaces, "
    "2 iterations from the same deterministic seeds pq_encode_codes "
    "pins) followed by the identical map-only literal-codebook encode. "
    "Driver state stays k*dim doubles per subspace per iteration; the "
    "encode plan is byte-identical in shape to the oracle-checked row. "
    "Rows-only because refined centroids are iterative distributed fp "
    "means; tests/test_vector_store.py asserts refinement lowers total "
    "quantization error vs the seed codebooks.",
)
def pq_refined_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    books = pq_lib.train_codebooks(emb, iters=2)
    return pq_lib.pq_encode(emb, books).select(
        "vec_id",
        F.array_join(F.col("codes").cast("array<string>"), "-").alias(
            "codes"
        ),
        "qerr",
    )
