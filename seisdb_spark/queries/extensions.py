"""Extension surface (SURVEY §2.11): the LLM-training-data-pipeline operators
a 100 TB engine needs — dedup (exact / near-dup / MinHash-LSH), similarity
search over embeddings, text analysis, and binary-column fingerprinting —
each as an oracle-checkable query over the driver's documents/embeddings
tables.

Portability discipline for the oracles:
  * hashing uses md5/sha256 (identical hex output in Spark and DuckDB) —
    never engine-native hash();
  * dot products are generated as an explicit left-associated term chain so
    both engines accumulate in the same IEEE-754 order (bit-identical);
  * Jaccard is computed relationally (token join + integer counts), never
    via engine-specific list set-ops.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seisdb_spark.queries.registry import query
from seisdb_spark.sources.tables import load_table

EMBEDDING_DIM = 64
N_MINHASH = 4
STOPWORD_PATTERN = r"\b(the|a|of|and|to)\b"


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------
def _dot_chain_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    """Left-associated dot-product term chain (deterministic fp order)."""
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1)
    )


def _dot_chain_col(a: str, b: str, dim: int = EMBEDDING_DIM):
    terms = [
        F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        for i in range(1, dim + 1)
    ]
    return reduce(add, terms)


def _tokens(df: DataFrame) -> DataFrame:
    """Distinct (doc_id, lang, source, word) token set per document."""
    return (
        df.select(
            "doc_id",
            "lang",
            "source",
            F.explode(F.split(F.col("text"), " ")).alias("word"),
        ).distinct()
    )


_TOK_CTE = """
    tok AS (
        SELECT DISTINCT doc_id, lang, source, word FROM (
            SELECT doc_id, lang, source,
                   unnest(string_split(text, ' ')) AS word
            FROM documents
        )
    )
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
@query(
    "text_stats",
    oracle="""
        SELECT doc_id, lang,
               length(text) AS n_chars_calc,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_words,
               round(CAST(length(replace(text, ' ', '')) AS DOUBLE) /
                     (length(text) - length(replace(text, ' ', '')) + 1), 4)
                   AS avg_word_len
        FROM documents
    """,
    doc="Per-document text statistics (char count, whitespace token count, "
    "mean word length) — all JVM-side expressions, no Python boundary.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nosp = F.length(F.translate(F.col("text"), " ", ""))
    n_words = F.length("text") - nosp + 1
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_calc"),
        n_words.alias("n_words"),
        F.round(nosp.cast("double") / n_words, 4).alias("avg_word_len"),
    )


@query(
    "token_count_by_lang",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
                   AS total_tokens,
               round(avg(length(text) - length(replace(text, ' ', '')) + 1), 4)
                   AS avg_tokens
        FROM documents
        GROUP BY lang
    """,
    doc="Corpus-level token accounting per language — the budget query of a "
    "training-data pipeline. Single shuffle, partial aggregation map-side.",
    bench=True,
)
def token_count_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.length("text") - F.length(F.translate(F.col("text"), " ", "")) + 1
    return (
        docs.select("lang", n_words.alias("nw"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nw").alias("total_tokens"),
            F.round(F.avg("nw"), 4).alias("avg_tokens"),
        )
    )


@query(
    "text_quality_score",
    oracle=f"""
        SELECT doc_id,
               round(CAST(len(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS DOUBLE)
                     / (length(text) - length(replace(text, ' ', '')) + 1), 4)
                   AS stopword_ratio,
               CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
                         BETWEEN 20 AND 1000
                    THEN 1 ELSE 0 END AS length_ok
        FROM documents
    """,
    doc="Quality scoring: stopword-hit ratio (an n-gram language/quality "
    "heuristic) + length gate. regexp_extract_all counts non-overlapping "
    "matches identically in Java regex and RE2.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.length("text") - F.length(F.translate(F.col("text"), " ", "")) + 1
    hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(STOPWORD_PATTERN), 0))
    return docs.select(
        "doc_id",
        F.round(hits.cast("double") / n_words, 4).alias("stopword_ratio"),
        F.when(n_words.between(20, 1000), 1).otherwise(0).alias("length_ok"),
    )


@query(
    "doc_fingerprint",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS digest,
               substr(md5(text), 1, 8) AS short_fp
        FROM documents
    """,
    doc="Document fingerprinting over the binary (multimodal) representation "
    "of the payload: utf-8 byte length + sha256 content digest + md5 short "
    "fingerprint. The BinaryType + digest pattern is the multimodal-column "
    "backbone (opaque bytes, typed metadata).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    as_bytes = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.sha2(as_bytes, 256).alias("digest"),
        F.substring(F.md5(as_bytes), 1, 8).alias("short_fp"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
        SELECT md5(text) AS content_hash,
               min(doc_id) AS keeper_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on content digest, keep the minimum "
    "doc_id per hash (SURVEY §2.11). One shuffle on a uniformly-distributed "
    "key — the 100 TB-safe dedup plan.",
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "minhash_signatures",
    oracle=f"""
        WITH {_TOK_CTE}
        SELECT doc_id,
               {", ".join(f"min(md5('s{i}:' || word)) AS mh{i}" for i in range(N_MINHASH))}
        FROM tok
        GROUP BY doc_id
    """,
    doc="MinHash signatures: per document, the minimum of a salted md5 over "
    "its distinct token set, for 4 hash seeds. min-over-strings is engine-"
    "portable; explode + groupBy is one shuffle.",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _tokens(load_table(spark, sf_dir, "documents"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}:"), F.col("word")).cast("binary"))).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


@query(
    "minhash_lsh_candidates",
    oracle=f"""
        WITH {_TOK_CTE},
        sig AS (
            SELECT doc_id,
                   {", ".join(f"min(md5('s{i}:' || word)) AS mh{i}" for i in range(N_MINHASH))}
            FROM tok
            GROUP BY doc_id
        )
        SELECT DISTINCT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sig a JOIN sig b
              ON a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.doc_id < b.doc_id
            UNION ALL
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sig a JOIN sig b
              ON a.mh2 = b.mh2 AND a.mh3 = b.mh3 AND a.doc_id < b.doc_id
        )
    """,
    doc="MinHash-LSH candidate pairs: 2 bands x 2 rows; documents colliding "
    "on any full band become candidates (shingle->minhash->band->bucket-join, "
    "SURVEY §2.11). The band equi-join is the scale path: no pairwise "
    "comparison ever materializes outside a bucket.",
    bench=True,
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _tokens(load_table(spark, sf_dir, "documents"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}:"), F.col("word")).cast("binary"))).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]
    sig = tok.groupBy("doc_id").agg(*aggs)
    a = sig.alias("a")
    b = sig.alias("b")

    def band(c1: str, c2: str) -> DataFrame:
        return (
            a.join(
                b,
                (F.col(f"a.{c1}") == F.col(f"b.{c1}"))
                & (F.col(f"a.{c2}") == F.col(f"b.{c2}"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        )

    return band("mh0", "mh1").unionByName(band("mh2", "mh3")).distinct()


@query(
    "dedup_jaccard_pairs",
    oracle=f"""
        WITH {_TOK_CTE},
        cnt AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
        pair AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
            FROM tok a JOIN tok b
              ON a.word = b.word
             AND a.lang = b.lang AND a.source = b.source
             AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               round(CAST(shared AS DOUBLE) / (ca.n_tok + cb.n_tok - shared), 4)
                   AS jaccard
        FROM pair
        JOIN cnt ca ON pair.doc_a = ca.doc_id
        JOIN cnt cb ON pair.doc_b = cb.doc_id
        WHERE CAST(shared AS DOUBLE) / (ca.n_tok + cb.n_tok - shared) >= 0.5
    """,
    doc="n-gram (unigram) Jaccard near-dup detection, computed relationally: "
    "distinct-token join -> shared counts -> |A∩B| / (|A|+|B|-|A∩B|). "
    "Blocked by (lang, source) so candidate pairs stay bounded; at 100 TB "
    "the blocking key is the LSH band from minhash_lsh_candidates.",
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _tokens(load_table(spark, sf_dir, "documents"))
    cnt = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a = tok.alias("a")
    b = tok.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("shared").cast("double") / (
        F.col("ca.n_tok") + F.col("cb.n_tok") - F.col("shared")
    )
    return (
        pair.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------
@query(
    "similarity_topk_dot",
    oracle=f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT e.vec_id,
                   {_dot_chain_sql("e.embedding", "q.q_emb")} AS dot
            FROM embeddings e CROSS JOIN q
        )
        SELECT vec_id, round(dot, 6) AS score, rk FROM (
            SELECT vec_id, dot,
                   row_number() OVER (ORDER BY dot DESC, vec_id) AS rk
            FROM scored
        )
        WHERE rk <= 10
    """,
    doc="Brute-force top-k similarity search: dot product of every vector "
    "against the query (vec_id=0), explicit left-associated fp chain so both "
    "engines accumulate identically. The query side is a broadcast of one "
    "row; at 100 TB the scan streams with no shuffle and top-k is a "
    "per-partition heap + single reduce (row_number here for oracle parity).",
    bench=True,
)
def similarity_topk_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id", _dot_chain_col("embedding", "q_emb").alias("dot")
    )
    w = Window.orderBy(F.col("dot").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("vec_id", F.round("dot", 6).alias("score"), "rk")
    )


@query(
    "embedding_norms_by_label",
    oracle=f"""
        SELECT label,
               count(*) AS n_vectors,
               round(avg(sqrt({_dot_chain_sql("embedding", "embedding")})), 4)
                   AS avg_l2_norm
        FROM embeddings
        GROUP BY label
    """,
    doc="Vector-column aggregate: mean L2 norm per label. Per-row norm is an "
    "exact fp chain; the group avg is rounded (Spark's partial-agg order is "
    "non-deterministic at the 1e-13 level).",
)
def embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(_dot_chain_col("embedding", "embedding"))
    return (
        emb.select("label", norm.alias("l2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("l2"), 4).alias("avg_l2_norm"),
        )
    )


@query(
    "knn_cosine_labeled",
    oracle=f"""
        WITH norms AS (
            SELECT vec_id, label, embedding,
                   sqrt({_dot_chain_sql("embedding", "embedding")}) AS nrm
            FROM embeddings
        ),
        q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM norms WHERE vec_id = 1),
        scored AS (
            SELECT n.vec_id, n.label,
                   ({_dot_chain_sql("n.embedding", "q.q_emb")}) / (n.nrm * q.q_nrm)
                       AS cosine
            FROM norms n CROSS JOIN q
            WHERE n.vec_id <> 1
        )
        SELECT vec_id, label, round(cosine, 6) AS cosine, rk FROM (
            SELECT vec_id, label, cosine,
                   row_number() OVER (ORDER BY cosine DESC, vec_id) AS rk
            FROM scored
        )
        WHERE rk <= 5
    """,
    doc="k-NN by cosine similarity with the query's own row excluded — the "
    "label column makes this the majority-vote classification primitive. "
    "Same broadcast + streaming-scan shape as similarity_topk_dot.",
)
def knn_cosine_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "vec_id", "label", "embedding",
        F.sqrt(_dot_chain_col("embedding", "embedding")).alias("nrm"),
    )
    q = (
        norms.filter(F.col("vec_id") == 1)
        .select(F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm"))
    )
    scored = (
        norms.filter(F.col("vec_id") != 1)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            (_dot_chain_col("embedding", "q_emb") / (F.col("nrm") * F.col("q_nrm"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("vec_id", "label", F.round("cosine", 6).alias("cosine"), "rk")
    )
