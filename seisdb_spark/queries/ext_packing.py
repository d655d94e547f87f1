"""Extension surface — chunking/sharding/packing family: doc chunking,
training-shard manifest, sequence packing (heuristic + learned token
counts), token-budgeted selection, and the packing-efficiency audit.
Split out of extensions.py (round 12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from seisdb_spark.queries.registry import query
from seisdb_spark.sources.tables import load_table, spread
from seisdb_spark.queries.ext_text import BPE_TRAIN_ITERS
from seisdb_spark.queries.ext_common import (
    _hash32_sql,
)


# ---------------------------------------------------------------------------
# Training-data pipeline: chunking, sampling, filtering, skew handling
# ---------------------------------------------------------------------------
CHUNK_SIZE = 50
CHUNK_STRIDE = 40  # 10-word overlap between consecutive chunks


@query(
    "doc_chunking",
    oracle=f"""
        WITH starts AS (
            SELECT doc_id, w,
                   unnest(generate_series(1, len(w), {CHUNK_STRIDE})) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        )
        SELECT doc_id,
               CAST((i - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               len(list_slice(w, i, least(i + {CHUNK_SIZE} - 1, len(w))))
                   AS chunk_words,
               md5(array_to_string(
                   list_slice(w, i, least(i + {CHUNK_SIZE} - 1, len(w))), ' '))
                   AS chunk_hash
        FROM starts
    """,
    doc=f"Document chunking for training windows: {CHUNK_SIZE}-word chunks "
    f"every {CHUNK_STRIDE} words (overlapping), emitted by exploding a "
    "start-position sequence and slicing the token array — one narrow "
    "projection per doc, no shuffle, no Python. The md5 chunk hash is the "
    "chunk-level dedup key downstream.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = F.split(F.col("text"), " ")
    exploded = docs.select(
        "doc_id",
        w.alias("w"),
        F.explode(
            F.sequence(F.lit(1), F.size(w), F.lit(CHUNK_STRIDE))
        ).alias("i"),
    )
    chunk = F.slice(F.col("w"), F.col("i"), F.lit(CHUNK_SIZE))
    return exploded.select(
        "doc_id",
        ((F.col("i") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.size(chunk).alias("chunk_words"),
        F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_hash"),
    )


N_TRAINING_SHARDS = 16


@query(
    "training_shard_manifest",
    oracle=f"""
        SELECT shard,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(h) AS BIGINT) AS key_checksum
        FROM (
            SELECT CAST({_hash32_sql("CAST(doc_id AS VARCHAR)")}
                        % {N_TRAINING_SHARDS} AS INT) AS shard,
                   {_hash32_sql("CAST(doc_id AS VARCHAR)")} AS h
            FROM documents
        )
        GROUP BY shard
    """,
    doc=f"Deterministic training-shard assignment + audit manifest: every "
    f"doc lands in shard md5(doc_id)%{N_TRAINING_SHARDS} — a pure function "
    "of row CONTENT, so the shard layout reproduces across runs, cluster "
    "sizes, and input partitionings (repartition alone can't promise that: "
    "its assignment depends on the input split layout). The manifest row "
    "per shard (count + order-insensitive key-hash checksum) is what a "
    "training-data lineage audit stores next to the shards. The writer "
    "itself (one shuffle, per-shard sorted parquet, "
    "sources/tables.py::write_training_shards) is pytest-verified for "
    "byte-level determinism under different input layouts.",
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from seisdb_spark.sources.tables import shard_assignment, shard_manifest

    docs = spread(load_table(spark, sf_dir, "documents"))
    sharded = docs.withColumn(
        "shard", shard_assignment("doc_id", N_TRAINING_SHARDS)
    )
    return shard_manifest(sharded, "doc_id")


# --- sequence packing ----------------------------------------------------
PACK_SEQ_TOKENS = 2048  # context-window budget per packed sequence
PACK_N_SHARDS = N_TRAINING_SHARDS

_BPE_TOKENS_SQL = (
    "CAST(greatest(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')),"
    " ceil(octet_length(encode(text)) / 4.0)) AS BIGINT)"
)


BUDGET_TOKENS_PER_LANG = 8192  # target tokens per language in the mixture
BUDGET_N_SHARDS = 4  # budget split across content-hash shards (see doc)
_BUDGET_PER_SHARD = BUDGET_TOKENS_PER_LANG // BUDGET_N_SHARDS


def _bpe_tokens_col() -> F.Column:
    """The Spark twin of ``_BPE_TOKENS_SQL``: BPE-ish token estimate =
    max(regex word/punct count, utf-8 bytes / 4)."""
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\w+|[^\w\s]"), 0))
    sub = F.ceil(F.octet_length("text") / 4.0)
    return F.greatest(toks.cast("long"), sub.cast("long"))


def learned_token_counts(docs: DataFrame, merges: list[dict]) -> DataFrame:
    """Per-doc token counts from a TRAINED merge list — the real-
    tokenizer replacement for the ``_bpe_tokens_col`` regex estimate,
    shaped for scale: the DISTINCT word table is segmented ONCE
    (``segment_words_auto``: expression form under its merge-count
    bound, the Arrow kernel past it — Zipf makes the vocab orders of
    magnitude smaller than the corpus), per-word counts join back to
    the corpus word stream (AQE broadcasts the small vocab), and sum
    per doc.  Returns ``(doc_id, n_tokens)`` — docs whose text splits
    to no words are absent (callers coalesce to 0).  Feed the result
    to ``packing_assignment`` / ``budgeted_selection`` as
    ``token_counts``."""
    from seisdb_spark.functions import bpe as bpe_lib

    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") >= 1)
    vocab_tok = bpe_lib.segment_words_auto(
        tok.select("word").distinct(), merges
    ).select("word", F.col("n_tokens").alias("_wtok"))
    return (
        tok.join(vocab_tok, "word")
        .groupBy("doc_id")
        .agg(F.sum("_wtok").cast("long").alias("n_tokens"))
    )


def _with_token_counts(docs: DataFrame, token_counts: DataFrame | None) -> DataFrame:
    """Attach ``n_tokens``: the regex ESTIMATE when ``token_counts`` is
    None (row-local, zero extra shuffle), else a learned per-doc count
    table ``(doc_id, n_tokens)`` left-joined on doc_id (absent docs —
    no words — count 0).  The join keys on doc_id so AQE broadcasts
    whichever side is small; at training-set scale both sides are the
    same corpus and it is one co-partitioned shuffle."""
    if token_counts is None:
        return docs.withColumn("n_tokens", _bpe_tokens_col())
    tc = token_counts.select(
        "doc_id", F.col("n_tokens").cast("long").alias("_n_tokens")
    )
    return (
        docs.join(tc, "doc_id", "left")
        .withColumn(
            "n_tokens", F.coalesce(F.col("_n_tokens"), F.lit(0).cast("long"))
        )
        .drop("_n_tokens")
    )


def packing_assignment(
    docs: DataFrame,
    n_shards: int = PACK_N_SHARDS,
    seq_tokens: int = PACK_SEQ_TOKENS,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence-packing columns over any (doc_id, text)
    relation: adds ``n_tokens``, ``shard`` (text-hash mod n_shards),
    ``seq_in_shard``, ``offset_in_seq``; all input columns preserved.
    One hash Exchange on ``shard``, per-shard running-sum window, no
    global sort.  ``token_counts`` (doc_id, n_tokens) switches the
    budgeting from the regex estimate to real learned-tokenizer counts
    (``learned_token_counts``); the packing recurrence is identical.
    Shared by the ``sequence_packing`` driver query and
    ``build_training_set(pack=True)``."""
    from pyspark.sql import Window

    from seisdb_spark.sources.tables import content_hash32

    h = content_hash32("text")
    t = (
        _with_token_counts(docs, token_counts)
        .withColumn("shard", (h % n_shards).cast("int"))
        .withColumn("_h", h)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        t.withColumn("seq_in_shard", F.floor(start / seq_tokens))
        .withColumn("offset_in_seq", start % seq_tokens)
        .drop("_h")
    )


def budgeted_selection(
    docs: DataFrame,
    budget_per_shard: int = _BUDGET_PER_SHARD,
    n_shards: int = BUDGET_N_SHARDS,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Greedy per-(lang, shard) token-budget prefix over any (doc_id, lang,
    text) relation: adds ``n_tokens``, ``shard``, ``budget_used_before``
    and keeps only rows whose prior running total is under the shard
    budget; all input columns preserved.  Docs are ordered by md5 text
    digest (id-reassignment invariant).  ``token_counts`` (doc_id,
    n_tokens) switches budgeting from the regex estimate to learned-
    tokenizer counts (``learned_token_counts``).  Shared by the
    ``budgeted_sample_per_lang`` driver query and
    ``build_training_set(sample='budgeted')``."""
    from pyspark.sql import Window

    from seisdb_spark.sources.tables import content_hash32

    h = content_hash32("text")
    t = (
        _with_token_counts(docs, token_counts)
        .withColumn("shard", (h % n_shards).cast("int"))
        .withColumn("_h", h)
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    used = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        t.withColumn("budget_used_before", used)
        .filter(F.col("budget_used_before") < budget_per_shard)
        .drop("_h")
    )


@query(
    "sequence_packing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   {_BPE_TOKENS_SQL} AS n_tokens,
                   {_hash32_sql("text")} % {PACK_N_SHARDS}
                       AS shard,
                   {_hash32_sql("text")} AS h
            FROM documents
        ),
        packed AS (
            SELECT doc_id, shard, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS start_tok
            FROM toks
        )
        SELECT doc_id, CAST(shard AS INT) AS shard, n_tokens,
               CAST(COALESCE(start_tok, 0) // {PACK_SEQ_TOKENS} AS BIGINT)
                   AS seq_in_shard,
               CAST(COALESCE(start_tok, 0) % {PACK_SEQ_TOKENS} AS BIGINT)
                   AS offset_in_seq
        FROM packed
    """,
    doc=f"SEQUENCE PACKING for training: concat-then-chunk assignment of "
    f"each doc to its {PACK_SEQ_TOKENS}-token context window. Docs are "
    f"ordered deterministically (md5 TEXT digest) WITHIN {PACK_N_SHARDS} "
    "text-hash shards, token counts cumulated by a window function, and "
    "each doc's window id + offset derived from its running start. "
    "Per-shard packing is the 100 TB shape: no global sort — one shuffle "
    "partitioned by shard, each shard's running sum independent, shard "
    "count scaled to the cluster. The assignment is a pure function of "
    "CONTENT — hashing the text, not the doc id, so a re-crawled corpus "
    "with reassigned ids packs identically (id ties broken by doc_id) — "
    "and docs straddling a boundary split across windows exactly as a "
    "training dataloader concatenating shard streams would split them.",
    bench=True,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return packing_assignment(docs).select(
        "doc_id", "shard", "n_tokens", "seq_in_shard", "offset_in_seq"
    )


# --- token-budgeted sampling ----------------------------------------------
@query(
    "budgeted_sample_per_lang",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   {_BPE_TOKENS_SQL} AS n_tokens,
                   {_hash32_sql("text")} % {BUDGET_N_SHARDS}
                       AS shard,
                   {_hash32_sql("text")} AS h
            FROM documents
        ),
        running AS (
            SELECT doc_id, lang, n_tokens, shard,
                   COALESCE(sum(n_tokens) OVER (
                       PARTITION BY lang, shard ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS budget_used_before
            FROM toks
        )
        SELECT doc_id, lang, n_tokens,
               CAST(shard AS INT) AS shard,
               CAST(budget_used_before AS BIGINT) AS budget_used_before
        FROM running
        WHERE budget_used_before < {_BUDGET_PER_SHARD}
    """,
    doc=f"TOKEN-BUDGETED mixture sampling: greedily keep docs per language "
    f"until a {BUDGET_TOKENS_PER_LANG}-token budget is filled (the 'train "
    "on N tokens of each language/source' curation op). The selection is a "
    "pure function of CONTENT — docs ordered by md5 TEXT digest (not the "
    "doc id, so a re-crawled corpus with reassigned ids selects the same "
    "texts; ties broken by doc_id), running token "
    f"sums per (lang, shard), keep while the shard's {_BUDGET_PER_SHARD}-"
    f"token slice (budget/{BUDGET_N_SHARDS}) is unfilled. Sharding is the "
    "100 TB shape — a single per-lang partition would put the dominant "
    "language's entire corpus through one task; splitting the budget "
    "across content-hash shards keeps the same deterministic outcome "
    "while every shard runs independently (one shuffle, no skew pile-up, "
    "shard count scaled to the cluster).",
    bench=True,
)
def budgeted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return budgeted_selection(docs).select(
        "doc_id", "lang", "n_tokens", "shard", "budget_used_before"
    )


@query(
    "sequence_packing_learned",
    oracle=None,  # trained merges are a data-dependent fixpoint — rows-only
    doc=f"SEQUENCE PACKING ON LEARNED COUNTS: the same concat-then-chunk "
    f"assignment as sequence_packing, but budgeted with REAL tokenizer "
    "counts — train the BPE merges (functions/bpe.py), derive per-doc "
    "counts via learned_token_counts (segment the DISTINCT vocab once, "
    "join counts back to the corpus word stream), and feed them to "
    "packing_assignment as token_counts. This is the production form: "
    "the regex estimate mis-budgets exactly when compression matters "
    "(repetitive text packs ~2x denser than the estimate predicts — "
    "pinned by the planted-divergence pytest). Rows-only: the merge "
    "sequence is data-dependent; the packing invariants and the "
    "estimate-vs-learned assignment divergence are pytest-pinned "
    "(tests/test_learned_packing.py). Same scale shape as the estimate "
    "path — one hash Exchange on shard, per-shard running-sum window — "
    "plus the vocab-sized tokenize join.",
)
def sequence_packing_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from seisdb_spark.functions import bpe as bpe_lib

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") >= 1)
    wfreq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("wn"))
    merges = bpe_lib.train_merges(wfreq, iters=BPE_TRAIN_ITERS)
    tc = learned_token_counts(docs, merges)
    return packing_assignment(docs, token_counts=tc).select(
        "doc_id", "shard", "n_tokens", "seq_in_shard", "offset_in_seq"
    )


@query(
    "packing_efficiency",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   {_BPE_TOKENS_SQL} AS n_tokens,
                   {_hash32_sql("text")} % {PACK_N_SHARDS} AS shard
            FROM documents
        ),
        per_shard AS (
            SELECT CAST(shard AS INT) AS shard,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            FROM toks GROUP BY shard
        )
        SELECT shard, n_docs, total_tokens,
               CAST((total_tokens + {PACK_SEQ_TOKENS - 1})
                    // {PACK_SEQ_TOKENS} AS BIGINT) AS n_seqs,
               CAST((total_tokens + {PACK_SEQ_TOKENS - 1})
                    // {PACK_SEQ_TOKENS} * {PACK_SEQ_TOKENS} - total_tokens
                    AS BIGINT) AS waste_tokens,
               round(CAST(total_tokens AS DOUBLE)
                     / ((total_tokens + {PACK_SEQ_TOKENS - 1})
                        // {PACK_SEQ_TOKENS} * {PACK_SEQ_TOKENS}), 6)
                   AS fill_rate
        FROM per_shard
    """,
    doc="Packing-efficiency audit for the sequence_packing layout: per "
    "shard, document count, total tokens, packed sequence count, padding "
    "waste, and fill rate. Under concat-then-chunk the ONLY slack is each "
    "shard's final partially-filled window — n_seqs is exactly "
    f"ceil(total/{PACK_SEQ_TOKENS}) — so the whole audit reduces to ONE "
    "map-side-combined groupBy(shard) aggregate of exact integers (no "
    "window function, no per-sequence pass); fill_rate is a single fp "
    "division. This is the metric that justifies packing over per-doc "
    "padding: compare against padding waste = sum(window - n_tokens % "
    "window) per doc. Scale: one shuffle of shard-count rows.",
)
def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from seisdb_spark.sources.tables import content_hash32

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        _bpe_tokens_col().alias("n_tokens"),
        (content_hash32("text") % PACK_N_SHARDS).cast("int").alias("shard"),
    )
    per = t.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    n_seqs = F.floor(
        (F.col("total_tokens") + (PACK_SEQ_TOKENS - 1)) / PACK_SEQ_TOKENS
    ).cast("bigint")
    return per.select(
        "shard",
        "n_docs",
        "total_tokens",
        n_seqs.alias("n_seqs"),
        (n_seqs * PACK_SEQ_TOKENS - F.col("total_tokens")).alias("waste_tokens"),
        F.round(
            F.col("total_tokens").cast("double") / (n_seqs * PACK_SEQ_TOKENS),
            6,
        ).alias("fill_rate"),
    )
