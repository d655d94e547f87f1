"""Extension surface — mergeable-sketch family: approx-quantile gate, HLL
rollup, heavy-hitters (approx_top_k) gate, count-min gate, KMV bottom-k
set operations, and the relational histogram quantile sketch.  Split out
of extensions.py (round 12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from seisdb_spark.queries.registry import query
from seisdb_spark.sources.tables import load_table, spread


@query(
    "approx_quantile_gate",
    oracle="""
        WITH b AS (
            SELECT quantile_cont(l_extendedprice, 0.25) AS q25,
                   quantile_cont(l_extendedprice, 0.50) AS q50,
                   quantile_cont(l_extendedprice, 0.75) AS q75
            FROM lineitem
        )
        SELECT round(q25, 2) AS exact_q25,
               round(q50, 2) AS exact_q50,
               round(q75, 2) AS exact_q75,
               1 AS q25_within, 1 AS q50_within, 1 AS q75_within
        FROM b
    """,
    doc="Quantile sketch with a HARD gate (same pattern as "
    "approx_distinct_parts): percentile_approx (Greenwald-Khanna-style, "
    "rank error <= 1/accuracy) must land between the exact quantiles at "
    "rank +-5%; Spark returns the exact values plus 0/1 in-bound flags, "
    "the oracle the exact values plus literal 1. At 100 TB the sketch "
    "merges map-side in constant memory; the exact percentile is the "
    "test-scale referee, not the production path.",
)
def approx_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    c = F.col("l_extendedprice")
    agg = li.agg(
        F.percentile(c, F.lit(0.25)).alias("q25"),
        F.percentile(c, F.lit(0.50)).alias("q50"),
        F.percentile(c, F.lit(0.75)).alias("q75"),
        F.percentile(c, F.lit(0.20)).alias("q25_lo"),
        F.percentile(c, F.lit(0.30)).alias("q25_hi"),
        F.percentile(c, F.lit(0.45)).alias("q50_lo"),
        F.percentile(c, F.lit(0.55)).alias("q50_hi"),
        F.percentile(c, F.lit(0.70)).alias("q75_lo"),
        F.percentile(c, F.lit(0.80)).alias("q75_hi"),
        F.percentile_approx(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(100)).alias("ap"),
    )
    within = [
        F.col("ap")[i]
        .between(F.col(f"q{q}_lo"), F.col(f"q{q}_hi"))
        .cast("int")
        .alias(f"q{q}_within")
        for i, q in enumerate((25, 50, 75))
    ]
    return agg.select(
        F.round("q25", 2).alias("exact_q25"),
        F.round("q50", 2).alias("exact_q50"),
        F.round("q75", 2).alias("exact_q75"),
        *within,
    )


# --- mergeable HLL sketch rollup -------------------------------------------
# The capability approx_count_distinct does NOT give you: STORED partial
# sketches that merge later.  At 100 TB, corpus-wide distinct questions
# ("how many distinct tokens per language?") are answered from a tiny
# per-(shard/day/source) sketch TABLE — raw data is scanned once when the
# shard lands, every later rollup is a merge of kilobyte sketches.  Spark
# 3.5+ ships the Apache DataSketches HLL family as SQL aggregates
# (hll_sketch_agg / hll_union_agg / hll_sketch_estimate), which is the
# engine-native way to express it.
HLL_LGK = 12  # DataSketches lgConfigK: ~0.8% relative standard error


@query(
    "hll_sketch_rollup",
    oracle="""
        SELECT lang,
               CAST(count(DISTINCT source) AS INT) AS n_sources,
               CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct,
               1 AS merged_within
        FROM (
            SELECT lang, source, unnest(string_split(text, ' ')) AS w
            FROM documents
        )
        WHERE w <> ''
        GROUP BY lang
    """,
    doc=f"MERGEABLE SKETCH ROLLUP with a HARD gate (the "
    "approx_quantile_gate pattern): per-(lang, source) DataSketches HLL "
    f"sketches (lgK={HLL_LGK}) of distinct words — the stored-partials "
    "stage a production pipeline persists per shard — are union-merged "
    "per lang and the merged estimate must land within +-5% of the "
    "exact distinct count (far outside HLL's ~0.8% RSE at this lgK; "
    "DataSketches is exact below its sparse threshold, so driver-scale "
    "corpora gate at equality). Spark emits the exact counts plus 0/1 "
    "flags, the oracle the exact counts plus literal 1. At 100 TB the "
    "raw scan happens ONCE per arriving shard; every rollup after that "
    "merges kilobyte sketches — the scan-once-merge-forever shape "
    "approx_count_distinct alone cannot express.",
    bench=True,
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "lang", "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    partials = tok.groupBy("lang", "source").agg(
        F.expr(f"hll_sketch_agg(w, {HLL_LGK})").alias("sk")
    )
    merged = partials.groupBy("lang").agg(
        F.count(F.lit(1)).cast("int").alias("n_sources"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
    )
    exact = tok.groupBy("lang").agg(
        F.countDistinct("w").alias("exact_distinct")
    )
    within = (
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * 0.05
        )
        .cast("int")
        .alias("merged_within")
    )
    return exact.join(merged, "lang").select(
        "lang", "n_sources", "exact_distinct", within
    )


# --- frequent-items (heavy hitters) sketch gate ----------------------------
# The third sketch class next to quantiles (approx_quantile_gate) and
# distinct counts (hll_sketch_rollup): WHICH items dominate, estimated in
# one pass with bounded state.  Spark 4 ships approx_top_k (a
# frequent-items sketch aggregate whose per-partition state is
# maxItemsTracked entries, merged map-side); the exact top-K is the
# test-scale referee, the sketch is the production path — at 100 TB the
# exact word count is a full vocab shuffle, the sketch is one constant-
# state pass.
HH_TOPK = 10
#: Hard capacity ceiling = Spark's own limit.  approx_top_k does NOT
#: degrade gracefully past maxItemsTracked: moderately past capacity
#: (~3x) counts INFLATE (eviction floors), and far past (~5x) it
#: returns an EMPTY array (found by the x1000 scale harness: 31k words
#: vs a fixed 8192 produced zero rows, which AQE propagated into null
#: gate flags; both modes pinned in tests/test_extensions.py::
#: test_spark_approx_top_k_overflow_modes).  Capacity is therefore
#: sized at plan time from a cheap cardinality estimate and overflow
#: past this ceiling raises loudly instead of silently zeroing the
#: gate.  The ceiling equals Spark 4.1's internal
#: MAX_ITEMS_TRACKED_LIMIT = 1,000,000 (ApproxTopK.scala) — a larger
#: local ceiling would be unreachable: Spark itself rejects
#: maxItemsTracked above it, so our informative ValueError must fire
#: FIRST (r10 ADVICE item; the limit is not a power of two and Spark
#: accepts any capacity <= it, so the doubling search clamps to it).
#: The sketch path is for BOUNDED-cardinality columns (the classic
#: heavy-hitters use case: categories, domains, langs, source tags,
#: capped vocabs); an unbounded vocabulary keeps the exact vocab-key
#: shuffle, which is already corpus-cheap.
HH_TRACKED_MAX = 1_000_000


def hh_tracked_capacity(est_nd: int) -> int:
    """approx_top_k capacity for an estimated ``est_nd`` distinct items:
    30% headroom + 16, power-of-two doubling from 1024, clamped to
    Spark's hard maxItemsTracked limit (HH_TRACKED_MAX = 1,000,000 —
    not itself a power of two; Spark accepts any capacity <= it).
    Raises when even the clamped capacity cannot cover the estimate —
    BEFORE Spark's opaque approxTopKMaxItemsTrackedExceedsLimit error
    and before the sketch silently corrupts (inflated counts, then
    empty).  This is also the validation point for CALLER-SUPPLIED
    cardinalities: production pipelines feed ``est_nd`` from a
    persisted stat (e.g. one KB-sized row of the HLL sketch table
    ``hll_sketch_rollup`` maintains) instead of scanning the corpus."""
    need = est_nd * 13 // 10 + 16
    if need > HH_TRACKED_MAX:
        raise ValueError(
            f"hh_tracked_capacity: ~{est_nd} distinct items needs sketch "
            f"capacity {need} > Spark's maxItemsTracked limit "
            f"{HH_TRACKED_MAX} — approx_top_k rejects larger capacities "
            "and silently corrupts past smaller ones; use the exact "
            "vocab-key path for unbounded-cardinality columns"
        )
    tracked = 1024
    while tracked < need:
        tracked <<= 1
    return min(tracked, HH_TRACKED_MAX)


def hh_exact_topk(wc: DataFrame) -> DataFrame:
    """The exact top-K referee (ranked, count ties broken by word) from a
    materialized vocab-count table — shared by the batch gate and the
    streaming rollup so the ranking convention can never fork."""
    sel = wc.orderBy(F.col("n").desc(), "w").limit(HH_TOPK)
    rank_w = Window.orderBy(F.col("n").desc(), "w")
    return sel.select(
        F.row_number().over(rank_w).cast("int").alias("rank"),
        F.col("w").alias("word"),
        F.col("n").alias("exact_n"),
    )


def hh_gate_report(exact: DataFrame, sketch: DataFrame) -> DataFrame:
    """Membership + +-5% estimate gate of a sketch's FULL tracked list
    against the exact top-K — shared by both twins (they share one
    oracle).  The tracked list is semi-joined down to the K exact words
    BEFORE broadcasting (the r10 ADVICE item: the broadcast side is k
    rows, never the capacity-sized list)."""
    sketch_k = sketch.join(F.broadcast(exact.select("word")), "word", "semi")
    gated = exact.join(F.broadcast(sketch_k), "word", "left")
    return gated.select(
        "rank",
        "word",
        "exact_n",
        F.col("est").isNotNull().cast("int").alias("in_sketch"),
        (
            F.abs(
                F.coalesce(F.col("est"), F.lit(0)).cast("double")
                - F.col("exact_n")
            )
            <= F.col("exact_n") * 0.05
        )
        .cast("int")
        .alias("est_within"),
    )


@query(
    "heavy_hitters_gate",
    oracle=f"""
        WITH wc AS (
            SELECT w, CAST(count(*) AS BIGINT) AS n
            FROM (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents
            )
            WHERE w <> ''
            GROUP BY w
        ),
        sel AS (
            SELECT w, n FROM wc ORDER BY n DESC, w LIMIT {HH_TOPK}
        )
        SELECT CAST(row_number() OVER (ORDER BY n DESC, w) AS INT) AS rank,
               w AS word, n AS exact_n,
               1 AS in_sketch, 1 AS est_within
        FROM sel
    """,
    doc=f"HEAVY HITTERS with a HARD gate (the approx_quantile_gate "
    f"pattern): the exact top-{HH_TOPK} words (one vocab-key combiner "
    "shuffle + TakeOrderedAndProject, ties broken by word) each checked "
    "against Spark's approx_top_k sketch, whose capacity is sized at "
    "plan time with 30% headroom from a KB-sized HLL sketch over the "
    "materialized vocab (the persisted-stat shape: production reads "
    "the cardinality from the sketch table hll_sketch_rollup "
    "maintains, validated by hh_tracked_capacity) — NECESSARY, not an "
    "optimization: past maxItemsTracked approx_top_k first inflates "
    "counts (eviction floors) and then returns EMPTY (caught by the "
    "x1000 harness at a fixed 8192 vs 31k words), so a fixed capacity "
    "silently corrupts the gate at scale; past Spark's own 1,000,000 "
    "limit the query raises loudly instead. The corpus is scanned "
    "exactly TWICE (exact vocab pass + sketch pass; the r10 "
    "approx_count_distinct third scan is gone — sizing reads the "
    "localCheckpointed Zipf-small vocab). Every exact heavy hitter "
    "must appear in the sketch with its estimate within +-5% of "
    "truth. Spark emits the exact ranks/counts plus 0/1 flags, the "
    "oracle the exact ranks/counts plus literal 1. The sketch path "
    "targets BOUNDED-cardinality columns (categories/domains/tags/"
    "capped vocabs — constant state per partition, map-side merge); "
    "unbounded vocabs keep the exact vocab-key shuffle, already "
    "corpus-cheap.",
    bench=True,
)
def heavy_hitters_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    # corpus scan 1 of 2: the exact vocab counts (the gate's referee
    # needs them regardless), materialized ONCE — localCheckpoint is
    # vocab-bounded (Zipf-small), and both the capacity sizing and the
    # exact top-K read it instead of re-scanning the corpus
    wc = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # sizing from a KB-sized HLL sketch over the materialized vocab —
    # the same stat a production pipeline persists (hll_sketch_rollup's
    # stored-partials row); hh_tracked_capacity validates it against
    # Spark's hard maxItemsTracked limit
    est_nd = wc.agg(
        F.expr(f"hll_sketch_estimate(hll_sketch_agg(w, {HLL_LGK}))").alias(
            "nd"
        )
    ).collect()[0]["nd"]
    tracked = hh_tracked_capacity(int(est_nd))
    exact = hh_exact_topk(wc)
    # probe the sketch's FULL tracked list, not just its top-K: the exact
    # top-K breaks count ties by word, the sketch arbitrarily, so a
    # boundary tie could drop an exact heavy hitter from the sketch's own
    # top-K slice while its (exact) estimate sits right below the cut.
    # corpus scan 2 of 2.
    sketch = (
        tok.agg(
            F.expr(f"approx_top_k(w, {tracked}, {tracked})").alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("word"), F.col("e.count").alias("est"))
    )
    return hh_gate_report(exact, sketch)


# --- count-min sketch gate (point-frequency estimation) --------------------
# The fourth classic sketch next to quantiles (approx_quantile_gate),
# distinct counts (hll_sketch_rollup), and top-k (heavy_hitters_gate):
# "how often does THIS item occur", answered from bounded mergeable
# state.  functions/cms.py keeps the sketch in relational form (Spark's
# binary count_min_sketch aggregate has no SQL-side merge or estimate),
# so per-shard partials persist as tiny (d, col, n) tables and every
# rollup is a groupBy-sum.
CMS_PROBE_WORDS = (
    # the sf corpus's heavy hitters (collision-heavy cells), mid-tail
    # words, and one never-seen key (est must stay within 0..eps*N)
    "join", "hash", "row", "batch", "scan", "column", "customer",
    "filter", "small", "merge", "zzz_never_seen",
)
_CMS_PROBE_VALUES = ", ".join(f"('{w}')" for w in CMS_PROBE_WORDS)


def cm_gate_report(
    tok: DataFrame, merged: DataFrame, probes: DataFrame
) -> DataFrame:
    """Probe + exact referee + two-sided gate over a MERGED counter
    table — shared by the batch gate and the streaming rollup (they
    share one oracle), so a bound or tolerance edit can never fork the
    twins.  ``ge_exact`` is deterministic (count-min never undercounts,
    by construction).  ``within_bound`` gates at THREE times the classic
    eps*N overcount bound: the 1x bound holds per probe only with
    probability ~1 - e^-depth (~0.7% failure — a future corpus
    regeneration could flip a flag with no code bug, and the oracle pins
    1), while the min of depth counters exceeds 3x the bound with
    probability <= (1/(3e))^depth ~ 4e-5 — the hll_sketch_rollup
    wide-margin philosophy.  Bug sensitivity is unaffected: merge
    defects are caught cell-for-cell by the merge==direct pytest and the
    never-seen probe key (whose est must stay within 0..3eps*N of 0);
    the 1x library property itself stays empirically tested in
    tests/test_cms.py via cm_error_bound."""
    import math

    from seisdb_spark.functions import cms

    est = cms.cm_probe(probes, merged, "word")
    exact = (
        tok.join(
            F.broadcast(probes.select(F.col("word").alias("w"))), "w", "semi"
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .withColumnRenamed("w", "word")
    )
    gated = (
        est.join(F.broadcast(exact), "word", "left")
        .withColumn("exact_n", F.coalesce("exact_n", F.lit(0).cast("long")))
        .crossJoin(F.broadcast(cms.cm_total(merged)))
    )
    bound = F.ceil(
        F.lit(3.0 * math.e) * F.col("total") / F.lit(cms.CMS_WIDTH)
    ).cast("long")
    return gated.select(
        "word",
        "exact_n",
        (F.col("est") >= F.col("exact_n")).cast("int").alias("ge_exact"),
        (F.col("est") <= F.col("exact_n") + bound)
        .cast("int")
        .alias("within_bound"),
    )


@query(
    "cm_sketch_gate",
    oracle=f"""
        WITH wc AS (
            SELECT w, CAST(count(*) AS BIGINT) AS n
            FROM (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents
            )
            WHERE w <> ''
            GROUP BY w
        ),
        probes(word) AS (VALUES {_CMS_PROBE_VALUES})
        SELECT p.word,
               CAST(COALESCE(wc.n, 0) AS BIGINT) AS exact_n,
               1 AS ge_exact, 1 AS within_bound
        FROM probes p LEFT JOIN wc ON wc.w = p.word
    """,
    doc="COUNT-MIN SKETCH point-frequency gate (the approx_quantile_gate "
    "pattern, completing the sketch family): per-source counter-table "
    "partials (functions/cms.py — depth 5 hash rows x 4096 counters, "
    "xxhash64-positioned, at most depth*width rows per source however "
    "many tokens flowed in) are union-merged by one groupBy(d,col).sum "
    "— count-min merge IS element-wise addition, exact and associative, "
    "so shard boundaries cannot change the merged table — then a fixed "
    "probe word list (heavy hitters + tail + one never-seen key) is "
    "estimated by min-of-counters against the broadcast merged table "
    "and hard-gated BOTH ways: est >= exact (CM never undercounts, by "
    "construction) AND est <= exact + ceil(e*N/width) (the classic "
    "eps*N overcount bound; N read from the sketch itself — every hash "
    "row sums to N, no extra scan). Spark emits exact counts plus 0/1 "
    "flags, the oracle exact counts plus literal 1. Two corpus scans "
    "(build + exact referee); the merged sketch is localCheckpointed "
    "KB-state, the table a production pipeline persists per shard and "
    "merges forever.",
    bench=True,
)
def cm_sketch_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from seisdb_spark.functions import cms

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    # corpus scan 1 of 2: the per-source partial tables a production
    # pipeline persists; merged + materialized ONCE (<= depth*width
    # rows) so the probe and the in-sketch total both read KB-state
    merged = cms.cm_merge(
        cms.cm_partials(tok, "w", ["source"])
    ).localCheckpoint(eager=True)
    probes = spark.createDataFrame(
        [(w,) for w in CMS_PROBE_WORDS], "word string"
    )
    # corpus scan 2 of 2 (inside the shared tail): the exact referee
    # over the probe list only
    return cm_gate_report(tok, merged, probes)


# --- KMV set-operation sketch gate -----------------------------------------
# The fifth sketch class, and the one HLL cannot cover: set
# INTERSECTIONS.  "How many distinct tokens do two sources SHARE"
# (cross-source vocabulary drift, decontamination overlap audits) has
# no HLL answer — HLL merges by union only.  functions/kmv.py keeps a
# per-group bottom-k hash signature: union = merge-sort bottom-k,
# intersection/Jaccard = Broder match fraction, all expression-only.
KMV_GATE_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_KMV_SRC_LIST = ", ".join(f"'{s}'" for s in KMV_GATE_SOURCES)


def kmv_source_vocab(docs: DataFrame) -> DataFrame:
    """The gate's shared input: per-source distinct (source, w) over the
    gate sources, materialized once (bounded by len(sources) x vocab).
    The exact referee and the KMV signature build both read it."""
    return (
        docs.filter(F.col("source").isin(*KMV_GATE_SOURCES))
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .localCheckpoint(eager=True)
    )


def kmv_pair_gate(sw: DataFrame, sk: DataFrame) -> DataFrame:
    """Gate per-source KMV signatures ``sk`` (source, ks) against the
    exact pairwise intersection/union derived from the distinct vocab
    ``sw`` (source, w) — shared verbatim by the batch query and its
    streaming persisted-signature twin (whose equality rests on bottom-k
    merge being exact and associative)."""
    from seisdb_spark.functions import kmv

    cnt = sw.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a, b = sw.alias("a"), sw.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    exact = (
        inter.join(
            cnt.select(
                F.col("source").alias("src_a"), F.col("n").alias("n_a")
            ),
            "src_a",
        )
        .join(
            cnt.select(
                F.col("source").alias("src_b"), F.col("n").alias("n_b")
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).alias("n_union"),
        )
    )
    x, y = sk.alias("x"), sk.alias("y")
    est = (
        x.crossJoin(F.broadcast(y))
        .filter(F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("src_a"),
            F.col("y.source").alias("src_b"),
            kmv.kmv_jaccard_est_expr(F.col("x.ks"), F.col("y.ks")).alias(
                "est_j"
            ),
            kmv.kmv_distinct_est_expr(
                kmv.kmv_merge_expr(F.col("x.ks"), F.col("y.ks"))
            ).alias("est_u"),
        )
    )
    gated = exact.join(F.broadcast(est), ["src_a", "src_b"])
    exact_j = F.col("n_inter").cast("double") / F.col("n_union")
    return gated.select(
        "src_a",
        "src_b",
        "n_inter",
        "n_union",
        (F.abs(F.col("est_j") - exact_j) <= 0.1)
        .cast("int")
        .alias("jaccard_within"),
        (
            F.abs(F.col("est_u") - F.col("n_union"))
            <= F.col("n_union") * 0.1
        )
        .cast("int")
        .alias("union_within"),
    )


@query(
    "kmv_jaccard_gate",
    oracle=f"""
        WITH sw AS (
            SELECT DISTINCT source, w
            FROM (
                SELECT source, unnest(string_split(text, ' ')) AS w
                FROM documents
                WHERE source IN ({_KMV_SRC_LIST})
            )
            WHERE w <> ''
        ),
        cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                FROM sw GROUP BY source),
        inter AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(count(*) AS BIGINT) AS n_inter
            FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT i.src_a, i.src_b, i.n_inter,
               CAST(ca.n + cb.n - i.n_inter AS BIGINT) AS n_union,
               1 AS jaccard_within, 1 AS union_within
        FROM inter i
        JOIN cnt ca ON ca.source = i.src_a
        JOIN cnt cb ON cb.source = i.src_b
    """,
    doc="KMV SET-OPERATION sketch gate (the approx_quantile_gate "
    "pattern, fifth sketch class): per-source bottom-k hash signatures "
    "(functions/kmv.py, k=1024 — one distinct-key exchange + a "
    "group-local vocab sort, k-bounded state) support the estimate HLL "
    "cannot express at all: pairwise INTERSECTION/Jaccard between "
    "sources. All 5x4/2 source pairs get a Broder match-fraction "
    "Jaccard estimate and a merged-union distinct estimate, hard-gated "
    "within +-0.1 absolute / +-10% of the exact values (one shared "
    "vocab scan, localCheckpointed). Below k distinct keys a signature "
    "IS the full hashed set and every estimate is EXACT — the driver-"
    "scale regime, making the gate deterministic — while the x1000 "
    "tier exercises the real estimating regime (31k-word vocab >> k). "
    "Spark emits exact intersection/union counts plus 0/1 flags, the "
    "oracle the exact counts plus literal 1. At 100 TB the signatures "
    "are the persisted KB-sized stat: every cross-source overlap "
    "question after ingest merges bottom-k arrays instead of "
    "re-joining vocabularies.",
    bench=True,
)
def kmv_jaccard_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from seisdb_spark.functions import kmv

    docs = spread(load_table(spark, sf_dir, "documents"))
    sw = kmv_source_vocab(docs)
    sk = kmv.kmv_sketch(sw, "w", ["source"])
    return kmv_pair_gate(sw, sk)


# --- Mergeable histogram quantile sketch ------------------------------------
# The quantile class's RELATIONAL mergeable form (functions/histq.py):
# approx_quantile_gate's percentile_approx is a Greenwald-Khanna sketch
# locked inside an opaque aggregation buffer — no SQL-level merge, so no
# way to persist per-source/per-batch quantile state and roll it up
# later.  Fixed-grid histograms ARE that form: per-source bin counts
# (<= 64 rows each) merge by plain addition, and the quantile estimate
# carries the histogram guarantee — the exact q-quantile lies inside
# the estimated bin — as exact integer arithmetic both engines agree
# on, which keeps the gate oracle-bearing (the approx_quantile_gate
# pattern).  The exact referee is a value-frequency table (bounded by
# the metric's distinct-value count), never a global sort of rows.
from seisdb_spark.functions.histq import (  # noqa: E402
    HQ_BIN_W,
    HQ_NBINS,
    HQ_PROBE_PM,
)

_HQ_PM_LIST = ", ".join(str(p) for p in HQ_PROBE_PM)


def hq_gate_report(qb: DataFrame, docs: DataFrame) -> DataFrame:
    """Exact-quantile referee + within-bin gate over the estimated
    quantile bins — shared by the batch rollup and the streaming twin
    (they share one oracle), so the referee's rank convention and the
    clamped-last-bin clause can never fork.  The exact quantile comes
    from a value-frequency table (never a global row sort)."""
    from seisdb_spark.functions import histq

    vf = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vcum = vf.select("v", F.sum("c").over(wv).cast("long").alias("cum"))
    exact = (
        qb.select("q_pm", "r")
        .join(vcum, F.col("cum") >= F.col("r"))
        .groupBy("q_pm")
        .agg(F.min("v").alias("exact_v"))
    )
    return qb.join(exact, "q_pm").select(
        F.col("q_pm").cast("int").alias("q_pm"),
        "est_lo",
        "est_hi",
        "exact_v",
        (
            (F.col("exact_v") >= F.col("est_lo"))
            & (
                (F.col("exact_v") < F.col("est_hi"))
                | (F.col("est_bin") == F.lit(histq.HQ_NBINS - 1))
            )
        )
        .cast("int")
        .alias("within_bin"),
    )


@query(
    "hist_quantile_rollup",
    oracle=f"""
        WITH p AS (
            SELECT least(n_chars // {HQ_BIN_W}, {HQ_NBINS - 1}) AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        ),
        cum AS (
            SELECT bin, n,
                   CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cum
            FROM p
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM p),
        probes AS (
            SELECT q_pm, (q_pm * n_total + 999) // 1000 AS r
            FROM (SELECT unnest([{_HQ_PM_LIST}]) AS q_pm)
            CROSS JOIN tot
        ),
        est AS (
            SELECT q_pm, r, min(bin) AS est_bin
            FROM probes JOIN cum ON cum.cum >= probes.r
            GROUP BY q_pm, r
        ),
        vf AS (
            SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY n_chars
        ),
        vcum AS (
            SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum
            FROM vf
        ),
        ex AS (
            SELECT q_pm, min(v) AS exact_v
            FROM est JOIN vcum ON vcum.cum >= est.r
            GROUP BY q_pm
        )
        SELECT CAST(est.q_pm AS INT) AS q_pm,
               est_bin * {HQ_BIN_W} AS est_lo,
               (est_bin + 1) * {HQ_BIN_W} AS est_hi,
               exact_v,
               CAST(CASE WHEN exact_v >= est_bin * {HQ_BIN_W}
                          AND (exact_v < (est_bin + 1) * {HQ_BIN_W}
                               OR est_bin = {HQ_NBINS - 1})
                    THEN 1 ELSE 0 END AS INT) AS within_bin
        FROM est JOIN ex USING (q_pm)
    """,
    doc="MERGEABLE HISTOGRAM QUANTILE SKETCH (sixth sketch-family "
    "member; the quantile class's relational mergeable form): per-"
    "source fixed-grid bin counts over document length (<= 64 rows per "
    "source — fixed-size state regardless of row count or domain), "
    "addition-merged across sources, cumulative counts over the 64-row "
    "merged frame, and each probed per-mille quantile estimated as the "
    "first bin reaching rank ceil(q*N/1000). Hard-gated on the "
    "histogram guarantee: the exact q-quantile (from a value-frequency "
    "table, never a global row sort) must lie inside the estimated "
    "bin — exact integer arithmetic, deterministic in both engines. "
    "percentile_approx cannot express this shape: its sketch has no "
    "SQL merge, so per-source/per-batch quantile state cannot be "
    "persisted and rolled up. One (source, bin)-keyed combiner "
    "shuffle; every later frame is <= 64 rows. At 100 TB the partials "
    "table IS the persisted stat — length-distribution questions after "
    "ingest merge KB-sized histograms.",
    bench=True,
)
def hist_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from seisdb_spark.functions import histq

    docs = spread(load_table(spark, sf_dir, "documents"))
    partials = histq.hist_partials(docs, "n_chars", ["source"])
    merged = histq.hist_merge(partials)
    qb = histq.hist_quantile_bins(merged)
    return hq_gate_report(qb, docs)


@query(
    "quantile_exact_sketch_cert",
    oracle=f"""
        WITH p AS (
            SELECT source,
                   least(n_chars // {HQ_BIN_W}, {HQ_NBINS - 1}) AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        ),
        cum AS (
            SELECT source, bin, n,
                   CAST(sum(n) OVER (
                       PARTITION BY source ORDER BY bin
                   ) AS BIGINT) AS cum
            FROM p
        ),
        tot AS (
            SELECT source, CAST(sum(n) AS BIGINT) AS n_total
            FROM p GROUP BY source
        ),
        probes AS (
            SELECT source, q_pm, (q_pm * n_total + 999) // 1000 AS r
            FROM (SELECT unnest([{_HQ_PM_LIST}]) AS q_pm)
            CROSS JOIN tot
        ),
        est AS (
            SELECT probes.source, q_pm, r, min(bin) AS est_bin
            FROM probes
            JOIN cum ON cum.source = probes.source AND cum.cum >= probes.r
            GROUP BY 1, 2, 3
        ),
        rk AS (
            SELECT source, n_chars,
                   row_number() OVER (
                       PARTITION BY source ORDER BY n_chars, doc_id
                   ) AS rn
            FROM documents
        )
        SELECT est.source,
               CAST(est.q_pm AS INT) AS q_pm,
               est_bin * {HQ_BIN_W} AS est_lo,
               (est_bin + 1) * {HQ_BIN_W} AS est_hi,
               CAST(rk.n_chars AS BIGINT) AS exact_v,
               CAST(CASE WHEN rk.n_chars >= est_bin * {HQ_BIN_W}
                          AND (rk.n_chars < (est_bin + 1) * {HQ_BIN_W}
                               OR est_bin = {HQ_NBINS - 1})
                    THEN 1 ELSE 0 END AS INT) AS within_bin
        FROM est
        JOIN rk ON rk.source = est.source AND rk.rn = est.r
    """,
    doc="EXACT-vs-SKETCH QUANTILE CERTIFICATION (the exact/approx pairing "
    "made an executable contract): per SOURCE, the exact nearest-rank "
    "quantile — computed by embedding_dim_quantiles' machinery, a "
    "row_number over the (value, doc_id) total order picking the rank-r "
    "ELEMENT — must lie inside the bin hist_quantile_rollup's mergeable "
    "histogram sketch estimates from its <= 64-row per-source partials, "
    "for every probed per-mille quantile.  This certifies three things "
    "at once: the sketch honours its bin guarantee PER GROUP (the "
    "rollup's own gate only checks the global merge), the row_number "
    "nearest-rank and the cumulative-frequency rank conventions agree "
    "(the oracle recomputes both independently), and the shared rank "
    "formula ceil(q*N/1000) is identical in both code paths.  All "
    "integer arithmetic, so the within_bin flags hash exactly.  Scale "
    "shape: the sketch side moves <= sources x 64 rows; the exact side "
    "is ONE source-keyed exchange with a partition-local sort — the "
    "honest cost of exact order statistics, which is precisely what "
    "this certification prices against the sketch (at 100 TB you run "
    "the sketch and keep THIS query for sampled audits).",
    bench=True,
)
def quantile_exact_sketch_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from seisdb_spark.functions import histq

    docs = spread(load_table(spark, sf_dir, "documents"))
    partials = histq.hist_partials(docs, "n_chars", ["source"])
    est = histq.hist_quantile_bins_by(partials, ["source"])
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source",
        F.col("n_chars").cast("bigint").alias("exact_v"),
        F.row_number().over(wr).alias("rn"),
    )
    return (
        est.join(
            ranked,
            (est.source == ranked.source) & (est.r == ranked.rn),
        )
        .select(
            est.source.alias("source"),
            F.col("q_pm").cast("int").alias("q_pm"),
            "est_lo",
            "est_hi",
            "exact_v",
            (
                (F.col("exact_v") >= F.col("est_lo"))
                & (
                    (F.col("exact_v") < F.col("est_hi"))
                    | (F.col("est_bin") == F.lit(histq.HQ_NBINS - 1))
                )
            )
            .cast("int")
            .alias("within_bin"),
        )
    )
