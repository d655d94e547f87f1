"""Text-analysis expression builders: tokenization, k-shingling, MinHash,
SimHash, and language scoring — all pure ``pyspark.sql.functions`` column
math (JVM-side, whole-stage-codegen'd; no Python boundary).

Portability discipline (these feed DuckDB-oracle-checked queries):
  * hashing is md5 over explicit strings — identical hex in Spark and DuckDB;
  * hex-digit parsing uses ``conv(digit, 16, 10)`` on the Spark side and
    ``strpos(alphabet, digit) - 1`` on the DuckDB side — same value;
  * min-over-hex-strings is lexicographic in both engines (lowercase hex).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MinHash-LSH geometry: 12 hashes in 4 bands x 3 rows. Band collision
# probability for Jaccard J is 1-(1-J^3)^4: J=0.9 -> 0.995, J=0.8 -> 0.94,
# J=0.5 -> 0.41, J=0.1 -> 0.004 — near-dups are caught, random pairs are
# pruned (vs round 1's 2x2 over unigrams which emitted 74% of all pairs).
N_MINHASH = 12
ROWS_PER_BAND = 3
N_BANDS = N_MINHASH // ROWS_PER_BAND
SHINGLE_K = 3

# SimHash: 16-bit fingerprint from the first 4 hex digits of md5(token).
SIMHASH_BITS = 16
_HEX = "0123456789abcdef"


def word_tokens(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """Distinct (doc_id[, extra], word) whitespace-token set per document."""
    return docs.select(
        "doc_id",
        *extra_cols,
        F.explode(F.split(F.col("text"), " ")).alias("word"),
    ).distinct()


def shingle_tokens(docs: DataFrame, k: int = SHINGLE_K, distinct: bool = True) -> DataFrame:
    """(doc_id, sh) word k-shingle rows per document.

    ``slice``+``concat_ws`` over a ``sequence`` of start positions — one
    narrow projection, no joins. Documents shorter than k words yield no
    shingles (guarded: Spark's ``sequence(1, 0)`` would count *down*).

    ``distinct=True`` (a shuffle) is required wherever set semantics matter
    (Jaccard counts); MinHash signatures pass ``distinct=False`` because
    ``min()`` is insensitive to duplicates — partial aggregation absorbs
    them map-side and the extra shuffle disappears.

    Built as ``explode(sequence)`` + array subscripts rather than
    ``transform(..., slice(...))``: higher-order functions are evaluated
    interpreted (outside whole-stage codegen), and the subscript form
    measured 2x faster on generation with identical output.
    """
    w = F.split(F.col("text"), " ")
    starts = F.when(
        F.size(w) >= k, F.sequence(F.lit(1), F.size(w) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select("doc_id", w.alias("w"), F.explode(starts).alias("i"))
    sh = F.concat_ws(" ", *[F.expr(f"w[i + {j - 1}]") for j in range(k)])
    out = exploded.select("doc_id", sh.alias("sh"))
    return out.distinct() if distinct else out


def minhash_agg_exprs(token_col: str = "sh", n: int = N_MINHASH) -> list[Column]:
    """``min(md5('s<i>:' || token))`` aggregate per salt — the MinHash row.

    Built as one parsed expression per hash (1 py4j round-trip each) rather
    than nested Column calls (~6 each) — these appear in every LSH plan and
    driver-side build time is part of the measured query cost.
    """
    return [
        F.expr(
            f"min(md5(cast(concat('s{i}:', {token_col}) as binary))) AS mh{i}"
        )
        for i in range(n)
    ]


def band_key_exprs(
    n: int = N_MINHASH, rows_per_band: int = ROWS_PER_BAND
) -> list[Column]:
    """One md5 key per band over that band's minhash rows (concatenated)."""
    return [
        F.expr(
            "md5(cast(concat("
            + ", ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
            + f") as binary)) AS bk{b}"
        )
        for b in range(n // rows_per_band)
    ]


def simhash_agg(tokens: DataFrame) -> DataFrame:
    """Per-doc 16-bit SimHash over a (doc_id, word) token table.

    For each bit position p = 4*(k-1)+j (hex digit k of md5(word), bit j):
    sum +/-1 contributions across tokens; the fingerprint sets bit p iff the
    sum is positive. Entirely aggregate expressions — one shuffle on doc_id.
    """
    aggs = []
    for k in range(4):  # hex digits 1..4
        digit = f"cast(conv(substring(md5(cast(word as binary)), {k + 1}, 1), 16, 10) as int)"
        for j in range(4):  # bits within the digit, LSB first
            bit = f"(floor({digit} / {2**j}) % 2)"
            aggs.append(F.expr(f"sum({bit} * 2 - 1) AS b{4 * k + j}"))
    summed = tokens.groupBy("doc_id").agg(*aggs)
    fp = " + ".join(
        f"CASE WHEN b{p} > 0 THEN {2**p} ELSE 0 END" for p in range(SIMHASH_BITS)
    )
    return summed.select("doc_id", F.expr(f"cast({fp} as int) AS simhash"))


def simhash_oracle_sql(source_cte: str = "tok") -> str:
    """DuckDB twin of :func:`simhash_agg` over a (doc_id, word) CTE."""
    aggs = []
    for k in range(4):
        digit = f"(strpos('{_HEX}', substr(md5(word), {k + 1}, 1)) - 1)"
        for j in range(4):
            bit = f"(({digit} // {2**j}) % 2)"
            aggs.append(f"sum({bit} * 2 - 1) AS b{4 * k + j}")
    terms = " + ".join(
        f"CASE WHEN b{p} > 0 THEN {2**p} ELSE 0 END" for p in range(SIMHASH_BITS)
    )
    return f"""
        summed AS (
            SELECT doc_id, {", ".join(aggs)}
            FROM {source_cte}
            GROUP BY doc_id
        ),
        simhashed AS (
            SELECT doc_id, CAST({terms} AS INT) AS simhash FROM summed
        )
    """


# Deterministic per-language marker-word profiles for the n-gram/stopword
# language-ID heuristic. The driver corpus is synthetic (all langs share one
# vocabulary), so the *prediction quality* is meaningless there — the operator
# shape (K profile scores + deterministic argmax) is what's exercised and
# oracle-checked; on real text the profiles would be per-language stopwords.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "row", "fast"),
    "de": ("window", "batch", "data", "key", "merge"),
    "es": ("query", "join", "order", "scan", "slow"),
    "fr": ("table", "part", "group", "line", "big"),
    "zh": ("spark", "hash", "stream", "column", "small"),
}


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Profile-hit score per language: count of marker words present."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    out = {}
    for lang, words in LANG_PROFILES.items():
        score = None
        for w in words:
            hit = F.when(padded.contains(f" {w} "), 1).otherwise(0)
            score = hit if score is None else score + hit
        out[lang] = score
    return out


def lang_argmax(scores: dict[str, Column]) -> Column:
    """Deterministic argmax: first language (profile order) whose score is
    >= every later language's score — a first-match-wins CASE chain that both
    engines evaluate identically."""
    langs = list(scores)
    expr = F.lit(langs[-1])
    for i in range(len(langs) - 2, -1, -1):
        cond = None
        for other in langs[i + 1 :]:
            c = scores[langs[i]] >= scores[other]
            cond = c if cond is None else cond & c
        expr = F.when(cond, F.lit(langs[i])).otherwise(expr)
    return expr
