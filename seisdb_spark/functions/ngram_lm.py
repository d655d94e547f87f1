"""Trained bigram language model for perplexity-based quality filtering
(the CCNet / KenLM stage of public LLM-data pipelines: train a small LM
on a trusted reference slice, score every candidate document, keep the
low-perplexity ones).  Everything is Spark SQL expressions — no UDF, no
RDD — and every per-document score is an exact BIGINT, bit-identical
across engines.

The cross-engine log problem, solved without libm
-------------------------------------------------
A bigram NLL is ``ln((c1 + V) / (c12 + 1))`` — a log of a ratio of
integers.  ``ln`` is the one operation whose last-ulp output differs
between JVM ``Math.log`` and C libm (the drift source the BM25/DSIR
family documented), so this module never calls it.  Instead, with
``a = c1 + V`` and ``b = c12 + 1`` (``1 <= b <= a`` by construction):

1. **Octave reduction** (pure integer): ``k = floor(log2(a/b))`` is
   computed exactly as ``length(base2(a div b)) - 1``.  (Proof that the
   integer quotient suffices: if ``a/b`` lies in ``[2^k, 2^(k+1))``
   then ``floor(a/b) >= 2^k`` because ``2^k`` is an integer ``<= a/b``,
   and ``floor(a/b) <= a/b < 2^(k+1)``; so both have the same
   floor-log2.)  Spark spells base2 ``conv(q, 10, 2)``, DuckDB
   ``to_base(q, 2)`` — both return plain binary strings.
2. **Fractional part** (IEEE-deterministic float): the mantissa
   ``m = a / (b << k)`` lies in ``[1, 2)``; ``ln m`` is approximated by
   the [1/1] Pade surrogate ``2 (m - 1) / (m + 1)`` — the DSIR
   discipline.  On ``[1, 2)`` the surrogate's relative error is
   <= 3.9 % (worst at m -> 2), and because +, -, *, / on doubles are
   IEEE-754 correctly rounded (unlike transcendentals), every engine
   produces the same bits.  Without the octave step the surrogate
   saturates at 2 for large ratios (``ln V`` ~ 8 for unseen bigrams
   would be crushed to ~2) — reduction keeps the whole Zipf range
   accurate (measured <= 1.2 % overall in the module test).
3. **Fixed-point quantization**: ``nll_nano = k * 693147180 +
   floor(surrogate * 1e9)`` (``693147180 = floor(ln 2 * 1e9)``, a
   defined constant of the encoding).  Per-document sums of BIGINT
   nanonats are exact and order-independent; the mean is an integer
   ``div``.

Overflow envelope: ``a <= c1 + V`` is bounded by the reference token
count; at 1e12 tokens ``2e6 * a`` and ``b << k <= 2a`` stay far inside
int64 (the multiplier here is 1e9 applied to a double in [0, 0.7), so
the only integer products are ``k * 693147180 <= 63 * 7e8 < 2^63``).

Scale shape (100 TB): training is one scan of the reference slice into
two vocab-bounded count tables plus a 1-row vocab-size aggregate (Zipf-
small — the persisted LM *is* these tables, the sketch-table pattern);
scoring is one scan of the corpus with two joins against the count
tables (AQE decides broadcast vs shuffle; no hints) and ONE
groupBy(doc_id) with map-side partial sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: floor(ln(2) * 1e9) — the octave step in nanonats.
LN2_NANO = 693147180

#: fixed-point scale for the fractional Pade part.
LM_QUANT = 10**9


def bigram_pairs(docs: DataFrame, *keep_cols: str) -> DataFrame:
    """Explode each document's text into consecutive word pairs
    ``(keep_cols..., w1, w2)`` — map-side only (split + slice + zip +
    explode; no window, no shuffle).  Documents with < 2 words simply
    produce no rows (inner semantics, mirrored by the oracle)."""
    toks = docs.select(
        *keep_cols,
        F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias(
            "toks"
        ),
    )
    pairs = F.expr(
        "arrays_zip(slice(toks, 1, greatest(size(toks) - 1, 0)), "
        "slice(toks, 2, greatest(size(toks) - 1, 0)))"
    )
    return toks.select(*keep_cols, F.explode(pairs).alias("pr")).select(
        *keep_cols,
        F.col("pr")["0"].alias("w1"),
        F.col("pr")["1"].alias("w2"),
    )


def train_bigram_lm(
    ref_bigrams: DataFrame, materialize: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Add-1-smoothed bigram LM from a reference bigram stream:
    returns ``(bigram_counts(w1, w2, c12), context_counts(w1, c1),
    vocab(v))`` where ``v`` = distinct reference words + 1 (the OOV
    bucket).  The reference corpus is scanned ONCE — into the bigram
    count table; the context counts (``c1 = sum_w2 c12``, exactly the
    count of bigrams opening with w1) and the vocab size (distinct
    words across the bigram table's keys) are aggregations over that
    already-vocab-bounded table, never a second corpus pass.

    ``materialize`` localCheckpoints the bigram table (the kmv /
    heavy-hitters shared-vocab-scan pattern): without it Spark replans
    the reference scan under each of the three consumers — the
    higher-order-function lambdas in the bigram explode defeat
    exchange-reuse canonicalization (measured: 0 ReusedExchange, 4
    reference FileScans).  Checkpointing makes the Zipf-small count
    table the literal persisted model, which is the 100 TB operating
    shape anyway: train once, store the tables, score shards forever."""
    bc = ref_bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    if materialize:
        bc = bc.localCheckpoint()
    cc = bc.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    vocab = (
        bc.select(F.col("w1").alias("w"))
        .unionAll(bc.select(F.col("w2").alias("w")))
        .agg((F.countDistinct("w") + F.lit(1)).cast("long").alias("v"))
    )
    return bc, cc, vocab


def nll_nano_expr(a_sql: str, b_sql: str) -> F.Column:
    """The nanonat NLL as ONE Spark SQL expression over sub-expressions
    ``a_sql`` / ``b_sql`` (BIGINT-valued SQL fragments, ``1 <= b <= a``).
    Kept as a SQL string builder so the identical arithmetic can be
    emitted for the DuckDB oracle by :func:`nll_nano_sql`."""
    return F.expr(nll_nano_sql(a_sql, b_sql, dialect="spark"))


def nll_nano_sql(a_sql: str, b_sql: str, dialect: str) -> str:
    """Emit the nanonat-NLL arithmetic for either engine.  The two
    dialects differ ONLY in spelling (base-2 string, integer div,
    shift); the value semantics are identical, which is what makes the
    per-term BIGINTs — and therefore the per-doc sums — hash-equal."""
    if dialect == "spark":
        q = f"(({a_sql}) div ({b_sql}))"
        k = f"(length(conv(cast({q} as string), 10, 2)) - 1)"
        bp = f"shiftleft(cast(({b_sql}) as bigint), cast({k} as int))"
    elif dialect == "duck":
        q = f"(({a_sql}) // ({b_sql}))"
        k = f"(length(to_base({q}, 2)) - 1)"
        bp = f"(({b_sql}) << cast({k} as int))"
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown dialect: {dialect}")
    m = f"(cast(({a_sql}) as double) / cast({bp} as double))"
    frac = f"cast(floor(2.0 * ({m} - 1.0) / ({m} + 1.0) * 1000000000.0) as bigint)"
    return f"(cast({k} as bigint) * {LN2_NANO} + {frac})"
