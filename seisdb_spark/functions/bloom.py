"""Declarative Bloom filter over a string key column — built, broadcast,
and probed entirely with Spark SQL expressions (no UDF, no RDD, no
driver-side bit twiddling).

PySpark 4.1's classic API exposes neither ``might_contain`` nor
``DataFrameStatFunctions.bloomFilter``, so the filter is composed from
primitives the optimizer understands:

* **build** — each key sets K bit positions derived by Kirsch–
  Mitzenmacher double hashing (``pos_i = (h1 + i*h2) mod M`` with
  ``h1 = xxhash64(key)``, ``h2 = xxhash64(key, 1)``; both residues taken
  BEFORE the multiply so the arithmetic stays far from BIGINT range
  under ANSI mode).  Positions aggregate per 64-bit word with
  ``bit_or`` — a key-count-independent, M/64-row exchange — then a
  range outer join densifies the words into ONE row holding an
  ``array<bigint>`` of length M/64 (missing words coalesce to 0).
* **probe** — cross-join the 1-row words table (broadcast: M/64 longs,
  e.g. 128 KB at M = 2^20) and test all K positions with O(1)
  ``element_at`` lookups inside whole-stage codegen.  A dense ARRAY is
  deliberate: ``element_at`` on a MAP column is a linear scan per
  lookup, which at K lookups per row re-introduces the cost the filter
  exists to avoid.

No false negatives by construction (build and probe evaluate the same
hash expressions over the same strings), so "bloom-prefilter then
exact-verify" pipelines return EXACTLY the unfiltered result — the
property that lets bloom-accelerated queries share their exact twin's
oracle.  False-positive rate is the standard (1 - e^(-K*n/M))^K; the
default 10 bits/key with K=5 gives ~0.9 %.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_BITS_PER_KEY = 10
BLOOM_K = 5  # hash functions; ~optimal for 10 bits/key is 7, 5 is cheaper
BLOOM_MIN_BITS = 1 << 10
BLOOM_MAX_BITS = 1 << 24  # 2 MiB of words — still a trivial broadcast


def bloom_bits_for(n_keys: int, bits_per_key: int = BLOOM_BITS_PER_KEY) -> int:
    """Power-of-two filter size for n keys (clamped to sane bounds)."""
    m = BLOOM_MIN_BITS
    while m < n_keys * bits_per_key and m < BLOOM_MAX_BITS:
        m <<= 1
    return m


def _positions(key, m_bits, k: int) -> list:
    """The K bit positions for a key column, as Columns in [0, m_bits).
    ``m_bits`` may be a python int (build side) or a Column (probe side,
    derived from the words array itself); residues are taken BEFORE the
    multiply so the arithmetic stays far from BIGINT range under ANSI."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = m_bits if hasattr(m_bits, "_jc") or hasattr(m_bits, "_expr") else F.lit(m_bits)
    h1 = F.pmod(F.xxhash64(key), m)
    h2 = F.pmod(F.xxhash64(key, F.lit(1)), m)
    return [F.pmod(h1 + F.lit(i) * h2, m) for i in range(k)]


def build_bloom(
    keys: DataFrame, col: str, m_bits: int, k: int = BLOOM_K
) -> DataFrame:
    """ONE-row DataFrame ``(words array<bigint>, bloom_k int)`` — the
    dense filter for the key column, carrying its OWN hash count so a
    probe cannot silently disagree with the build (pass the row's
    ``bloom_k`` column as ``bloom_hit``'s ``built_k`` and a mismatch
    raises at runtime instead of reintroducing false negatives).  The
    bit_or exchange carries at most m_bits/64 rows regardless of key
    count; the densify join runs over the same m_bits/64 range table."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("pos")
    bits = (
        keys.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            # call_function: the Python shiftleft wrapper only accepts a
            # LITERAL shift count; the SQL function takes expressions
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.col("pos").bitwiseAND(F.lit(63)).cast("int"),
            ).alias("b"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    dense = (
        keys.sparkSession.range(n_words)
        .select(F.col("id").alias("word"))
        .join(bits, "word", "left")
        .select("word", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    return dense.agg(
        F.expr("transform(array_sort(collect_list(struct(word, bits))), s -> s.bits)")
        .alias("words")
    ).withColumn("bloom_k", F.lit(k).cast("int"))


def bloom_hit(words, key, *, k: int = BLOOM_K, built_k=None):
    """Boolean Column: every one of the key's K bits is set in ``words``
    (an ``array<bigint>`` column from build_bloom, typically supplied via
    ``crossJoin(F.broadcast(words_row))``).  O(1) element_at lookups, all
    inside whole-stage codegen.

    Both build-time parameters are protected against probe-side drift —
    either failure mode would silently DROP true members and break the
    no-false-negatives property the oracle-sharing pipelines depend on:

    * the modulus is DERIVED from the words array (size * 64), never
      trusted from the caller — a probe modulus larger than the build's
      would index past the array and turn lookups NULL (there is no
      ``m_bits`` parameter at all);
    * the hash count ``k`` must equal the build's — a probe k greater
      than the build's tests bits the build never set.  ``k`` has to be
      a Python int (it unrolls into K element_at expressions), so the
      build row carries its k (``bloom_k``); pass that column as
      ``built_k`` and a mismatch RAISES at runtime (``raise_error``)
      instead of returning false.

    ``k`` is KEYWORD-ONLY: an earlier revision accepted (and ignored) a
    positional ``m_bits`` third argument — an old-style positional call
    would now silently rebind it to ``k`` and turn true members into
    false negatives, so positional passing is a TypeError instead."""
    m = F.size(words).cast("long") * 64
    if built_k is not None:
        cond = F.when(built_k == F.lit(k), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"bloom_hit: probe k={k} does not match build k="),
                    built_k.cast("string"),
                )
            ).cast("boolean")
        )
    else:
        cond = F.lit(True)
    for p in _positions(key, m, k):
        word = F.element_at(words, F.shiftright(p, 6).cast("int") + 1)
        bit = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            p.bitwiseAND(F.lit(63)).cast("int"),
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond
