"""Embedding-vector expression builders: deterministic dot/norm chains and
sign-bit LSH bucket keys for similarity search over ``array<float>`` columns.

The dot product is generated as an explicit left-associated term chain so
Spark and the DuckDB oracle accumulate in the same IEEE-754 order
(bit-identical) — ``F.aggregate`` would fold in the same order but gives the
oracle nothing to mirror.

Sign-bit bucketing is the classic random-hyperplane LSH family restricted to
axis-aligned hyperplanes (hyperplane normal = basis vector e_d): bucket bit d
is ``embedding[d] >= 0``. Cosine-similar vectors agree on sign bits with
probability 1 - theta/pi per bit, so near-duplicate vectors share the full
key and top-k neighbours are found by probing buckets within small Hamming
distance — the scan prunes to |probed buckets| / 2^bits of the data.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBEDDING_DIM = 64

# Sign-bit LSH geometry: 4 axis-aligned bits -> 16 buckets; Hamming<=1
# probing scans 5/16 of the data. At 100 TB you raise the bit count (each
# bit halves the probed fraction) and keep multiprobe radius 1.
SIGN_BITS = 4


def dot_chain_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    """Left-associated dot-product term chain (deterministic fp order)."""
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1)
    )


def dot_chain_col(a: str, b: str, dim: int = EMBEDDING_DIM) -> Column:
    """Same chain as :func:`dot_chain_sql`, built as ONE parsed expression.

    Building 64 terms from Column objects costs ~300 py4j round-trips
    (~1s of driver time per query construction); a single F.expr string is
    one round-trip and parses JVM-side. Spark SQL array indexing is 0-based
    (vs DuckDB's 1-based), hence i-1; `+` parses left-associative, so the
    fp accumulation order matches the oracle bit-for-bit."""
    return F.expr(
        " + ".join(
            f"CAST({a}[{i - 1}] AS DOUBLE) * CAST({b}[{i - 1}] AS DOUBLE)"
            for i in range(1, dim + 1)
        )
    )


def sign_bits_cols(col: str = "embedding", bits: int = SIGN_BITS) -> list[Column]:
    """One 0/1 column per sign bit (dimensions 1..bits, 1-indexed)."""
    return [
        F.when(F.element_at(col, d) >= 0, 1).otherwise(0).alias(f"sb{d - 1}")
        for d in range(1, bits + 1)
    ]


def sign_bits_sql(col: str, bits: int = SIGN_BITS) -> list[str]:
    """DuckDB twins of :func:`sign_bits_cols` (1-indexed list access)."""
    return [
        f"CASE WHEN {col}[{d}] >= 0 THEN 1 ELSE 0 END AS sb{d - 1}"
        for d in range(1, bits + 1)
    ]


def hamming_leq(a_prefix: str, b_prefix: str, bits: int, radius: int) -> Column:
    """Predicate: Hamming distance between two sign-bit column sets <= radius."""
    diffs = [
        F.abs(F.col(f"{a_prefix}sb{i}") - F.col(f"{b_prefix}sb{i}"))
        for i in range(bits)
    ]
    return reduce(add, diffs) <= radius
