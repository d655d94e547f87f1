"""Embedding-vector expression builders: deterministic dot/norm chains and
sign-bit LSH bucket keys for similarity search over ``array<float>`` columns.

The dot product is generated as an explicit left-associated term chain so
Spark and the DuckDB oracle accumulate in the same IEEE-754 order
(bit-identical) — ``F.aggregate`` would fold in the same order but gives the
oracle nothing to mirror.

Sign-bit bucketing is the classic random-hyperplane LSH family restricted to
axis-aligned hyperplanes (hyperplane normal = basis vector e_d): bucket bit d
is ``embedding[d] >= 0``. Cosine-similar vectors agree on sign bits with
probability 1 - theta/pi per bit, so near-duplicate vectors share bucket
keys and top-k neighbours are found by probing buckets within small Hamming
distance — the scan prunes to |probed buckets| / 2^bits of the data.

Bit counts are NOT compile-time constants: each query derives its bucket-key
width from the input row count at execution time (``adaptive_bits_col`` /
``adaptive_bits_sql``, computed as a broadcast 1-row aggregate), so the
expected bucket occupancy stays ~constant as data grows — the probed
fraction shrinks as 1/2^bits instead of silently degrading toward a linear
scan (ANN) or quadratic within-bucket blow-up (near-dup blocking).  The
width formula is pure integer arithmetic (``length(bin(ceil(n/target)-1))``
= ceil(log2(ceil(n/target)))), bit-identical between Spark and the DuckDB
oracle — no float log2 at an integer boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBEDDING_DIM = 64

# A bucket key is a prefix (or band slice) of this many sign-bit characters;
# 16 bits = 65536 buckets is ample headroom before key width saturates.
MAX_SIGN_BITS = 16


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


def sign_string_expr(col: str = "embedding", dims: int = EMBEDDING_DIM) -> Column:
    """The full '1'/'0' sign string over all dims, as ONE parsed expression
    (0-based Spark SQL indexing; one py4j round-trip, codegen'd JVM-side).
    Bucket keys are prefixes / band slices of this string — slicing by a
    runtime length column is what makes the key width data-adaptive."""
    chars = ", ".join(f"if({col}[{d}] >= 0, '1', '0')" for d in range(dims))
    return F.expr(f"concat({chars})")


def sign_string_sql(col: str = "embedding", dims: int = EMBEDDING_DIM) -> str:
    """DuckDB twin of :func:`sign_string_expr` (1-indexed list access)."""
    return " || ".join(
        f"CASE WHEN {col}[{d}] >= 0 THEN '1' ELSE '0' END" for d in range(1, dims + 1)
    )


def adaptive_bits_col(
    n: Column, target_rows: int, min_bits: int, max_bits: int = MAX_SIGN_BITS
) -> Column:
    """Bucket-key width for ``n`` input rows: the smallest ``bits`` with
    ``2^bits >= n / target_rows`` (expected bucket occupancy <= target),
    clamped to [min_bits, max_bits].

    Integer-only: ``ceil(log2(x)) = length(bin(x - 1))`` for x >= 2, so the
    same expression evaluates bit-identically in Spark and DuckDB."""
    ceil_div = F.floor((n + F.lit(target_rows - 1)) / F.lit(target_rows)).cast("long")
    bits = F.length(F.bin(ceil_div - 1))
    return F.greatest(F.lit(min_bits), F.least(F.lit(max_bits), bits))


def adaptive_bits_sql(
    target_rows: int, min_bits: int, max_bits: int = MAX_SIGN_BITS
) -> str:
    """DuckDB twin of :func:`adaptive_bits_col`; ``n`` is ``count(*)`` of the
    enclosing aggregate query."""
    return (
        f"GREATEST({min_bits}, LEAST({max_bits}, "
        f"LENGTH(BIN((count(*) + {target_rows - 1}) // {target_rows} - 1))))"
    )


def adaptive_bits_py(
    n: int, target_rows: int, min_bits: int, max_bits: int = MAX_SIGN_BITS
) -> int:
    """Python twin of :func:`adaptive_bits_col`, digit-for-digit (``bin(x)``
    renders identically to Spark's/DuckDB's BIN for x >= 0).  Used when the
    input cardinality is already known driver-side — e.g. read from parquet
    footers — so the bucket width becomes a plan LITERAL and the query needs
    no pre-count job (the ann_signbucket_topk cold-path fix)."""
    ceil_div = (n + target_rows - 1) // target_rows
    bits = len(format(max(ceil_div - 1, 0), "b"))
    return max(min_bits, min(max_bits, bits))
