"""Embedding-vector expression builders: deterministic dot/norm chains and
sign-bit LSH bucket keys for similarity search over ``array<float>`` columns.

The DuckDB oracle's dot product is an explicit left-associated term chain;
the Spark side computes the same fold with the higher-order ``aggregate`` /
``zip_with`` functions, which accumulate left-to-right from a +0.0 seed —
the identical IEEE-754 addition order (``0.0 + t1 == t1`` exactly), so the
two stay bit-identical.  The HOF form matters for COLD latency, not
semantics: a 64-term inline chain (128 casts, 64 multiplies, duplicated at
every use site in the plan) made Janino whole-stage-codegen JIT cost ~4-5 s
on a query's first execution; the HOF compiles to a fixed-size loop and
cut the measured ann_signbucket_topk cold path from 5.6 s to 1.2 s with
byte-identical top-k output.

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
    """Spark twin of :func:`dot_chain_sql`, as a higher-order-function fold.

    ``aggregate(zip_with(a, b, *), 0.0, +)`` accumulates left-to-right from
    a +0.0 seed — the same IEEE-754 addition order as the oracle's
    left-associative ``+`` chain (``0.0 + t1 == t1`` exactly), so results
    are bit-identical.  Unlike an inlined 64-term chain, the HOF compiles
    to a small loop: whole-stage codegen stays a few hundred bytes per use
    site instead of ~10 KB, which removed a ~4 s Janino JIT tax from every
    embedding query's first execution (see module docstring).  ``slice``
    pins the fold to exactly ``dim`` terms so a longer array on one side
    could never silently add terms the oracle lacks."""
    return F.expr(
        f"aggregate(zip_with(slice({a}, 1, {dim}), slice({b}, 1, {dim}), "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def sign_string_expr(col: str = "embedding", dims: int = EMBEDDING_DIM) -> Column:
    """The full '1'/'0' sign string over all dims, as one higher-order
    expression (loop codegen, not ``dims`` inlined ifs — same JIT-tax
    rationale as :func:`dot_chain_col`).  Bucket keys are prefixes / band
    slices of this string — slicing by a runtime length column is what
    makes the key width data-adaptive."""
    return F.expr(
        f"array_join(transform(slice({col}, 1, {dims}), "
        "x -> if(x >= 0, '1', '0')), '')"
    )


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
