"""Declarative count-min sketch over a string key column — built,
merged, and probed entirely with Spark SQL expressions (the
``functions/bloom.py`` design language: no UDF, no RDD, no driver-side
counter twiddling).

Why not Spark's built-in?  ``count_min_sketch`` exists as a SQL
aggregate, but its binary output has NO SQL-side estimate or merge
function (probing needs the JVM ``CountMinSketch`` object via private
py4j paths), so a pipeline that persists per-shard sketches could never
roll them up or query them declaratively.  This module keeps the sketch
in relational form instead:

* **build** (``cm_partials``) — each key increments ``depth`` counters,
  one per hash row, at ``col_d = xxhash64(key, d) mod width``; counters
  aggregate per (group, d, col) with ``sum`` — a combiner-friendly
  exchange bounded by ``group x depth x width`` rows regardless of key
  count.  One corpus scan per arriving shard, the scan-once shape.
* **merge** (``cm_merge``) — count-min merge IS element-wise addition
  of counter tables (same depth/width/hash family), so merging per-
  shard partials is one ``groupBy(d, col).sum`` over KB-sized tables.
  Exact-integer sums make merge-equals-direct an equality, not an
  approximation (pinned in tests).
* **probe** (``cm_probe``) — for each probe key, join its ``depth``
  (d, col) positions against the merged table (<= depth*width rows:
  broadcast) and take the row-wise MIN of the counters.

Guarantees (Cormode & Muthukrishnan): estimates never undercount
(``est >= exact`` always — every occurrence of the key incremented
every probed counter), and overcount by more than ``e*N/width`` with
probability at most ``e^-depth`` per probe (N = total key count, which
the sketch itself carries: every hash row sums to N).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 5  # hash rows: overcount-bound failure prob ~ e^-5 ~ 0.7%
CMS_WIDTH = 1 << 12  # counters per row: eps = e/4096 ~ 0.066% of N


def cm_positions(key, width: int, depth: int) -> list:
    """The per-row counter positions for a key column: row d probes
    ``xxhash64(key, d) mod width`` — xxhash64 over the (key, row-index)
    TUPLE, the same derived-hash-family trick the bloom filter's h2
    uses (pyspark's xxhash64 has a fixed seed; extra columns fold into
    the hash input)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    return [
        F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width)) for d in range(depth)
    ]


def _pos_pairs(key, width: int, depth: int):
    """(d, col) struct array for explode — one element per hash row."""
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"), p.cast("int").alias("col")
            )
            for d, p in enumerate(cm_positions(key, width, depth))
        ]
    )


def cm_partials(
    keys: DataFrame,
    col: str,
    group_cols: list[str],
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Per-group count-min partials ``(group_cols..., d, col, n)`` —
    sparse relational counter tables (absent cells are 0), at most
    ``width * depth`` rows per group however many keys flowed in.
    This is the table a production pipeline PERSISTS per shard/source;
    every later merge or probe touches only these rows."""
    pairs = keys.select(
        *group_cols, F.explode(_pos_pairs(F.col(col), width, depth)).alias("p")
    )
    return pairs.groupBy(
        *group_cols, F.col("p.d").alias("d"), F.col("p.col").alias("col")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def cm_merge(partials: DataFrame) -> DataFrame:
    """Union-merge partial counter tables: element-wise addition, i.e.
    one ``groupBy(d, col).sum(n)`` over KB-sized inputs.  Associative
    and exact — merge order and shard boundaries cannot change the
    merged table (the HLL-union analogue for point frequencies)."""
    return partials.groupBy("d", "col").agg(
        F.sum("n").cast("long").alias("n")
    )


def cm_total(merged: DataFrame) -> DataFrame:
    """ONE-row ``(total bigint)``: the total key count N, read from the
    sketch itself — every hash row's counters sum to N, so row 0
    suffices.  No corpus re-scan to size error bounds."""
    return merged.filter(F.col("d") == 0).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("total")
    )


def cm_probe(
    probes: DataFrame,
    merged: DataFrame,
    col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point-frequency estimates for each probe key: all input columns
    preserved plus ``est`` (bigint, min over the key's ``depth``
    counters; absent cells coalesce to 0 so never-seen keys estimate
    0..eps*N).  The merged table is broadcast — <= depth*width rows by
    construction.  ``width``/``depth`` must match the build's (same
    hash family); a mismatch shows up loudly as est=0 on hot keys in
    any gate that checks ``est >= exact``.

    Robust to probe frames that carry columns named d/col/n (the
    sketch's internal names are underscore-prefixed and renamed per-side
    before the join) and to DUPLICATE probe rows (the per-row min is
    keyed by a temporary row id, not by value-grouping, so two identical
    input rows yield two output rows — "all input columns preserved"
    means row-for-row)."""
    rid = "_cm_rid"
    pos = (
        probes.withColumn(rid, F.monotonically_increasing_id())
        .select(
            "*",
            F.explode(_pos_pairs(F.col(col), width, depth)).alias("_cm_p"),
        )
        .select(
            "*",
            F.col("_cm_p.d").alias("_cm_d"),
            F.col("_cm_p.col").alias("_cm_col"),
        )
        .drop("_cm_p")
    )
    m = merged.select(
        F.col("d").alias("_cm_d"),
        F.col("col").alias("_cm_col"),
        F.col("n").alias("_cm_n"),
    )
    hit = pos.join(F.broadcast(m), ["_cm_d", "_cm_col"], "left").withColumn(
        "_cm_c", F.coalesce(F.col("_cm_n"), F.lit(0).cast("long"))
    )
    others = [c for c in probes.columns if c != col]
    return (
        hit.groupBy(rid)
        .agg(
            F.min("_cm_c").alias("est"),
            *[F.first(c).alias(c) for c in [col, *others]],
        )
        .select(col, *others, "est")
    )


def cm_error_bound(total: int, width: int = CMS_WIDTH) -> int:
    """The classic per-probe overcount bound eps*N with eps = e/width
    (holds per probe with probability >= 1 - e^-depth)."""
    return int(math.ceil(math.e * total / width))
