"""Mergeable fixed-grid histogram sketch for quantiles — the RELATIONAL
quantile sketch the ``functions/cms.py`` design language calls for:
per-group bin-count tables whose merge is plain element-wise ADDITION
(one ``groupBy(bin).sum``), so partials from any partitioning — sources,
shards, or arriving microbatches — combine associatively and exactly.
This is the capability ``percentile_approx`` cannot express: Spark's
Greenwald-Khanna sketch lives inside an opaque aggregation buffer with
no SQL-level merge, so there is no way to PERSIST per-source /
per-batch quantile state and roll it up later.  A histogram over a
fixed grid is the classic answer (every metrics store does this), and
for bounded-domain metrics like document lengths it is near-lossless.

Contract: for a nonnegative integer metric column, ``bin =
min(value div W, NBINS - 1)`` (the last bin absorbs the clamped tail).
The sketch state per group is <= NBINS rows of (bin, n) — fixed-size
regardless of row count OR domain size.  A q-quantile estimate is the
first bin whose cumulative count reaches rank ``ceil(q * N)``; the
histogram guarantee — the exact q-quantile lies INSIDE that bin's
``[lo, hi)`` range — is exact arithmetic over exact counts, so the
gate flag is deterministic in both engines (the approx_quantile_gate
pattern, which keeps the query oracle-bearing).

Rank convention (shared by estimate and referee): ``r = ceil(q_pm * N
/ 1000)`` computed as ``(q_pm * N + 999) div 1000`` — pure integers,
and the q-quantile (discrete, lower) is the value at rank r in sorted
order, i.e. the smallest value whose cumulative frequency reaches r.

Scale shape (100 TB): ONE combiner-friendly shuffle keyed by
(group, bin) — at most groups x NBINS rows move; the merge, cumsum
window, and probe join all run on <= NBINS-row frames (the window's
single-partition sort is over 64 rows, not the corpus).  The exact
referee side is a value-frequency table (bounded by the metric's
distinct-value count), never a global sort of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 64 bins of width 16 cover [0, 1024) — document n_chars tops out ~550
#: at driver scale and ~850 in the suffixed x1000 corpora; the clamped
#: last bin absorbs any tail without losing the sketch contract.
HQ_NBINS = 64
HQ_BIN_W = 16

#: probed quantiles in per-mille (integers keep every rank exact).
HQ_PROBE_PM = (250, 500, 750, 900, 990)


def hist_partials(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group histogram partials ``(group_cols..., bin, n)`` — the
    persisted sketch state: <= NBINS rows per group, one combiner-
    friendly shuffle."""
    bin_col = F.least(
        F.expr(f"cast({value_col} as bigint) div {HQ_BIN_W}"),
        F.lit(HQ_NBINS - 1).cast("long"),
    )
    return (
        df.select(*group_cols, bin_col.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def hist_merge(partials: DataFrame) -> DataFrame:
    """Merge partials across every grouping: element-wise addition —
    associative, commutative, split-invariant by construction."""
    return partials.groupBy("bin").agg(F.sum("n").cast("long").alias("n"))


def hist_quantile_bins(merged: DataFrame) -> DataFrame:
    """Locate each probed quantile's bin: cumulative counts over the
    <= NBINS merged rows (the window sorts 64 rows, not the corpus),
    then for each q_pm the first bin whose cumsum reaches rank
    ``ceil(q_pm * N / 1000)``.  Returns (q_pm, r, est_bin, est_lo,
    est_hi) — all BIGINT.

    Delegates to the group-keyed locator under one constant group so the
    rank convention and the min-bin selection live in exactly ONE place
    — a convention fix cannot fork the grouped and ungrouped paths."""
    return hist_quantile_bins_by(
        merged.withColumn("_g", F.lit(1)), ["_g"]
    ).drop("_g")


def hist_quantile_bins_by(
    partials: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Per-GROUP quantile-bin location over per-group sketch partials —
    ``hist_quantile_bins`` with the cumsum window, total, and probe join
    all keyed by ``group_cols`` (each group's frame is still <= NBINS
    rows, so the window sort is 64 rows per group, never the corpus).
    Returns (group_cols..., q_pm, r, est_bin, est_lo, est_hi)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = partials.select(
        *group_cols, "bin", "n", F.sum("n").over(w).cast("long").alias("cum")
    )
    total = partials.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n_total")
    )
    probes = total.select(
        *group_cols,
        F.explode(F.array(*[F.lit(p) for p in HQ_PROBE_PM])).alias("q_pm"),
        "n_total",
    ).select(
        *group_cols,
        "q_pm",
        F.expr("(q_pm * n_total + 999) div 1000").alias("r"),
    )
    return (
        probes.join(cum, [*group_cols], "inner")
        .where(F.col("cum") >= F.col("r"))
        .groupBy(*group_cols, "q_pm", "r")
        .agg(F.min("bin").alias("est_bin"))
        .select(
            *group_cols,
            "q_pm",
            "r",
            "est_bin",
            (F.col("est_bin") * HQ_BIN_W).alias("est_lo"),
            ((F.col("est_bin") + 1) * HQ_BIN_W).alias("est_hi"),
        )
    )
