"""Temporal-warehouse surface, round-12 additions: CDC last-writer-wins
log replay (the Delta/Iceberg MERGE-with-tombstones class), OHLC time-bar
resampling, an exact-integer trailing-window anomaly gate built on the
interval RANGE frame machinery, and NTILE equi-depth bucketing.

These extend the round-11 temporal family (gap-fill LOCF, SCD2 builds,
point-in-time join — queries/relational.py); the reference engine has no
temporal surface at all (its sink is append-only, DSGT.py:118), so these
are engine-completeness operators, not reference ports.

Determinism discipline (registry.py): every money value is quantized to
BIGINT cents before aggregation; every ordered pick carries a total-order
tiebreaker (event_id / o_orderkey are unique); the anomaly gate compares
exact integer cross-products instead of float z-scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seisdb_spark.queries.registry import query
from seisdb_spark.sources.tables import load_table

# --- CDC last-writer-wins log replay ----------------------------------------
# The orders table read as a change-data-capture log: key = o_custkey,
# sequence = (o_orderdate, o_orderkey) (orderkey is unique, so the
# sequence is a total order per key), op = DELETE when o_orderstatus is
# 'F' (a closed account tombstone) else UPSERT carrying the cents
# payload.  Replaying the log yields the current snapshot: each key's
# LATEST record wins, and a key whose latest record is a tombstone is
# absent from the snapshot.  This is the compaction every CDC consumer
# (Debezium -> lakehouse MERGE) runs; Spark expresses it as ONE
# combiner-friendly aggregate, not an iterative MERGE loop.


def cdc_log(orders: DataFrame) -> DataFrame:
    """The CDC view of orders: key, total-order sequence, op, payload.
    Shared by the batch snapshot and the streaming twin so the tombstone
    rule can never fork between them."""
    return orders.select(
        "o_custkey",
        F.struct(
            F.col("o_orderdate").alias("ts"),
            F.col("o_orderkey").alias("seq"),
            (F.col("o_orderstatus") == "F").cast("int").alias("is_delete"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        ).alias("rec"),
    )


def cdc_compact(log: DataFrame) -> DataFrame:
    """Per-key last-writer-wins partial: max over the (ts, seq)-leading
    record struct + a version count.  max() and count() are both
    associative, so per-microbatch partials produced by this same stage
    merge to the identical snapshot (the streaming twin's invariant)."""
    return log.groupBy("o_custkey").agg(
        F.max("rec").alias("rec"),
        F.count(F.lit(1)).alias("n_versions"),
    )


def cdc_snapshot(partials: DataFrame) -> DataFrame:
    """Merge compacted partials (idempotent over already-compacted input:
    the second groupBy on the same key adds no exchange under AQE) and
    unpack the winning record, dropping tombstoned keys."""
    merged = partials.groupBy("o_custkey").agg(
        F.max("rec").alias("rec"),
        F.sum("n_versions").alias("n_versions"),
    )
    return merged.filter(F.col("rec.is_delete") == 0).select(
        "o_custkey",
        F.col("rec.ts").alias("last_ts"),
        F.col("rec.seq").alias("last_orderkey"),
        F.col("rec.cents").alias("totalprice_cents"),
        F.col("n_versions").cast("bigint").alias("n_versions"),
    )


_CDC_ORACLE = """
    WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_delete,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), latest AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn,
               count(*) OVER (PARTITION BY o_custkey) AS n_versions
        FROM log
    )
    SELECT o_custkey,
           o_orderdate AS last_ts,
           o_orderkey AS last_orderkey,
           cents AS totalprice_cents,
           CAST(n_versions AS BIGINT) AS n_versions
    FROM latest
    WHERE rn = 1 AND is_delete = 0
"""


@query(
    "cdc_snapshot_apply",
    oracle=_CDC_ORACLE,
    doc="CDC LAST-WRITER-WINS LOG REPLAY (the MERGE-with-tombstones class "
    "— Debezium-to-lakehouse compaction; completes the temporal family "
    "next to SCD2, which keeps ALL versions where this keeps the "
    "latest): orders form a change log keyed by customer with sequence "
    "(o_orderdate, o_orderkey) and op DELETE on status 'F'; the snapshot "
    "is each key's latest record, tombstoned keys absent, plus the "
    "replayed version count.  The oracle is the textbook row_number()-"
    "DESC pick; the Spark plan deliberately is NOT: a per-key window "
    "sorts every version by the full sequence, while last-writer-wins "
    "needs only the MAX of the (ts, seq)-leading record struct — ONE "
    "exchange with map-side partial maxima (struct max plans as "
    "SortAggregate; its pre-exchange sort is by the GROUP KEY only, "
    "never the version sequence), the shape that scales to a 100 TB "
    "log because partials collapse each map task's keys before the "
    "shuffle.  Struct max is safe as "
    "the argmax here because o_orderkey is unique per key — the struct "
    "comparison never reaches the payload fields.",
    bench=True,
)
def cdc_snapshot_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return cdc_snapshot(cdc_compact(cdc_log(orders)))


# --- OHLC time-bar resampling ------------------------------------------------


@query(
    "ohlc_time_bars",
    oracle="""
        WITH e AS (
            SELECT event_type, date_trunc('hour', ts) AS bar_ts,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   ts, event_id
            FROM events
        ), r AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY event_type, bar_ts
                       ORDER BY ts, event_id
                   ) AS ra,
                   row_number() OVER (
                       PARTITION BY event_type, bar_ts
                       ORDER BY ts DESC, event_id DESC
                   ) AS rd
            FROM e
        )
        SELECT event_type, bar_ts,
               CAST(max(CASE WHEN ra = 1 THEN cents END) AS BIGINT)
                   AS open_cents,
               CAST(max(cents) AS BIGINT) AS high_cents,
               CAST(min(cents) AS BIGINT) AS low_cents,
               CAST(max(CASE WHEN rd = 1 THEN cents END) AS BIGINT)
                   AS close_cents,
               count(*) AS n_events,
               CAST(sum(cents) AS BIGINT) AS vol_cents
        FROM r
        GROUP BY 1, 2
    """,
    doc="OHLC TIME-BAR RESAMPLING (the irregular-ticks-to-regular-bars "
    "downsampling every time-series store ships; the batch form of a "
    "candlestick rollup): per (event_type, hour) — open/close = the "
    "cents value at the (ts, event_id)-first/last tick, high/low/count/"
    "volume the plain extrema.  The oracle picks open/close with two "
    "row_number() windows (engine-portable SQL); the Spark plan "
    "deliberately does NOT window: min/max over the (ts, event_id, "
    "cents) struct IS the argmin/argmax because event_id is unique — so "
    "the whole bar is ONE aggregate exchange with map-side partials "
    "(struct extrema plan as SortAggregate; the pre-exchange sort is by "
    "the bar KEY only, never within-bar tick order), the shape that "
    "holds when one hot bar holds a billion ticks.  All outputs are "
    "exact BIGINT cents.",
    bench=True,
)
def ohlc_time_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return ohlc_bars(ohlc_partials(events))


def ohlc_partials(events: DataFrame) -> DataFrame:
    """Per-(type, hour) OHLC partial: first/last tick structs, extrema,
    count, volume.  Shared by the batch query and the streaming twin —
    every field merges associatively (struct min/max, min/max, sum), so
    per-microbatch partials produced by this same stage compact to the
    identical bar table."""
    cents = F.round(F.col("value") * 100).cast("bigint")
    tick = F.struct("ts", "event_id", cents.alias("cents"))
    return (
        events.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("bar_ts"),
            cents.alias("cents"),
            tick.alias("tick"),
        )
        .groupBy("event_type", "bar_ts")
        .agg(
            F.min("tick").alias("first_tick"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max("tick").alias("last_tick"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("vol_cents"),
        )
    )


def ohlc_bars(partials: DataFrame) -> DataFrame:
    """Merge OHLC partials (idempotent over already-compacted input) and
    unpack open/close from the winning tick structs."""
    return (
        partials.groupBy("event_type", "bar_ts")
        .agg(
            F.min("first_tick").alias("first_tick"),
            F.max("high_cents").alias("high_cents"),
            F.min("low_cents").alias("low_cents"),
            F.max("last_tick").alias("last_tick"),
            F.sum("n_events").alias("n_events"),
            F.sum("vol_cents").alias("vol_cents"),
        )
        .select(
            "event_type",
            "bar_ts",
            F.col("first_tick.cents").alias("open_cents"),
            "high_cents",
            "low_cents",
            F.col("last_tick.cents").alias("close_cents"),
            "n_events",
            "vol_cents",
        )
    )


# --- trailing-window anomaly gate ---------------------------------------------


@query(
    "anomaly_trailing_zscore",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ), w AS (
            SELECT *,
                   count(*) OVER win AS n,
                   CAST(sum(cents) OVER win AS BIGINT) AS s,
                   CAST(sum(cents * cents) OVER win AS BIGINT) AS q
            FROM e
            WINDOW win AS (PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN INTERVAL '7' DAY PRECEDING
                                 AND CURRENT ROW)
        )
        SELECT user_id, event_id, ts, cents,
               CAST(n AS BIGINT) AS win_n,
               CAST((n * cents - s) * (n * cents - s) AS BIGINT) AS dev_sq,
               CAST(4 * (n * q - s * s) AS BIGINT) AS gate_sq
        FROM w
        WHERE n >= 8
          AND (n * cents - s) * (n * cents - s) > 4 * (n * q - s * s)
    """,
    doc="TRAILING-WINDOW ANOMALY GATE (streaming-style outlier detection "
    "expressed in batch — the 'flag values beyond k sigma of their own "
    "trailing week' rule, on the round-12 interval RANGE frame "
    "machinery): per user, each event's trailing-7-day window supplies "
    "count n, sum s, and sum-of-squares q in ONE sliding frame per user "
    "partition (one shuffle, no self-join of the stream against its "
    "history); the event is anomalous when z^2 > 4 (|x - mean| > 2 "
    "sigma) with n >= 8 support.  The float z-score is never computed: "
    "z^2 > k^2 is cross-multiplied to the exact BIGINT comparison "
    "(n*x - s)^2 > k^2 * (n*q - s^2) — bit-identical across engines, no "
    "epsilon, no sqrt.  (Overflow headroom: every term is bounded by "
    "(n * max|cents|)^2, so the gate is exact while n * max|cents| < "
    "3e9 per window — e.g. 60k events of <= 5e4 cents in one user's "
    "trailing week, ~2000x the densest driver stream; past that, "
    "quantize to coarser units BEFORE the gate.  Spark runs ANSI-off "
    "and would wrap silently where DuckDB raises, which is why the "
    "bound is stated here rather than discovered.)  The RANGE frame is "
    "peer-inclusive, so same-instant ties share one frame and the gate "
    "is frame-order-independent — about 5 percent of sf0.01 events "
    "flag, so a broken frame bound or a bag/distinct slip is loudly "
    "visible in the hash.",
    bench=True,
)
def anomaly_trailing_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86_400_000_000, 0)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    e = events.select("user_id", "event_id", "ts", cents.alias("cents"))
    w = e.select(
        "*",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("cents").over(win).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("q"),
    )
    dev = F.col("n") * F.col("cents") - F.col("s")
    var4 = F.lit(4) * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return (
        w.filter((F.col("n") >= 8) & (dev * dev > var4))
        .select(
            "user_id",
            "event_id",
            "ts",
            "cents",
            F.col("n").cast("bigint").alias("win_n"),
            (dev * dev).cast("bigint").alias("dev_sq"),
            var4.cast("bigint").alias("gate_sq"),
        )
    )


# --- NTILE equi-depth bucketing -----------------------------------------------


@query(
    "ntile_price_deciles",
    oracle="""
        WITH d AS (
            SELECT o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   ntile(10) OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                                o_orderkey
                   ) AS decile
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(decile AS BIGINT) AS decile,
               count(*) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(min(cents) AS BIGINT) AS lo_cents,
               CAST(max(cents) AS BIGINT) AS hi_cents
        FROM d
        GROUP BY 1, 2
    """,
    doc="NTILE EQUI-DEPTH BUCKETING (completes the ranking-function "
    "family: rank/dense_rank/percent_rank live in "
    "rank_distribution_customers; ntile is the one with ASSIGNMENT "
    "semantics — equal-count buckets, earlier buckets take the "
    "remainder): per order priority, orders split into price deciles "
    "(total order: cents then o_orderkey, so bucket boundaries are "
    "deterministic), then per-decile count/sum/min/max in exact cents.  "
    "NTILE's bucket-size rule (ceil for the first n%10 buckets, floor "
    "after) is ANSI-fixed and identical across engines — the decile "
    "edges themselves are part of the value hash.  One shuffle for the "
    "window, and the decile aggregate reuses the window's partitioning "
    "(priority-prefixed keys are co-located).",
    bench=True,
)
def ntile_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy(
        cents, F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            cents.alias("cents"),
            F.ntile(10).over(w).cast("bigint").alias("decile"),
        )
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


# --- time-weighted average (TWAP) ---------------------------------------------


@query(
    "twap_daily_value",
    oracle="""
        WITH e AS (
            SELECT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   ts, event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ), d AS (
            SELECT user_id, day, cents,
                   epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dwell_us
            FROM e
            WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)
        )
        SELECT user_id, day,
               count(*) AS n_events,
               CAST(coalesce(sum(cents * dwell_us), 0) AS BIGINT)
                   AS twap_num,
               CAST(coalesce(sum(dwell_us), 0) AS BIGINT) AS active_us
        FROM d
        GROUP BY 1, 2
    """,
    doc="TIME-WEIGHTED AVERAGE (TWAP — the interval-weighted aggregation "
    "class OHLC's tick-weighted bars do not cover: a value that held for "
    "23 hours must outweigh one that held for a second): per (user, "
    "day), each event's cents value is weighted by its LOCF dwell time "
    "(micros until the user's next event that day; the day's last event "
    "carries zero dwell — the open interval is not yet observable, the "
    "same honesty rule as SCD2's NULL valid_to).  Returned as the exact "
    "BIGINT fraction (twap_num, active_us) rather than a rounded "
    "quotient, so the result hashes and consumers choose their own "
    "division precision — the num/den discipline the BM25 fixed-point "
    "stack established.  Shape: ONE (user, day)-keyed exchange shared "
    "by the lead() window and the aggregate (user-prefixed keys are "
    "co-located); dwell products stay under 2^62 for any cents <= 5e4 "
    "and day-bounded dwell <= 8.64e10 us.",
    bench=True,
)
def twap_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    e = events.select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        "ts",
        "event_id",
        cents.alias("cents"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    d = e.select(
        "user_id",
        "day",
        "cents",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias(
            "dwell_us"
        ),
    )
    return d.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.coalesce(F.sum(F.col("cents") * F.col("dwell_us")), F.lit(0))
        .cast("bigint")
        .alias("twap_num"),
        F.coalesce(F.sum("dwell_us"), F.lit(0))
        .cast("bigint")
        .alias("active_us"),
    )
