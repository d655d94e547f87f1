"""SURVEY.md §2 operator inventory, expressed as oracle-checkable queries
over the driver's parquet tables.

Each query re-expresses one reference operator's *semantics* on the driver
testdata (the reference's own tables are seismic binaries; the driver oracle
runs on the TPC-H-ish tables, so each operator shape is demonstrated there).
The real seismic pipeline composition lives in ``seisdb_spark.pipeline``.

Scale notes are in each docstring: every query here is shuffle-minimal and
collect-free; dimension sides of joins are broadcast; ordered computations
are partitioned by a key (never a global sort) unless the operator itself is
inherently sequential — those are flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seisdb_spark.queries.registry import query
from seisdb_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# P3 — temporal stride + existence predicate (DDBbase.py:55-84)
# ---------------------------------------------------------------------------
@query(
    "p3_stride_filter",
    oracle="""
        SELECT event_id, user_id, event_type
        FROM events
        WHERE event_id % 50 = 0
    """,
    doc="Temporal sub-sampling: keep every dstep-th snapshot "
    "(reference DDBbase.py:55-84, the 98%-reduction stage). Stride predicate "
    "is pushed to the parquet scan; no shuffle.",
    bench=False,
)
def p3_stride_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") % 50 == 0).select("event_id", "user_id", "event_type")


# ---------------------------------------------------------------------------
# J3 — 3-way step alignment ("present in N and E and Z", DDBbase.py:71-80)
# ---------------------------------------------------------------------------
@query(
    "j3_step_alignment",
    oracle="""
        SELECT user_id
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase')
        GROUP BY user_id
        HAVING count(DISTINCT event_type) = 3
    """,
    doc="A step is valid only if present in all 3 force directories "
    "(DDBbase.py:71-80) — 3-way inner-join semantics expressed as "
    "groupBy + count(distinct)==3. One shuffle on the key; partial "
    "aggregation map-side.",
)
def j3_step_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("n_types"))
        .filter(F.col("n_types") == 3)
        .select("user_id")
    )


# ---------------------------------------------------------------------------
# P1 — positional projection (27-of-125 GLL sub-sampling,
#      DSEM_Utils/__init__.py:6-8 applied at ibool_reader.py:163-167)
# ---------------------------------------------------------------------------
@query(
    "p1_positional_projection",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_linenumber IN (1, 3, 5, 7)
    """,
    doc="Spatial sub-sampling: select fixed positions from each element "
    "(INDEX27 isin-filter; reference ibool_reader.py:163-167). The IN-list "
    "is a pushed-down predicate — no shuffle, rows never leave the scan.",
)
def p1_positional_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber").isin(1, 3, 5, 7)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# ---------------------------------------------------------------------------
# D1 — first-occurrence dedup (ibool_reader.py:116-173), order-independent
#      window form (SURVEY §2.4: canonical semantics)
# ---------------------------------------------------------------------------
@query(
    "d1_first_occurrence_dedup",
    oracle="""
        SELECT l_partkey, l_orderkey, l_linenumber
        FROM (
            SELECT l_partkey, l_orderkey, l_linenumber,
                   row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_orderkey, l_linenumber
                   ) AS rn
            FROM lineitem
        )
        WHERE rn = 1
    """,
    doc="Keep the first (i_spec,i_gll) occurrence of each gll_id "
    "(reference ibool_reader.py:116-141). Window row_number==1 per key — "
    "one shuffle on the dedup key; at 100 TB this is the "
    "min_by(struct(...)) groupBy form, which partial-aggregates map-side.",
)
def d1_first_occurrence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy("l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# D1b — the reference's *literal* running-max semantics
#       (ibool_reader.py:136: keep a cell only if its id exceeds the running
#       max — a strictly-increasing-subsequence scan)
# ---------------------------------------------------------------------------
@query(
    "d1_running_max_dedup",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey
        FROM (
            SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
                   max(l_partkey) OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_orderkey, l_linenumber, l_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_max
            FROM lineitem
        )
        WHERE prev_max IS NULL OR l_partkey > prev_max
    """,
    doc="The reference's literal dedup: running-max scan in row-major order "
    "(ibool_reader.py:136,168). Order-dependent by design — but the scan is "
    "per processor slice (one ibool file at a time), so the faithful AND "
    "scale-safe form is a running max per slice key (here l_suppkey as the "
    "proc proxy): one shuffle on the key, each partition's scan independent, "
    "never a global single-partition sort.",
)
def d1_running_max_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        li.withColumn("prev_max", F.max("l_partkey").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("l_partkey") > F.col("prev_max")))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
    )


# ---------------------------------------------------------------------------
# J1 — index-gather as broadcast equi-join (DSGT.py:109-111)
# ---------------------------------------------------------------------------
@query(
    "j1_gather_join",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, p.p_partkey,
               round(l.l_extendedprice - p.p_retailprice, 2) AS price_delta
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="numpy fancy-index gather == equi-join of the small selected-points "
    "dimension against the fact stream (DSGT.py:109-111). The dimension side "
    "is broadcast() — at 100 TB the fact side streams through unshuffled.",
    bench=True,
)
def j1_gather_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey",
        "l_linenumber",
        "p_partkey",
        F.round(F.col("l_extendedprice") - F.col("p_retailprice"), 2).alias("price_delta"),
    )


# ---------------------------------------------------------------------------
# J2 — id-gather as semi-join (DDGF.py:107-108)
# ---------------------------------------------------------------------------
@query(
    "j2_semi_gather",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    """,
    doc="DGF id-gather: keep displacement rows whose gll_id is in the "
    "selected set (DDGF.py:107-108) — a left-semi join; the id set is "
    "broadcast, fact side unshuffled.",
)
def j2_semi_gather(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ids = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return orders.join(
        F.broadcast(ids), orders.o_orderkey == ids.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# A1/A2 — per-group min-offset / max-scale normalization
#         (DSGT.py:138-146; zero-scale guard per SURVEY §2.5 A2)
# ---------------------------------------------------------------------------
@query(
    "a1a2_group_normalize",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey,
               (l_extendedprice - mn) /
                   (CASE WHEN mx = mn THEN 1.0 ELSE mx - mn END) AS norm_price
        FROM (
            SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
                   min(l_extendedprice) OVER (PARTITION BY l_partkey) AS mn,
                   max(l_extendedprice) OVER (PARTITION BY l_partkey) AS mx
            FROM lineitem
        )
    """,
    doc="Offset-min then scale-max normalization per gll point "
    "(DSGT.py:138-146), with the scale==0 constant-series guard the "
    "reference lacks (SURVEY §2.5 A2). Single window over the group key — "
    "one shuffle, no self-join. Pure float64 arithmetic: bit-identical to "
    "the oracle, no rounding needed.",
)
def a1a2_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    mn = F.min("l_extendedprice").over(w)
    mx = F.max("l_extendedprice").over(w)
    rng = F.when(mx == mn, F.lit(1.0)).otherwise(mx - mn)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        ((F.col("l_extendedprice") - mn) / rng).alias("norm_price"),
    )


# ---------------------------------------------------------------------------
# E1 — linear quantization (DSGT.py:148-152: truncating encode, L=8)
# ---------------------------------------------------------------------------
@query(
    "e1_quantize",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(((l_extendedprice - mn) /
                   (CASE WHEN mx = mn THEN 1.0 ELSE mx - mn END)) * 255) AS INTEGER
               ) AS code
        FROM (
            SELECT l_orderkey, l_linenumber, l_extendedprice,
                   min(l_extendedprice) OVER (PARTITION BY l_partkey) AS mn,
                   max(l_extendedprice) OVER (PARTITION BY l_partkey) AS mx
            FROM lineitem
        )
    """,
    doc="8-bit truncating quantization: code = trunc(v * (2^L - 1)) "
    "(DSGT.py:148-152 — astype truncation, not rounding; error bound one "
    "full LSB). Pure column math, whole-stage-codegen'd; Spark has no "
    "unsigned types so codes ride as INT (packed to binary in the pipeline).",
)
def e1_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    mn = F.min("l_extendedprice").over(w)
    mx = F.max("l_extendedprice").over(w)
    rng = F.when(mx == mn, F.lit(1.0)).otherwise(mx - mn)
    norm = (F.col("l_extendedprice") - mn) / rng
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(norm * 255).cast("int").alias("code"),
    )


# ---------------------------------------------------------------------------
# A4 — prefix-sum byte-offset index (DSGT.py:161-170: start[i] = running sum
#      of prior compressed lengths)
# ---------------------------------------------------------------------------
@query(
    "a4_prefix_sum",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(coalesce(sum(l_quantity) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_orderkey, l_linenumber, l_quantity, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0), 2) AS start_offset
        FROM lineitem
    """,
    doc="Blob start-offset index: cumulative sum of prior lengths "
    "(DSGT.py:161-170). Exclusive-prefix window sum, partitioned per proc in "
    "the real pipeline (here per suppkey) so no global sort.",
)
def a4_prefix_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.coalesce(F.sum("l_quantity").over(w), F.lit(0.0)), 2).alias("start_offset"),
    )


# ---------------------------------------------------------------------------
# A3 — count aggregates (DSGT.py:81-84)
# ---------------------------------------------------------------------------
@query(
    "a3_counts",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n_rows,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Shape-driving counts (n_gll, n_step; DSGT.py:81-84) as "
    "count / count-distinct aggregates with map-side partial aggregation.",
)
def a3_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# L1 — point lookup (extract_element_125, ibool_reader.py:37-54)
# ---------------------------------------------------------------------------
@query(
    "l1_point_lookup",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        FROM lineitem
        WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
    """,
    doc="Read-side point query: one element's rows by key "
    "(ibool_reader.py:37-54). The lookup key is a scalar subquery "
    "(DataFrame.scalar(), Spark 4+): the plan stays fully lazy — building "
    "the query runs NO job — and at execution Catalyst runs the 1-row "
    "aggregate once, injects the result as a literal, and filters the main "
    "scan with it. When the caller knows the key (the real L1 use: a user-"
    "supplied element id), the same filter is a static literal and reaches "
    "the parquet scan as PushedFilters + row-group min/max pruning.",
)
def l1_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lookup_key = li.agg(F.min("l_orderkey")).scalar()
    return li.filter(F.col("l_orderkey") == lookup_key).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )


# ---------------------------------------------------------------------------
# R1 — ordered series assembly (DSGT.py:86-115): order-sensitive checksum
# ---------------------------------------------------------------------------
@query(
    "r1_series_assembly",
    oracle="""
        SELECT l_suppkey,
               count(*) AS n_samples,
               round(sum(l_quantity * rn), 2) AS ordered_checksum
        FROM (
            SELECT l_suppkey, l_quantity,
                   row_number() OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_orderkey, l_linenumber, l_quantity, l_partkey
                   ) AS rn
            FROM lineitem
        )
        GROUP BY l_suppkey
    """,
    doc="4-D tensor assembly (DSGT.py:86-115) = per-key time-ordered array "
    "build; verified via an order-sensitive checksum (sum of value x "
    "position). In the pipeline this is "
    "sort_array(collect_list(struct(step,value))) — deterministic order is "
    "the top silent-wrongness risk (SURVEY §7) and this query guards it.",
    bench=True,
)
def r1_series_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_orderkey", "l_linenumber", "l_quantity", "l_partkey"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.round(F.sum(F.col("l_quantity") * F.col("rn")), 2).alias("ordered_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# R2 — canonical fixed-order flatten (DSGT.py:128-135 / DDGF.py:125-132):
#      per key, channels emitted in one fixed order
# ---------------------------------------------------------------------------
@query(
    "r2_canonical_flatten",
    oracle="""
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        FROM events
        GROUP BY user_id
    """,
    doc="Per-point channel flatten in a fixed canonical (force, para) order "
    "(SURVEY §2.6 R2 — the reference's SGT/DGF disagree on axis order; we fix "
    "one). Expressed as a fixed-column conditional pivot — single shuffle.",
)
def r2_canonical_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return events.groupBy("user_id").agg(*aggs)


# ===========================================================================
# Standard relational surface the reference lacks (SURVEY §2.3/§2.5/§2.10
# "absent" statements) — exposed via built-in Spark, zero custom code.
# ===========================================================================


@query(
    "tpch_q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filter + multi-aggregate groupBy. Two-phase "
    "hash aggregation (map-side partial) — the canonical 100 TB agg plan.",
    bench=True,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "multi_join_revenue_by_nation",
    oracle="""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 5-way join + agg. Catalyst reorders; customer/"
    "supplier/nation are broadcast (dimension tables), so only the "
    "orders-lineitem join shuffles — one big shuffle at 100 TB.",
    bench=True,
)
def multi_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "topk_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rk
            FROM orders
        )
        WHERE rk <= 3
    """,
    doc="Top-k per group via ranking window (absent in reference, "
    "SURVEY §2.10). row_number<=k avoids a global sort; one shuffle on the "
    "group key.",
    bench=True,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "rollup_revenue",
    oracle="""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Grouping-sets machinery the reference lacks (SURVEY §2.5 absent "
    "list): ROLLUP with coalesced grouping columns. Spark expands grouping "
    "sets into a single shuffle.",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_base_price",
            "n_rows",
        )
    )


@query(
    "setop_customers_without_orders",
    oracle="""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
    """,
    doc="Set operations (absent in reference, SURVEY §2.10): EXCEPT "
    "(distinct). Spark plans this as a left-anti aggregate join.",
)
def setop_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.select("c_custkey").subtract(
        orders.select(F.col("o_custkey").alias("c_custkey"))
    )


@query(
    "date_monthly_revenue",
    oracle="""
        SELECT date_trunc('month', o_orderdate) AS order_month,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY date_trunc('month', o_orderdate)
    """,
    doc="Date/time functions (absent in reference — its time is an integer "
    "step + dt scalar, SURVEY §2.9): date_trunc bucketing + agg.",
)
def date_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "json_props_extract",
    oracle="""
        SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k,
               count(*) AS n,
               round(avg(value), 4) AS avg_value
        FROM events
        GROUP BY 1
    """,
    doc="JSON functions (absent in reference, SURVEY §2.9): "
    "get_json_object on the events.props JSON column (oracle uses a regexp "
    "twin so it stays ANSI).",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(F.get_json_object("props", "$.k").cast("int").alias("k"), "value")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


@query(
    "asof_last_click_before_purchase",
    oracle="""
        SELECT event_id, user_id, ts AS purchase_ts, last_click_ts
        FROM (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                       OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ) AS last_click_ts
            FROM (SELECT event_id, user_id, event_type,
                         CAST(ts AS TIMESTAMP) AS ts
                  FROM events)
        )
        WHERE event_type = 'purchase'
    """,
    doc="As-of join (absent in reference, SURVEY §2.3): for each purchase, "
    "the most recent strictly-prior click by the same user — the window-merge "
    "formulation (no pairwise join), which scales as one shuffle on user_id.",
    bench=True,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        events.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "last_click_ts")
    )


@query(
    "sessionize_events",
    oracle="""
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end
        FROM (
            SELECT user_id, ts,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) IS NULL
                              OR ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_new
                FROM (SELECT user_id, event_id,
                             CAST(ts AS TIMESTAMP) AS ts
                      FROM events)
            )
        )
        GROUP BY user_id, session_id
    """,
    doc="Session windows in batch form (streaming variant in "
    "seisdb_spark.streaming): gap>30min starts a new session; lag + running "
    "sum per user. One shuffle on user_id.",
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_order)
    is_new = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
            > 30 * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    return (
        events.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(w_run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "tumbling_window_counts",
    oracle="""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="Tumbling event-time window aggregation (batch twin of the "
    "Structured Streaming query in seisdb_spark.streaming): F.window 1-hour "
    "buckets == date_trunc('hour').",
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# Flagship: the SGT encode pipeline shape as ONE query over lineitem
# (stride filter -> group normalize -> quantize -> ordered assembly),
# mirroring SURVEY §7's minimum end-to-end slice on driver data.
# ---------------------------------------------------------------------------
@query(
    "sgt_flagship_encode",
    oracle="""
        SELECT l_partkey,
               count(*) AS n_samples,
               min(l_extendedprice) AS offset_min,
               max(l_extendedprice) - min(l_extendedprice) AS scale_factor,
               CAST(sum(code * rn) AS BIGINT) AS ordered_code_checksum
        FROM (
            SELECT l_partkey, l_extendedprice,
                   CAST(floor(((l_extendedprice - mn) /
                       (CASE WHEN mx = mn THEN 1.0 ELSE mx - mn END)) * 255) AS INTEGER) AS code,
                   row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_orderkey, l_linenumber, l_extendedprice
                   ) AS rn
            FROM (
                SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
                       min(l_extendedprice) OVER (PARTITION BY l_partkey) AS mn,
                       max(l_extendedprice) OVER (PARTITION BY l_partkey) AS mx
                FROM lineitem
                WHERE l_orderkey % 2 = 0
            )
        )
        GROUP BY l_partkey
    """,
    doc="Flagship: the reference's whole encode path as one declarative "
    "query — temporal stride (P3) -> per-key min/max normalize (A1/A2, with "
    "zero-scale guard) -> truncating 8-bit quantize (E1) -> order-sensitive "
    "assembly checksum (R1/R2). One scan, one shuffle on the group key, all "
    "whole-stage-codegen.",
    bench=True,
)
def sgt_flagship_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 2 == 0)
    w = Window.partitionBy("l_partkey")
    mn = F.min("l_extendedprice").over(w)
    mx = F.max("l_extendedprice").over(w)
    rng = F.when(mx == mn, F.lit(1.0)).otherwise(mx - mn)
    code = F.floor(((F.col("l_extendedprice") - mn) / rng) * 255).cast("int")
    w_rn = Window.partitionBy("l_partkey").orderBy(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return (
        li.select(
            "l_partkey",
            "l_extendedprice",
            code.alias("code"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.min("l_extendedprice").alias("offset_min"),
            (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("scale_factor"),
            F.sum(F.col("code") * F.col("rn")).alias("ordered_code_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Standard operator categories the reference lacks (SURVEY §2.3/§2.5/§2.10
# "absent" lists) — exposed as first-class engine surface.
# ---------------------------------------------------------------------------
@query(
    "range_join_value_bands",
    oracle="""
        WITH bands AS (
            SELECT i AS band_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
            FROM (SELECT unnest(generate_series(0, 9)) AS i)
        )
        SELECT band_id,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events e JOIN bands b
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY band_id
    """,
    doc="Range (interval/theta) join — absent in the reference (SURVEY "
    "§2.3): events banded by a non-equi condition against a tiny generated "
    "band table. Spark broadcasts the 10-row band side "
    "(BroadcastNestedLoopJoin) so the fact scan streams unshuffled — the "
    "right plan whenever one side of a theta join is dimension-sized.",
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bands = spark.range(10).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 50.0).alias("lo"),
        ((F.col("id") + 1) * 50.0).alias("hi"),
    )
    joined = events.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "grouping_sets_orders",
    oracle="""
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    doc="GROUPING SETS — absent in the reference (SURVEY §2.5): two "
    "independent groupings in ONE shuffle (Spark's Expand + single "
    "aggregate), vs running two groupBys and unioning.",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "sum_price",
        )
    )


@query(
    "outer_join_nation_activity",
    oracle="""
        WITH s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
                   FROM supplier GROUP BY s_nationkey),
             c AS (SELECT c_nationkey AS nk, count(*) AS n_customers
                   FROM customer GROUP BY c_nationkey)
        SELECT coalesce(s.nk, c.nk) AS nationkey,
               coalesce(n_suppliers, 0) AS n_suppliers,
               coalesce(n_customers, 0) AS n_customers
        FROM s FULL OUTER JOIN c ON s.nk = c.nk
    """,
    doc="FULL OUTER join — absent in the reference (SURVEY §2.3 absent-join "
    "list): per-nation supplier vs customer counts, keys coalesced. Both "
    "sides pre-aggregated so the outer join runs on dimension-sized inputs.",
)
def outer_join_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    cus = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return (
        sup.join(cus, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )


@query(
    "approx_distinct_parts",
    oracle="""
        SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               1 AS approx_within_bound,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
    """,
    doc="approx_count_distinct (HyperLogLog++) — the sketch aggregate the "
    "reference lacks (SURVEY §2.5 absent list). At 100 TB an exact "
    "countDistinct shuffles every distinct key; the sketch is "
    "constant-memory per partition and merges map-side. Engine-specific "
    "sketch values can't hash-match a DuckDB oracle directly, so the hard "
    "gate is: Spark returns the EXACT count plus a 0/1 flag asserting the "
    "sketch is within 3x the configured rsd of it; the oracle returns the "
    "exact count and literal 1. A broken sketch flips the flag and fails "
    "the driver's value hash (int, not boolean — engines agree on int "
    "renderings unconditionally).",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.01
    return li.agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 3 * rsd * F.col("exact_parts")
        )
        .cast("int")
        .alias("approx_within_bound"),
        "n_rows",
    )


# ---------------------------------------------------------------------------
# Reshaping + window-frame + set-op breadth (SURVEY §2.10 absent-operator
# list): pivot, unpivot, moving frames, rank distributions, lateral explode,
# INTERSECT. None exist in the reference (its reshape is the fixed R1/R2
# tensor assembly); these are the standard analytics surface a user switching
# engines expects.
# ---------------------------------------------------------------------------
@query(
    "pivot_status_counts",
    oracle="""
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
               count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="PIVOT (long -> wide): order counts per priority x status. The "
    "pivot values are given explicitly so Spark skips the extra "
    "distinct-values job and plans ONE shuffle (pivot_first partial-aggs "
    "map-side) — at 100 TB an unlisted pivot would scan the data twice.",
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@query(
    "unpivot_part_metrics",
    oracle="""
        SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
        FROM part
    """,
    doc="UNPIVOT (wide -> long) via the native unpivot operator (Expand "
    "node): each input row fans out to one row per metric in a single "
    "scan-side projection — no shuffle, no join, values pass through "
    "unchanged (exact float equality with the UNION ALL oracle).",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "window_frame_moving_sum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 2) AS moving_sum_3
        FROM orders
    """,
    doc="Sliding ROWS-frame aggregate: per-customer 3-order moving spend. "
    "One shuffle on o_custkey, then a bounded frame evaluated in one pass "
    "per partition; (o_orderdate, o_orderkey) is a total order so the frame "
    "contents are deterministic. Rounded on both sides (engines may "
    "accumulate the frame sum in different association orders).",
)
def window_frame_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("moving_sum_3"),
    )


@query(
    "rank_distribution_customers",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 9) AS pct_rank,
               round(cume_dist() OVER w, 9) AS cdist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="Rank-distribution window functions (ntile / percent_rank / "
    "cume_dist) per market segment. All three share ONE window spec -> one "
    "shuffle + one sort; c_custkey tiebreaker makes the order total so "
    "ranks are deterministic. The ratios are integer-division doubles — "
    "bit-identical across engines; rounding is belt-and-braces.",
)
def rank_distribution_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
    )


@query(
    "lateral_explode_words",
    oracle="""
        SELECT p_partkey, i - 1 AS pos, w[i] AS word
        FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part),
             unnest(generate_series(1, len(w))) AS t(i)
    """,
    doc="Lateral array explode with ordinality: part names tokenized to "
    "(row, position, word). posexplode is a Generate node applied "
    "scan-side — rows fan out inside the same stage, no shuffle at all; "
    "the natural shape for token/ngram expansion at 100 TB.",
)
def lateral_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word"),
    )


@query(
    "intersect_repeat_customers",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
    """,
    doc="INTERSECT set op: customers active in both 1996 and 1998. Spark "
    "plans intersect as a left-semi join over two pre-aggregated "
    "(distinct) sides — both year predicates are pushed to the scan, and "
    "AQE broadcasts the smaller distinct side.",
)
def intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y98 = orders.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    return y96.intersect(y98)


@query(
    "sliding_window_counts",
    oracle="""
        SELECT ws AS window_start, event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM (
            SELECT unnest([
                       time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
                       time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                           - INTERVAL '30 minutes'
                   ]) AS ws,
                   event_type, value
            FROM events
        )
        GROUP BY 1, 2
    """,
    doc="Sliding event-time windows (1h long, 30min slide): each event "
    "fans out to exactly 2 overlapping windows scan-side (Spark's window() "
    "Expand — no join), then one shuffle aggregates per (window, type). "
    "Batch twin of streaming.sliding_counts_stream; the oracle derives both "
    "window starts per event from its 30-minute time bucket.",
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@query(
    "above_segment_avg_customers",
    oracle="""
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer i
            WHERE i.c_mktsegment = c.c_mktsegment
        )
    """,
    doc="Correlated scalar subquery (each customer vs their segment's "
    "average) — written decorrelated: one tiny per-segment aggregate, "
    "broadcast back onto the scan. The oracle keeps the correlated form; "
    "DuckDB decorrelates it to the same plan. At 100 TB the naive "
    "re-execute-per-row semantic is fatal; the broadcast-join form is one "
    "scan + one dimension-sized shuffle.",
)
def above_segment_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    seg_avg = cust.groupBy("c_mktsegment").agg(F.avg("c_acctbal").alias("seg_avg"))
    return (
        cust.join(F.broadcast(seg_avg), "c_mktsegment")
        .filter(F.col("c_acctbal") > F.col("seg_avg"))
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


@query(
    "median_acctbal_by_segment",
    oracle="""
        SELECT c_mktsegment, median_bal
        FROM (
            SELECT c_mktsegment, c_acctbal AS median_bal,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY c_acctbal, c_custkey
                   ) AS rn,
                   count(*) OVER (PARTITION BY c_mktsegment) AS n
            FROM customer
        )
        WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    """,
    doc="Exact discrete median (percentile_disc-style) per segment: the "
    "element at rank ceil(n/2) in (c_acctbal, c_custkey) order. Selecting "
    "an actual element — not interpolating — keeps the result bit-exact "
    "across engines (quantile_cont interpolation arithmetic differs). One "
    "shuffle + one sort per segment; scale-safe because the heavy sort is "
    "partitioned, never global.",
)
def median_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    return (
        cust.select(
            "c_mktsegment",
            F.col("c_acctbal").alias("median_bal"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint"))
        .select("c_mktsegment", "median_bal")
    )


@query(
    "except_parts_never_shipped",
    oracle="""
        SELECT p_partkey FROM part
        EXCEPT
        SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'
    """,
    doc="EXCEPT set op (completes the family with INTERSECT and the "
    "anti-join NOT-IN twin): parts with no shipment since 2000. Spark plans "
    "EXCEPT as distinct + left-anti hash join; the date predicate is pushed "
    "to the lineitem scan and AQE broadcasts the smaller distinct side.",
)
def except_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    return part.subtract(shipped)


@query(
    "timeseries_gapfill",
    oracle="""
        SELECT user_id, hour,
               coalesce(n_events, 0) AS n_events,
               CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS is_gap,
               last_value(obs_max IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM (
            SELECT g.user_id, g.hour, o.n_events, o.obs_max
            FROM (
                SELECT user_id,
                       unnest(generate_series(h_min, h_max,
                                              INTERVAL 1 HOUR)) AS hour
                FROM (
                    SELECT user_id,
                           min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h_min,
                           max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h_max
                    FROM events GROUP BY user_id
                )
            ) g
            LEFT JOIN (
                SELECT user_id,
                       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                       count(*) AS n_events,
                       max(value) AS obs_max
                FROM events GROUP BY 1, 2
            ) o USING (user_id, hour)
        )
    """,
    doc="TIME-SERIES GAP-FILL + LOCF (the resample/interpolate class — the "
    "reference has no time-series surface at all; its step grid is dense by "
    "construction, DSGT.py:98-115, so gaps cannot exist there — this is the "
    "operator a sparse event stream needs before any per-step pipeline can "
    "run): generate each user's dense hourly grid between their first and "
    "last active hour (sequence + explode — grid size is the sum of active "
    "SPANS, bounded by time, never by event count, so a hot user cannot "
    "blow it up), left-join the observed per-hour aggregates, and fill "
    "silent hours by last-observation-carried-forward (last(ignorenulls) "
    "over the per-user hour order). Every carried value is order-"
    "independent (count, max, a copied double — no float summation), so "
    "the result hash-matches the oracle exactly. Scale shape: one shuffle "
    "collapses events to (user, hour) groups; the grid derives from a "
    "user-sized min/max aggregate; the LOCF window partitions by user — "
    "no global sort, no Python boundary, and the leading grid cell always "
    "holds an observation (the grid starts at each user's first active "
    "hour), so the fill is total by construction.",
    bench=True,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return gapfill_from_obs(gapfill_obs(events))


def gapfill_obs(events: DataFrame) -> DataFrame:
    """Observed-hour compaction: per-(user, hour) count and max.  Shared
    by the batch query and the streaming twin — count merges by addition
    and max by max, both split-invariant, so per-microbatch partials
    produced by this same function merge to the identical table."""
    hour = F.date_trunc("hour", F.col("ts"))
    return events.groupBy("user_id", hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("obs_max"),
    )


def gapfill_from_obs(obs: DataFrame) -> DataFrame:
    """Grid + LOCF compaction from the observed-hour table: a
    deterministic function of the (merged) obs rows — the grid bounds
    are per-user min/max OF THE OBS TABLE, so batch and streaming forms
    cannot disagree."""
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("hour").alias("h_min"), F.max("hour").alias("h_max"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(h_min, h_max, INTERVAL 1 HOUR)")
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(obs, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("n_events").isNull(), 1).otherwise(0).alias("is_gap"),
        F.last("obs_max", ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "scd2_history_build",
    oracle="""
        SELECT o_custkey,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
               ) AS BIGINT) AS version,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
               ) AS valid_to,
               CAST(sum(delta_cents) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS balance_cents
        FROM (
            SELECT o_custkey, o_orderdate,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS delta_cents
            FROM orders GROUP BY 1, 2
        )
    """,
    doc="SCD2 HISTORY BUILD (the MERGE/upsert class — slowly-changing-"
    "dimension type-2 intervals from a change log; absent in the reference, "
    "whose sink is append-only, DSGT.py:118): each customer's orders are a "
    "balance change stream; the history row for change-point d is valid "
    "[d, next change point) with the then-current cumulative balance, the "
    "open row carrying valid_to NULL. Deltas are quantized to exact BIGINT "
    "cents BEFORE any summation, so the running balance is an integer sum "
    "— order-free and bit-identical across engines (the float-sum drift "
    "trap every SCD2 on money avoids the same way). Scale shape: one "
    "combiner-friendly shuffle collapses orders to (cust, date) deltas; "
    "version/lead/running-sum share ONE per-customer window partitioning; "
    "no global sort — the classic CDC-to-warehouse compaction, expressed "
    "as two window functions instead of an iterative MERGE loop.",
    bench=True,
)
def scd2_history_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return scd2_intervals(scd2_deltas(orders))


def scd2_deltas(orders: DataFrame) -> DataFrame:
    """Change-log compaction: exact BIGINT-cents deltas per (customer,
    change date).  Shared by the batch build and the streaming twin —
    integer addition is split-invariant, so per-microbatch partials
    produced by this same function merge to the identical table."""
    return orders.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "delta_cents"
        )
    )


def scd2_intervals(deltas: DataFrame) -> DataFrame:
    """The SCD2 compaction: version / validity interval / running balance
    in ONE window over one per-customer sort."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return deltas.select(
        "o_custkey",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.sum("delta_cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("balance_cents"),
    )


@query(
    "pointintime_balance_lookup",
    oracle="""
        WITH deltas AS (
            SELECT o_custkey, o_orderdate,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS delta_cents
            FROM orders GROUP BY 1, 2
        ), dim AS (
            SELECT o_custkey, o_orderdate AS valid_from,
                   lead(o_orderdate) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate
                   ) AS valid_to,
                   CAST(sum(delta_cents) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS balance_cents
            FROM deltas
        ), probes AS (
            SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
                   l.l_shipdate AS ship_ts
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT p.l_orderkey, p.l_linenumber, p.o_custkey, p.ship_ts,
               d.balance_cents
        FROM probes p LEFT JOIN dim d
          ON p.o_custkey = d.o_custkey
         AND d.valid_from <= p.ship_ts
         AND (d.valid_to IS NULL OR p.ship_ts < d.valid_to)
    """,
    doc="POINT-IN-TIME TEMPORAL JOIN (the dimension-as-of-event-time "
    "enrichment every SCD2 dim exists to serve): each lineitem shipment "
    "looks up its customer's balance valid AT ship time.  The oracle is "
    "the literal interval join (valid_from <= ts < valid_to) — the Spark "
    "plan deliberately is NOT: an interval join shuffles no better than a "
    "range join and explodes on hot customers, so the engine uses the "
    "WINDOW-MERGE formulation (the asof_last_click pattern): union the "
    "change rows and the probe rows into one stream keyed by customer, "
    "sort (ts, is_probe) — changes at a timestamp apply before probes at "
    "the same timestamp, giving the inclusive valid_from semantics — and "
    "carry the last seen balance forward; probes then filter out with "
    "their balance attached.  ONE shuffle on custkey + a partition-local "
    "sort replaces the pairwise interval match; row count is changes + "
    "probes, never their product.  A probe shipping before its "
    "customer's first change point carries NULL (the driver testdata "
    "does not enforce ship-after-order), so both forms preserve every "
    "probe: the oracle is a LEFT interval join, the window form a "
    "total fill.  The probe-side orderkey equi-join is the one "
    "unavoidable fact-fact join; at 100 TB both sides bucket on "
    "orderkey (sources/tables.py write_bucketed) to make it "
    "exchange-free.",
    bench=True,
)
def pointintime_balance_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # the SAME compaction stage as the SCD2 build — a change to the cents
    # quantization can never fork the looked-up balances from the dimension
    deltas = scd2_deltas(orders)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    changes = deltas.select(
        "o_custkey",
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("is_probe"),
        F.sum("delta_cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("bal"),
        F.lit(None).cast("bigint").alias("l_orderkey"),
        F.lit(None).cast("bigint").alias("l_linenumber"),
    )
    probes = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            "o_custkey",
            F.col("l_shipdate").alias("ts"),
            F.lit(1).alias("is_probe"),
            F.lit(None).cast("bigint").alias("bal"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    wm = (
        Window.partitionBy("o_custkey")
        .orderBy("ts", "is_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = changes.unionByName(probes).withColumn(
        "balance_cents", F.last("bal", ignorenulls=True).over(wm)
    )
    return merged.filter(F.col("is_probe") == 1).select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        F.col("ts").alias("ship_ts"),
        "balance_cents",
    )


#: The greedy funnel fold (shared by both funnel forms so their tie and
#: ordering semantics can never diverge): walk the (ts, event_id)-sorted
#: per-group events carrying (depth, ts-at-depth), advancing only on a
#: STRICTLY-later qualifying event — exactly the oracle's min-chain.
FUNNEL_FOLD = """
    aggregate(
        sort_array(collect_list(struct(ts, event_id, event_type))),
        named_struct('depth', 0, 'last', CAST(NULL AS TIMESTAMP)),
        (s, e) -> CASE
            WHEN s.depth = 0 AND e.event_type = 'view'
                THEN named_struct('depth', 1, 'last', e.ts)
            WHEN s.depth = 1 AND e.event_type = 'click' AND e.ts > s.last
                THEN named_struct('depth', 2, 'last', e.ts)
            WHEN s.depth = 2 AND e.event_type = 'purchase' AND e.ts > s.last
                THEN named_struct('depth', 3, 'last', e.ts)
            ELSE s END,
        s -> s.depth)
"""


@query(
    "funnel_conversion_steps",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
            FROM events
        ), t1 AS (
            SELECT user_id, min(ts) AS t1 FROM ev
            WHERE event_type = 'view' GROUP BY user_id
        ), t2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM ev e JOIN t1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > t1.t1
            GROUP BY e.user_id
        ), t3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM ev e JOIN t2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > t2.t2
            GROUP BY e.user_id
        )
        SELECT 1 AS step, 'view' AS step_name,
               CAST((SELECT count(*) FROM t1) AS BIGINT) AS users_reached
        UNION ALL
        SELECT 2, 'click', CAST((SELECT count(*) FROM t2) AS BIGINT)
        UNION ALL
        SELECT 3, 'purchase', CAST((SELECT count(*) FROM t3) AS BIGINT)
    """,
    doc="FUNNEL ANALYSIS (ordered-sequence conversion — the product-"
    "analytics class windows/sessionize don't cover): how many users "
    "progressed view -> click -> purchase IN TIMESTAMP ORDER.  The oracle "
    "is the textbook 3-stage CTE chain (earliest view, earliest LATER "
    "click, earliest later purchase — each stage a join + re-aggregate); "
    "the engine computes the identical counts in ONE exchange: per-user "
    "events are collected once (sort_array over (ts, event_id, type) "
    "structs), and a single aggregate() fold walks them carrying (depth, "
    "ts-at-depth) state, advancing on the first qualifying STRICTLY-LATER "
    "event.  Greedy earliest-match is optimal for subsequence matching, "
    "so the fold's depth equals the CTE chain's reach exactly — including "
    "timestamp ties, because the fold compares e.ts > state.ts with the "
    "same strict inequality instead of trusting sort order.  Scale shape: "
    "one user-keyed shuffle + a 1-row final aggregate; the per-user array "
    "is session-sized (the hot-user caveat is documented: a user with "
    "millions of events needs the sessionized variant, not a bigger "
    "buffer).  3-row output.",
    bench=True,
)
def funnel_conversion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return funnel_steps_from_log(funnel_typed(events))


def funnel_typed(events: DataFrame) -> DataFrame:
    """The funnel's observation log: funnel-typed events only, projected to
    the columns the fold reads.  Shared by the batch query and the
    streaming twin — non-funnel types can never advance the fold, so the
    filter goes BEFORE the collect (the predicate reaches the parquet
    scan) and, streamed, before the per-microbatch append; the log is a
    plain row set, so union of per-microbatch logs is split-invariant by
    construction."""
    return events.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "ts", "event_id", "event_type")


def funnel_steps_from_log(typed: DataFrame) -> DataFrame:
    """Deterministic compaction of the observation log to the 3-row step
    table: per-user greedy (depth, ts)-state fold, then global step
    counts.  Shared verbatim by the batch query and the streaming twin so
    their tie/ordering semantics can never diverge."""
    depths = typed.groupBy("user_id").agg(F.expr(FUNNEL_FOLD).alias("depth"))
    counts = depths.agg(
        *[
            # coalesce: a corpus with NO funnel-type events yields an empty
            # depths frame whose global sums are NULL — the oracle's
            # count(*) says 0, and so must we
            F.coalesce(
                F.sum((F.col("depth") >= k).cast("bigint")), F.lit(0)
            ).alias(f"s{k}")
            for k in (1, 2, 3)
        ]
    )
    return counts.select(
        F.expr(
            "explode(array("
            "named_struct('step', 1, 'step_name', 'view', 'users_reached', s1),"
            "named_struct('step', 2, 'step_name', 'click', 'users_reached', s2),"
            "named_struct('step', 3, 'step_name', 'purchase', 'users_reached', s3)"
            "))"
        ).alias("r")
    ).select("r.step", "r.step_name", "r.users_reached")


@query(
    "cohort_retention",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_type,
                   date_trunc('month', CAST(ts AS TIMESTAMP)) AS m
            FROM events
        ), cohorts AS (
            SELECT user_id, min(m) AS cohort_month FROM ev
            WHERE event_type = 'signup' GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT user_id, m FROM ev
        ), offsets AS (
            SELECT c.cohort_month,
                   (year(a.m) * 12 + month(a.m))
                   - (year(c.cohort_month) * 12 + month(c.cohort_month))
                       AS month_offset,
                   a.user_id
            FROM activity a JOIN cohorts c USING (user_id)
        )
        SELECT o.cohort_month, o.month_offset,
               count(DISTINCT o.user_id) AS n_active,
               max(s.n_cohort) AS n_cohort
        FROM offsets o
        JOIN (
            SELECT cohort_month, count(*) AS n_cohort
            FROM cohorts GROUP BY cohort_month
        ) s USING (cohort_month)
        WHERE o.month_offset >= 0
        GROUP BY o.cohort_month, o.month_offset
    """,
    doc="COHORT RETENTION (the second classic product-analytics class "
    "next to the funnel): users are cohorted by the month of their first "
    "'signup' event; a cohort member counts as retained at offset k if "
    "they have ANY event k calendar months later.  Month offsets are "
    "exact integer arithmetic (year*12+month differences on truncated "
    "months — months_between() returns a double and is avoided), and "
    "every output is a count, so the result hashes identically across "
    "engines.  Negative offsets (activity before the signup month — "
    "present in this data) are excluded symmetrically in both forms.  "
    "Scale shape: the corpus collapses to DISTINCT (user, month) pairs "
    "in one exchange before any join; the cohort table is user-sized; "
    "the final aggregate is cohort x offset (tiny).  No window, no "
    "sort, no Python.",
    bench=True,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return cohort_from_parts(cohort_signups(events), cohort_activity(events))


def cohort_signups(events: DataFrame) -> DataFrame:
    """Per-user earliest signup month.  Shared by the batch query and the
    streaming twin — min merges by min, so per-microbatch partials
    produced by this same function merge to the identical table."""
    return (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("month", F.col("ts"))).alias("cohort_month"))
    )


def cohort_activity(events: DataFrame) -> DataFrame:
    """Distinct (user, active month) pairs — set union is associative, so
    per-microbatch partials merge by distinct-of-union."""
    return events.select(
        "user_id", F.date_trunc("month", F.col("ts")).alias("m")
    ).distinct()


def cohort_from_parts(cohorts: DataFrame, activity: DataFrame) -> DataFrame:
    """The retention compaction: a deterministic function of the (merged)
    signup and activity tables."""
    midx = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    offsets = activity.join(cohorts, "user_id").select(
        "cohort_month",
        (midx(F.col("m")) - midx(F.col("cohort_month"))).alias("month_offset"),
        "user_id",
    )
    sizes = cohorts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        offsets.filter(F.col("month_offset") >= 0)
        .join(sizes, "cohort_month")
        .groupBy("cohort_month", "month_offset")
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.max("n_cohort").alias("n_cohort"),
        )
    )


@query(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ) AS prev_type
            FROM events
        )
        SELECT prev_type AS from_type, event_type AS to_type,
               count(*) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    """,
    doc="EVENT TRANSITION MATRIX (the Markov-chain journey view of the "
    "event stream — which step follows which): consecutive same-user "
    "event pairs in (ts, event_id) order, counted per (from, to) type "
    "pair.  lag() over ONE per-user window + a type-pair aggregate whose "
    "output is at most |event types|^2 rows; all outputs are exact "
    "counts.  The deterministic (ts, event_id) tie-break matters: "
    "same-timestamp events would otherwise order differently across "
    "engines and flip transition counts.  Scale shape: one user-keyed "
    "exchange with a partition-local sort, then a tiny map-side-combined "
    "aggregate — no global sort, no join, no Python.",
    bench=True,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "cube_revenue",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE aggregation (completes the grouping-analytics family next "
    "to rollup_revenue and grouping_sets_orders — SURVEY §2.5 lists cube "
    "as engine-exposed and this is its oracle-checked row): all four "
    "grouping combinations of (status, priority) in ONE Expand+aggregate "
    "pass — never four scans.  Revenue is summed in exact BIGINT cents "
    "(the float-sum trap again); NULL grouping placeholders hash "
    "identically in both engines.  Scale shape: Expand multiplies rows "
    "4x BEFORE the combiner, but partial aggregation collapses each "
    "grouping set map-side, so the exchange carries at most 4x the "
    "group-count rows, not 4x the corpus.",
    bench=True,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "revenue_cents"
        ),
    )


@query(
    "except_all_priorities",
    oracle="""
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL — bag-semantics set difference (the multiplicity-"
    "preserving twin of the DISTINCT set family already in-window: "
    "intersect/except/anti-join): each priority survives max(0, "
    "n_open - n_finished) times.  Spark plans exceptAll as a "
    "sum-of-signed-counts aggregate + generate (one exchange on the "
    "value), NOT a join of the two extents — the same collapse DuckDB "
    "performs, which is why the multiplicity semantics hash identically. "
    "Duplicate-heavy inputs are the point: the result is thousands of "
    "copies of 5 distinct values, so a bag/distinct confusion is "
    "unmissable.",
    bench=True,
)
def except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return o.exceptAll(f)


@query(
    "intersect_all_priorities",
    oracle="""
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT ALL — bag-semantics set intersection, completing the "
    "six-member set-op family (union/union-all/intersect/intersect-all/"
    "except/except-all): each priority survives least(n_open, n_finished) "
    "times.  Spark plans intersectAll like exceptAll — per-value signed "
    "counts collapsed in ONE exchange on the value, then generate "
    "replicates min(n_a, n_b) rows; never a join of the two extents.  "
    "Same duplicate-heavy input discipline as except_all_priorities "
    "(thousands of copies of 5 distinct values), so a bag/distinct "
    "confusion shifts the row count by three orders of magnitude and is "
    "unmissable in the hash.",
    bench=True,
)
def intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return o.intersectAll(f)


@query(
    "window_range_trailing_day",
    oracle="""
        SELECT user_id, event_id, ts,
               count(*) OVER w AS n_trailing_24h,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS cents_trailing_24h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL '1' DAY PRECEDING
                           AND CURRENT ROW)
    """,
    doc="Time-interval RANGE window frame — the moving-aggregate class an "
    "irregular event stream actually needs (window_frame_moving_sum's "
    "ROWS frame counts a fixed number of rows; real trailing-window "
    "metrics are defined by TIME: 'events in the last 24h').  Engine: "
    "ORDER BY unix_micros(ts) with rangeBetween(-86_400_000_000, 0) — "
    "value-based and inclusive at both bounds, exactly SQL's RANGE "
    "BETWEEN INTERVAL '1' DAY PRECEDING AND CURRENT ROW, evaluated as "
    "one sliding frame per user partition (one shuffle, no self-join "
    "blowup).  RANGE frames are peer-inclusive: rows tied on ts share "
    "one frame regardless of event_id, so every output is a frame-"
    "order-independent exact integer (count + quantized-cents sum) and "
    "hashes identically — the planted pytest pins the case where a ROWS "
    "frame and this RANGE frame disagree (two events at the same "
    "instant).  24h (not 1h) because at test SFs the per-user stream is "
    "~4 events/day — hour-frames are degenerate singletons that would "
    "never catch a ROWS-vs-RANGE regression.",
    bench=True,
)
def window_range_trailing_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing_24h"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .over(w)
        .alias("cents_trailing_24h"),
    )


@query(
    "funnel_sessionized",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_id, event_type,
                   CAST(ts AS TIMESTAMP) AS ts
            FROM events
        ), sess AS (
            SELECT user_id, event_id, event_type, ts,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM (
                SELECT *,
                       CASE WHEN lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) IS NULL
                              OR ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_new
                FROM ev
            )
        ), t1 AS (
            SELECT user_id, session_id, min(ts) AS t1 FROM sess
            WHERE event_type = 'view' GROUP BY 1, 2
        ), t2 AS (
            SELECT s.user_id, s.session_id, min(s.ts) AS t2
            FROM sess s JOIN t1 USING (user_id, session_id)
            WHERE s.event_type = 'click' AND s.ts > t1.t1
            GROUP BY 1, 2
        ), t3 AS (
            SELECT s.user_id, s.session_id, min(s.ts) AS t3
            FROM sess s JOIN t2 USING (user_id, session_id)
            WHERE s.event_type = 'purchase' AND s.ts > t2.t2
            GROUP BY 1, 2
        )
        SELECT 1 AS step, 'view' AS step_name,
               CAST((SELECT count(*) FROM t1) AS BIGINT) AS sessions_reached
        UNION ALL
        SELECT 2, 'click', CAST((SELECT count(*) FROM t2) AS BIGINT)
        UNION ALL
        SELECT 3, 'purchase', CAST((SELECT count(*) FROM t3) AS BIGINT)
    """,
    doc="SESSIONIZED FUNNEL — the scale-correct funnel variant the plain "
    "funnel's docstring promises for degenerate users: conversion is "
    "counted per SESSION (30-min-gap sessionization over ALL events — "
    "boundaries must see the whole journey, not just funnel types), so "
    "the per-group array the fold walks is bounded by session length, "
    "never by a user's lifetime event count.  Two window passes share "
    "ONE user-keyed partitioning (gap flags + running session ids), then "
    "the same greedy (depth, ts)-state fold runs per (user, session) on "
    "the funnel-typed subset.  Oracle: the sessionize CTE composed with "
    "the 3-stage min-chain per session — greedy-subsequence equivalence "
    "again, strict-inequality ties included.  Output: sessions reaching "
    "each step.",
    bench=True,
)
def funnel_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_order)
    is_new = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
            > 30 * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    sess = events.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(w_run)
    )
    depths = (
        sess.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id", "session_id")
        .agg(F.expr(FUNNEL_FOLD).alias("depth"))
    )
    counts = depths.agg(
        *[
            # coalesce: a corpus with NO funnel-type events yields an empty
            # depths frame whose global sums are NULL — the oracle's
            # count(*) says 0, and so must we
            F.coalesce(
                F.sum((F.col("depth") >= k).cast("bigint")), F.lit(0)
            ).alias(f"s{k}")
            for k in (1, 2, 3)
        ]
    )
    return counts.select(
        F.expr(
            "explode(array("
            "named_struct('step', 1, 'step_name', 'view', 'sessions_reached', s1),"
            "named_struct('step', 2, 'step_name', 'click', 'sessions_reached', s2),"
            "named_struct('step', 3, 'step_name', 'purchase', 'sessions_reached', s3)"
            "))"
        ).alias("r")
    ).select("r.step", "r.step_name", "r.sessions_reached")
