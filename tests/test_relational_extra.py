"""Tests for the standard-operator-surface queries that can't be (fully)
oracle-checked: approx_count_distinct accuracy and theta-join plan shape."""

from __future__ import annotations

from seisdb_spark.queries.registry import REGISTRY
from tests.conftest import SF_DIR


def test_approx_distinct_accuracy(spark, duck):
    """HLL sketch values differ across engines, so the query gates itself:
    it returns the exact count plus a Spark-side 0/1 flag asserting the
    sketch is within 3*rsd of it (the oracle twin returns literal 1)."""
    got = REGISTRY["approx_distinct_parts"].spark(spark, SF_DIR).toPandas()
    exact = duck.execute("SELECT count(DISTINCT l_partkey) FROM lineitem").fetchone()[0]
    assert int(got.exact_parts[0]) == exact
    assert int(got.approx_within_bound[0]) == 1, "HLL sketch outside 3*rsd bound"
    assert int(got.n_rows[0]) == duck.execute("SELECT count(*) FROM lineitem").fetchone()[0]


def test_l1_point_lookup_builds_lazily(spark):
    """Building the L1 plan must run NO Spark job beyond the one-off parquet
    schema inference (the lookup key is a scalar subquery resolved at
    execution, not a driver-side head())."""
    from seisdb_spark.sources.tables import load_table

    tracker = spark.sparkContext.statusTracker()

    def jobs() -> set[int]:
        return set(tracker.getJobIdsForGroup(None) or [])

    # baseline: a bare table load runs only parquet schema inference
    before = jobs()
    load_table(spark, SF_DIR, "lineitem")
    baseline = len(jobs() - before)

    before = jobs()
    df = REGISTRY["l1_point_lookup"].spark(spark, SF_DIR + "/")
    built = len(jobs() - before)
    assert built <= baseline, (
        f"plan construction launched {built} jobs vs {baseline} for a bare "
        "table load — an eager driver-side fetch is back"
    )
    assert "scalar-subquery" in df._jdf.queryExecution().optimizedPlan().toString()
    assert df.count() > 0  # and it still executes correctly


def test_range_join_broadcasts_band_side(spark):
    """The 10-row band side of the theta join must broadcast (never a
    shuffled nested-loop over the fact table)."""
    df = REGISTRY["range_join_value_bands"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_sql_surface_over_registered_views(spark, duck):
    """The spark.sql(...) path: DuckDB-oracle SQL shapes run against the
    registered views and agree with the oracle (same ANSI semantics)."""
    from seisdb_spark.sources.tables import register_views

    register_views(spark, SF_DIR)
    sql = """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_totalprice > 100000
        GROUP BY o_orderpriority
    """
    got = {
        (r.o_orderpriority, r.n) for r in spark.sql(sql).collect()
    }
    want = set(map(tuple, duck.execute(sql).fetchall()))
    assert got == want


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """Both sides bucketed on the join key: the sort-merge join must read
    co-located buckets with NO Exchange on either side — the write-once
    pre-shuffle that co-locates every future join on that key."""
    import pyspark.sql.functions as F

    from seisdb_spark.sources.tables import load_table, read_bucketed, write_bucketed

    prior_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "t_orders_b", "o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_lineitem_b", "o_orderkey"
    )
    try:
        a = read_bucketed(spark, "t_orders_b")
        b = read_bucketed(spark, "t_lineitem_b")
        joined = a.hint("merge").join(b, "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_extendedprice"
        )
        n = joined.count()
        assert n == li.count()  # every lineitem row has its order
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and the same join on the raw (unbucketed) parquet DOES shuffle
        raw = orders.hint("merge").join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        raw.count()
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
        assert prior_wh == spark.conf.get("spark.sql.warehouse.dir", None)


def test_aqe_splits_skewed_join_partition(spark):
    """A 95%-on-one-key skewed sort-merge join: AQE must detect the skewed
    shuffle partition at runtime and split it (SortMergeJoin(skew=true) +
    'AQEShuffleRead ... skewed' in the FINAL adaptive plan) — the runtime
    re-plan that replaces manual salting when skew is discovered late.
    Thresholds are lowered (and restored) so fixture-sized data triggers the
    same code path a 100 TB hot key would. Note the final plan only exists
    after executing the DataFrame's own query execution (collect), not a
    derived count()."""
    import pyspark.sql.functions as F

    keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prior = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payloadpayloadpayload"), F.col("id")).alias("pad"),
        )
        right = spark.range(1000).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        joined = left.hint("merge").join(right, "k")
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE did not split the skewed partition:\n{plan[:1500]}"
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
