"""The spark.sql(...) surface: register_views makes every driver table
reachable as SQL, and SQL-string queries produce results identical to their
DataFrame-API twins (same Catalyst plans, same pushdowns — SURVEY §7)."""

from __future__ import annotations

import pandas as pd

from seisdb_spark.queries.registry import REGISTRY
from seisdb_spark.sources.tables import TABLES, register_views
from tests.conftest import SMOKE_SF_DIR


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_register_views_exposes_all_tables(spark):
    register_views(spark, SMOKE_SF_DIR)
    for t in TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0]["n"] > 0


def test_sql_twin_matches_dataframe_api(spark):
    """A §2-shaped query written as a SQL string equals its DataFrame twin."""
    register_views(spark, SMOKE_SF_DIR)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-01-01'
        GROUP BY l_returnflag, l_linestatus
        """
    ).toPandas()

    import pyspark.sql.functions as F

    from seisdb_spark.sources.tables import load_table

    df = (
        load_table(spark, SMOKE_SF_DIR, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2001-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .toPandas()
    )
    pd.testing.assert_frame_equal(_sorted(sql), _sorted(df))


def test_sql_window_twin_matches_registry_query(spark):
    """The registry's window-frame query, re-stated as SQL over the views,
    equals the registered DataFrame implementation."""
    register_views(spark, SMOKE_SF_DIR)
    sql = spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 2) AS moving_sum_3
        FROM orders
        """
    ).toPandas()
    reg = REGISTRY["window_frame_moving_sum"].spark(spark, SMOKE_SF_DIR).toPandas()
    pd.testing.assert_frame_equal(_sorted(sql), _sorted(reg))


def test_sql_twin_bpe_merge_candidates(spark):
    """A round-7 operator (BPE merge-pair counts) written as a pure
    spark.sql(...) string over the registered views equals the registered
    DataFrame-API query — the SQL surface keeps up with new operators."""
    register_views(spark, SMOKE_SF_DIR)
    sql = spark.sql(
        """
        WITH wfreq AS (
            SELECT word, count(*) AS wn
            FROM (SELECT explode(split(text, ' ')) AS word FROM documents)
            GROUP BY word
        ),
        pairs AS (
            SELECT explode(
                CASE WHEN length(word) >= 2 THEN
                    transform(sequence(1, length(word) - 1),
                              i -> substring(word, i, 2))
                ELSE array() END) AS pair, wn
            FROM wfreq
        ),
        agg AS (
            SELECT pair, CAST(sum(wn) AS BIGINT) AS n
            FROM pairs GROUP BY pair
        ),
        sel AS (SELECT * FROM agg ORDER BY n DESC, pair LIMIT 20)
        SELECT pair, n,
               CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rank
        FROM sel
        """
    ).toPandas()
    api = (
        REGISTRY["bpe_merge_candidates"].spark(spark, SMOKE_SF_DIR).toPandas()
    )
    pd.testing.assert_frame_equal(_sorted(sql), _sorted(api))
