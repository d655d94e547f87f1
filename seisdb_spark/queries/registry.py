"""Query registry: name -> (spark callable, duckdb oracle SQL, bench flag).

Contract (driver, __spark_entry__.py): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL DuckDB
runs over the same parquet tables registered as views.  Column names are
aliased identically on both sides — the driver sorts columns by name before
value-hashing.

Determinism discipline (so value hashes match):
  * every float aggregate is ``round(...)``-ed on both sides;
  * running/ordered computations use a total order (explicit tiebreakers);
  * integer sums are CAST to BIGINT in DuckDB (its SUM(int) yields HUGEINT);
  * scalar float arithmetic (min/max/normalize) is done in float64 on both
    sides — identical IEEE ops give identical bits, no rounding needed.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "", bench: bool = False):
    """Decorator registering a Spark query with its DuckDB oracle twin.

    The registered callable memoizes the *lazy* analyzed DataFrame per
    ``(session, sf_dir)`` — a prepared-plan cache.  Queries here are pure
    plan builders (no parameters beyond the table directory), so the plan is
    a pure function of its key; re-invoking returns the same DataFrame and
    skips the py4j plan-construction round-trips (~0.1-0.9 s for the wide
    LSH plans), while every execution still runs from scratch.  The cache
    holds a STRONG reference to the session object and hits only on ``is``
    identity — so a stopped-and-collected session's id can never be reused
    for a false hit (a fresh SparkSession is a different object and takes
    the miss path, which also drops the old entry).
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        plan_cache: dict[str, tuple[SparkSession, DataFrame]] = {}

        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            hit = plan_cache.get(sf_dir)
            if hit is not None and hit[0] is spark:
                return hit[1]
            df = fn(spark, sf_dir)
            plan_cache.clear()  # one live session at a time; don't pin old JVMs
            plan_cache[sf_dir] = (spark, df)
            return df

        cached.__name__ = fn.__name__
        cached.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(
            name=name, spark=cached, oracle=oracle, doc=doc, bench=bench
        )
        return fn

    return deco
