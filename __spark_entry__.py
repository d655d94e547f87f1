"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All query definitions live in ``seisdb_spark.queries`` (one registry entry
per implemented operator from SURVEY.md §2 + the §2.11 extension surface);
this module is a thin adapter over that registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from seisdb_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the REAL SGT create_db (DSGT.py:40-196) end-to-end on a
    deterministic SPECFEM fixture — distributed Fortran-binary decode,
    27-point dedup selection, broadcast gather join, ordered array assembly,
    float32 quantize + zlib encode, start offsets — returning the record
    table (blob reduced to sha256 for a hash-stable schema)."""
    return REGISTRY["sgt_pipeline_records"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
