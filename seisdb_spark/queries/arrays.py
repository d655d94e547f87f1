"""Array-form operator queries (SURVEY §2.6/2.7/2.8) — the *real* Spark plans
for R1/R2/E1/L2 over driver testdata, oracle-checked against DuckDB, plus
rows-only entries that run the actual seismic pipeline on a deterministic
SPECFEM fixture.

Round-1's R1/R2 entries were scalar checksum proxies (VERDICT.md §2.6); here
the Spark side genuinely builds ordered arrays with
``sort_array(collect_list(struct(...)))``, flattens nested channel arrays,
applies the 27-point reorder permutation — and only *then* reduces to a CSV
string so the driver's column-wise value hash stays scalar and portable.

Scale posture: every query is a single groupBy shuffle on its natural key;
per-group arrays are bounded (one point's series), never a whole-partition
sort; the reorder permutation is a literal applied JVM-side.
"""

from __future__ import annotations

import os
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seisdb_spark.queries.registry import query
from seisdb_spark.schemas import REORDER27
from seisdb_spark.sources.tables import load_table

# testdata has duplicate (l_orderkey, l_linenumber) pairs, so the value is an
# explicit final sort key — Spark's struct sort tiebreaks by it implicitly,
# the SQL must say so to define the same total order.
_ORDERED = "ORDER BY l_orderkey, l_linenumber, CAST(l_quantity AS INT)"


# ---------------------------------------------------------------------------
# R1: ordered series assembly — the reference's 4-D buffer fill as arrays
# ---------------------------------------------------------------------------
@query(
    "r1_array_assembly",
    oracle=f"""
        SELECT l_suppkey,
               CAST(count(*) AS BIGINT) AS n_values,
               string_agg(CAST(CAST(l_quantity AS INT) AS VARCHAR), ',' {_ORDERED})
                   AS series_csv
        FROM lineitem
        GROUP BY l_suppkey
    """,
    doc="R1 (DSGT.py:86-115): per-key time-ordered array assembly via "
    "sort_array(collect_list(struct(order_keys, value))) — the actual array "
    "build, reduced to CSV only for the portable value hash. One shuffle on "
    "the group key; per-group arrays bounded by series length.",
    bench=True,
)
def r1_array_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    arr = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct("l_orderkey", "l_linenumber", F.col("l_quantity").cast("int").alias("v"))
            )
        ),
        lambda x: x["v"],
    )
    return li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.array_join(arr.cast("array<string>"), ",").alias("series_csv"),
    )


# ---------------------------------------------------------------------------
# R2: canonical fixed-order flatten of per-channel arrays
# ---------------------------------------------------------------------------
@query(
    "r2_canonical_flatten_arrays",
    oracle="""
        SELECT l_suppkey,
               CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_channels,
               string_agg(CAST(CAST(l_quantity AS INT) AS VARCHAR), ','
                          ORDER BY l_returnflag, l_orderkey, l_linenumber,
                                   CAST(l_quantity AS INT))
                   AS flat_csv
        FROM lineitem
        GROUP BY l_suppkey
    """,
    doc="R2 (DSGT.py:128-135): per-channel ordered arrays flattened in one "
    "canonical channel order — Spark genuinely builds nested arrays "
    "(groupBy channel -> array, then flatten(sorted channel structs)), the "
    "reference's [force][para][time] serialization; the oracle states the "
    "equivalent total order.",
)
def r2_canonical_flatten_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_channel = li.groupBy("l_suppkey", "l_returnflag").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("int").alias("v")
                    )
                )
            ),
            lambda x: x["v"],
        ).alias("chan_arr")
    )
    return per_channel.groupBy("l_suppkey").agg(
        F.countDistinct("l_returnflag").alias("n_channels"),
        F.array_join(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("l_returnflag", "chan_arr"))),
                    lambda x: x["chan_arr"],
                )
            ).cast("array<string>"),
            ",",
        ).alias("flat_csv"),
    )


# ---------------------------------------------------------------------------
# E1: per-group normalize + truncating quantize, as a codes array
# ---------------------------------------------------------------------------
_E1_EXPR = "floor(((l_extendedprice - off) / scl) * 255)"


def _quantize_codes(li: DataFrame) -> DataFrame:
    """(l_partkey, l_orderkey, l_linenumber, code): the A1/A2 truncating
    8-bit quantize shared by e1_quantize_codes and e2_zlib_blob.

    The per-group min/max are evaluated as TWO named window columns and the
    code expression references the resulting attributes (r19, guide §1.2 —
    the PQ-fold-hoist discipline): inlining ``off``/``raw_scl`` into the
    quantize expression made Catalyst's ExtractWindowExpressions emit one
    window function PER REFERENCE — seven min/max accumulators per row
    where two suffice (window functions are not common-subexpression-
    eliminated).  Window attributes are never re-inlined by
    CollapseProject, so each row now pays exactly one min and one max
    update.  min/max are exact selections (no accumulation-order
    sensitivity), so per-row codes are bit-identical either way."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    base = li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.min("l_extendedprice").over(w).alias("_mn"),
        F.max("l_extendedprice").over(w).alias("_mx"),
    )
    raw_scl = F.col("_mx") - F.col("_mn")
    scl = F.when(raw_scl == 0, F.lit(1.0)).otherwise(raw_scl)
    code = F.when(raw_scl == 0, F.lit(0)).otherwise(
        F.floor(((F.col("l_extendedprice") - F.col("_mn")) / scl) * 255)
    ).cast("int")
    return base.select("l_partkey", "l_orderkey", "l_linenumber", code.alias("code"))


@query(
    "e1_quantize_codes",
    oracle=f"""
        WITH g AS (
            SELECT l_partkey,
                   min(l_extendedprice) AS off,
                   max(l_extendedprice) - min(l_extendedprice) AS raw_scl
            FROM lineitem GROUP BY l_partkey
        ),
        j AS (
            SELECT l.l_partkey, l.l_orderkey, l.l_linenumber, l.l_extendedprice,
                   g.off, CASE WHEN g.raw_scl = 0 THEN 1.0 ELSE g.raw_scl END AS scl,
                   g.raw_scl
            FROM lineitem l JOIN g USING (l_partkey)
        ),
        c AS (
            SELECT l_partkey, l_orderkey, l_linenumber,
                   CAST(CASE WHEN raw_scl = 0 THEN 0
                             ELSE {_E1_EXPR} END AS INT) AS code
            FROM j
        )
        SELECT l_partkey,
               string_agg(CAST(code AS VARCHAR), ','
                          ORDER BY l_orderkey, l_linenumber, code) AS codes_csv
        FROM c
        GROUP BY l_partkey
    """,
    doc="E1 (DSGT.py:138-152): A1 min-offset + A2 max-scale (zero-guarded) + "
    "truncating 8-bit quantize, emitted as the per-group codes array in "
    "series order. Window aggregates share one shuffle with the final "
    "collect; the float math is double on both sides, same operation order.",
)
def e1_quantize_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    coded = _quantize_codes(li)
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct("l_orderkey", "l_linenumber", "code"))),
        lambda x: x["code"],
    )
    return coded.groupBy("l_partkey").agg(
        F.array_join(arr.cast("array<string>"), ",").alias("codes_csv")
    )


# ---------------------------------------------------------------------------
# L2: the 27-point reorder permutation on a gathered element array
# ---------------------------------------------------------------------------
def _l2_oracle() -> str:
    positions = ", ".join(f"CAST(arr[{p + 1}] AS VARCHAR)" for p in REORDER27)
    return f"""
        WITH g AS (
            SELECT l_suppkey,
                   list_slice(list(CAST(l_quantity AS INT)
                                   ORDER BY l_orderkey, l_linenumber,
                                            CAST(l_quantity AS INT)), 1, 27) AS arr,
                   count(*) AS n
            FROM lineitem
            GROUP BY l_suppkey
        )
        SELECT l_suppkey, concat_ws(',', {positions}) AS reordered_csv
        FROM g WHERE n >= 27
    """


@query(
    "l2_element_reorder",
    oracle=_l2_oracle(),
    doc="L2/P2 (ibool_reader.py:57-90): gather a fixed 27-slot array per key "
    "and re-emit it through the x-outer/z-inner REORDER27 permutation "
    "(schemas.py) — the same literal permutation the real read path applies "
    "in element_gll_ids; proxied here over lineitem so DuckDB can check it.",
)
def l2_element_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    arr = F.slice(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct("l_orderkey", "l_linenumber", F.col("l_quantity").cast("int").alias("v"))
                )
            ),
            lambda x: x["v"],
        ),
        1,
        27,
    )
    g = li.groupBy("l_suppkey").agg(arr.alias("arr"), F.count(F.lit(1)).alias("n"))
    perm = F.array(*[F.element_at("arr", p + 1) for p in REORDER27])
    return g.filter(F.col("n") >= 27).select(
        "l_suppkey", F.array_join(perm.cast("array<string>"), ",").alias("reordered_csv")
    )


# ---------------------------------------------------------------------------
# E2: zlib blob compress over assembled code arrays (rows-only: no SQL zlib)
# ---------------------------------------------------------------------------
@query(
    "e2_zlib_blob",
    oracle=None,
    doc="E2/E3 (DSGT.py:154-162): per-group quantized codes packed to bytes "
    "and zlib-compressed in an Arrow-batched pandas stage; emits "
    "deterministic (n_codes, blob_len, blob_sha) so the rows-only check is "
    "still value-stable. Python touches exactly one stage, batch-vectorized.",
    bench=True,
)
def e2_zlib_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    coded = _quantize_codes(li)
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct("l_orderkey", "l_linenumber", "code"))),
        lambda x: x["code"],
    )
    grouped = coded.groupBy("l_partkey").agg(arr.alias("codes"))

    out_schema = T.StructType(
        [
            T.StructField("l_partkey", T.LongType(), False),
            T.StructField("n_codes", T.LongType(), False),
            T.StructField("blob_len", T.LongType(), False),
            T.StructField("blob", T.BinaryType(), False),
        ]
    )

    def compress(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = [zlib.compress(np.asarray(c, dtype=np.uint8).tobytes()) for c in pdf["codes"]]
            yield pd.DataFrame(
                {
                    "l_partkey": pdf["l_partkey"].astype("int64"),
                    "n_codes": [len(c) for c in pdf["codes"]],
                    "blob_len": [len(b) for b in blobs],
                    "blob": blobs,
                }
            )

    packed = grouped.mapInPandas(compress, out_schema)
    return packed.select(
        "l_partkey", "n_codes", "blob_len", F.sha2("blob", 256).alias("blob_sha")
    )


# ---------------------------------------------------------------------------
# The real seismic pipeline on a deterministic fixture (rows-only checks)
# ---------------------------------------------------------------------------
def _fixture(spark: SparkSession):
    from seisdb_spark.pipeline import cached_fixture

    return cached_fixture()


@query(
    "specfem_strain_scan",
    oracle=None,
    doc="S1/S2/S6 end-to-end: distributed Fortran-binary decode of strain "
    "snapshots (binaryFile -> mapInPandas, deviatoric->full completion) "
    "reduced to per-(proc, force) counts and rounded sums. Deterministic "
    "fixture, rows-only (DuckDB cannot decode SPECFEM binaries).",
)
def specfem_strain_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from seisdb_spark.sources import specfem

    m = _fixture(spark)
    snaps = specfem.read_strain_snapshots(spark, m["force_dirs"], m["nspec"])
    return (
        snaps.groupBy("proc", "force")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum("exx"), 4).alias("sum_exx"),
            F.round(F.sum("eyz"), 4).alias("sum_eyz"),
        )
        .orderBy("proc", "force")
    )


def _pipeline_records(spark: SparkSession, kind: str) -> DataFrame:
    from seisdb_spark.pipeline import dgf_build, sgt_build

    m = _fixture(spark)
    build = sgt_build if kind == "SGT" else dgf_build
    records, _meta, _steps = build(
        spark,
        os.path.join(m["model_dir"], "proc*_ibool.bin"),
        m["force_dirs"],
        m["nspec"],
        m["step0"],
        m["step1"],
        m["dstep"],
    )
    return records.select(
        "proc", "gll_id", "i_spec", "i_gll", "n_values",
        F.round("offset", 8).alias("offset"),
        F.round("scale", 8).alias("scale"),
        "length", "start",
        F.sha2("blob", 256).alias("blob_sha"),
    )


@query(
    "sgt_pipeline_records",
    oracle=None,
    doc="The flagship: full SGT create_db (DSGT.py:40-196) on a SPECFEM "
    "fixture — binary decode, 27-point dedup selection, broadcast gather, "
    "ordered assembly, float32 quantize+zlib encode, start offsets. Golden "
    "bit-exactness vs the numpy reference re-expression is pytest-asserted; "
    "this entry gives the driver a rows-level run of the real engine.",
)
def sgt_pipeline_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipeline_records(spark, "SGT")


@query(
    "dgf_pipeline_records",
    oracle=None,
    doc="Full DGF create_db (DDGF.py:40-190): displacement scan, id-gather "
    "semi-join, [para][force][time] flatten, same encode tail.",
)
def dgf_pipeline_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipeline_records(spark, "DGF")


@query(
    "sgt_roundtrip_decode",
    oracle=None,
    doc="The read path (L-family + inverse E1/E2): decode the SGT records "
    "back to (force, para, step) series and reduce to per-proc stats — "
    "proves lookup -> dezlib -> dequantize works distributed.",
)
def sgt_roundtrip_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from seisdb_spark.pipeline import decode_records, sgt_build

    m = _fixture(spark)
    records, _meta, _steps = sgt_build(
        spark,
        os.path.join(m["model_dir"], "proc*_ibool.bin"),
        m["force_dirs"],
        m["nspec"],
        m["step0"],
        m["step1"],
        m["dstep"],
    )
    decoded = decode_records(records, n_force=3, n_para=6, kind="SGT")
    return (
        decoded.groupBy("proc")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .orderBy("proc")
    )
