"""Z-order (Morton) space-filling-curve layout for multi-column data
skipping — the storage-layout operator class (Delta/Iceberg ``OPTIMIZE
ZORDER``, public) the engine's scan-side pruning story needs: a table
sorted on ONE column prunes probes on that column only; a table laid
out along the Z-curve of TWO columns prunes probes on EITHER (and
especially both), because every contiguous key range maps to a small
set of grid tiles whose per-file min/max "zone maps" are tight in BOTH
dimensions.

Everything here is exact integer arithmetic so the layout — and the
pruning counts the gate query reports — are engine-portable:

* ``grid bin``: each dimension is binned to ``[0, 2^ZO_BITS)`` on a
  fixed grid derived from the table's min/max (``((v - lo) * SIDE) div
  (hi - lo + 1)``, clamped — the histq.py fixed-grid discipline).
* ``zkey``: the bit-interleave of the two bin coordinates, expressed as
  a pure div/mod polynomial (``interleave_sql``) so the SAME formula
  runs in Spark SQL and DuckDB with no bitwise-operator dialect.
* ``bucket``: equal-WIDTH key ranges (``bx div (SIDE/NB)`` for the
  single-column layout, ``zkey div (SIDE^2/NB)`` for the Z-layout) —
  map-only and deterministic, NO global sort anywhere in the gate
  (``ntile`` would model equal-row files but costs a single-partition
  N-row sort; the production writer below gets balanced files from
  ``repartitionByRange``'s distributed sort instead).  Because
  ``SIDE^2/NB`` is a power of 4, each Z-bucket is an ALIGNED z-range,
  i.e. a perfect square tile of the grid (4^k cells == a 2^k x 2^k
  square under Morton order), which is what makes Z-zone-maps tight in
  both dimensions by construction.

Scale shape (100 TB): binning and zkey are row-local expressions inside
whole-stage codegen (the one auxiliary is a 1-row min/max aggregate,
broadcast back); zone maps are one combiner-friendly groupBy over
(layout, bucket) — at most 2*NB rows leave the map side; probes are a
broadcast 3-row table.  The writer is one ``repartitionByRange`` on
zkey (Spark's distributed range sort) + ``sortWithinPartitions`` so
parquet row-group min/max footers become the zone maps the scan prunes
with.

No reference counterpart: /root/reference/seisdb stores per-process
binary blobs with no multi-column layout machinery; this class exists
for the engine's 100 TB scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: grid resolution per dimension: 2^8 = 256 bins -> 16-bit zkey.
ZO_BITS = 8
ZO_SIDE = 1 << ZO_BITS
#: bucket count (models files/row-groups).  SIDE/NB = 4 grid columns per
#: linear bucket; SIDE^2/NB = 1024 = 4^5 cells per Z-bucket — an aligned
#: 32x32 tile (power of 4 => square under Morton order).
ZO_BUCKETS = 64
ZO_LIN_W = ZO_SIDE // ZO_BUCKETS
ZO_Z_W = (ZO_SIDE * ZO_SIDE) // ZO_BUCKETS

#: probe rectangles in grid coordinates: an x-slab, a y-slab, and their
#: intersection box — each exactly one tile-row/-column/-tile of the
#: 8x8 tile grid, so the expected scan counts are the textbook ones
#: (linear_x: 8 / ALL / 8 buckets; zorder: 8 / 8 / 1).
ZO_PROBES = (
    ("x", 96, 127, 0, ZO_SIDE - 1),
    ("y", 0, ZO_SIDE - 1, 96, 127),
    ("xy", 96, 127, 96, 127),
)


def interleave_sql(bx: str, by: str, bits: int = ZO_BITS, idiv: str = "div") -> str:
    """Morton interleave of two ``bits``-bit nonnegative ints as ONE SQL
    expression using only integer div/mod/mul/add — the same string is
    valid Spark SQL (``idiv='div'``) and DuckDB (``idiv='//'``).  x's
    bit i lands at output bit 2i+1, y's at 2i (x is the high word)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({bx} {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)})")
        terms.append(f"((({by} {idiv} {1 << i}) % 2) * {1 << (2 * i)})")
    return "(" + " + ".join(terms) + ")"


def interleave_py(bx: int, by: int, bits: int = ZO_BITS) -> int:
    """Pure-Python golden twin of ``interleave_sql``."""
    z = 0
    for i in range(bits):
        z |= ((bx >> i) & 1) << (2 * i + 1)
        z |= ((by >> i) & 1) << (2 * i)
    return z


def _bin_sql(vcol: str, lo: str, hi: str) -> str:
    """Fixed-grid bin of ``vcol`` given bounds (column names OR integer
    literals) — the ONE formula every caller shares, so a bounds-source
    change can never fork the grid.  Clamped on BOTH sides: when the
    bounds come from the same frame's min/max the clamps are identity,
    but under a PUBLISHED grid (grid_bins_fixed / the streaming twin) a
    later row outside the static extremes must land in the edge bin —
    an unclamped low side would emit negative bins, garbage zkeys, and
    silently wrong zone maps."""
    return (
        f"least(greatest((({vcol} - {lo}) * {ZO_SIDE}) "
        f"div ({hi} - {lo} + 1), 0), {ZO_SIDE - 1})"
    )


def grid_bins(df: DataFrame, xcol: str, ycol: str) -> DataFrame:
    """Bin two BIGINT columns onto the ZO_SIDE x ZO_SIDE grid (bounds
    from a 1-row min/max aggregate, broadcast back) and attach the
    Morton ``zkey``.  Row-local after the broadcast; exact integers."""
    b = df.agg(
        F.min(xcol).alias("_xlo"),
        F.max(xcol).alias("_xhi"),
        F.min(ycol).alias("_ylo"),
        F.max(ycol).alias("_yhi"),
    )
    return (
        df.crossJoin(F.broadcast(b))
        .select(
            "*",
            F.expr(_bin_sql(xcol, "_xlo", "_xhi")).alias("bx"),
            F.expr(_bin_sql(ycol, "_ylo", "_yhi")).alias("by"),
        )
        .drop("_xlo", "_xhi", "_ylo", "_yhi")
        .withColumn("zkey", F.expr(interleave_sql("bx", "by")))
    )


def grid_bounds(df: DataFrame, xcol: str, ycol: str) -> tuple:
    """The published grid: global min/max of both dims as four driver
    scalars (a 1-row collect — the bounded-driver-state discipline).
    A streaming layout must fix the grid BEFORE batches arrive (each
    microbatch seeing only its own extremes would fork the binning), so
    this is read once from the static table, like streaming_lm_score
    trains once from the static slice."""
    r = df.agg(
        F.min(xcol), F.max(xcol), F.min(ycol), F.max(ycol)
    ).collect()[0]
    if any(v is None for v in r):
        raise ValueError(
            "grid_bounds: empty table (or all-null layout dims) — a grid "
            "cannot be published from no data"
        )
    return (int(r[0]), int(r[1]), int(r[2]), int(r[3]))


def grid_bins_fixed(
    df: DataFrame, xcol: str, ycol: str, bounds: tuple
) -> DataFrame:
    """``grid_bins`` with caller-supplied literal bounds — the identical
    ``_bin_sql`` formula, so rows bin the same whether bounds came from
    the same frame's aggregate or from the published grid."""
    xlo, xhi, ylo, yhi = (int(v) for v in bounds)
    if xhi < xlo or yhi < ylo:
        raise ValueError(
            f"grid_bins_fixed: inverted bounds {bounds} — a negative grid "
            "extent would bin silently wrong"
        )
    return df.select(
        "*",
        F.expr(_bin_sql(xcol, str(xlo), str(xhi))).alias("bx"),
        F.expr(_bin_sql(ycol, str(ylo), str(yhi))).alias("by"),
    ).withColumn("zkey", F.expr(interleave_sql("bx", "by")))


def layout_explode(g: DataFrame) -> DataFrame:
    """Every binned row contributes its bucket under BOTH layouts via a
    2-element explode (map-side, one scan — not a union of two)."""
    return g.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("linear_x").alias("layout"),
                    F.expr(f"bx div {ZO_LIN_W}").alias("bucket"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(f"zkey div {ZO_Z_W}").alias("bucket"),
                ),
            )
        ).alias("lb"),
        "bx",
        "by",
    ).select("lb.layout", "lb.bucket", "bx", "by")


def probes_df(spark) -> DataFrame:
    return spark.createDataFrame(
        list(ZO_PROBES),
        "probe string, pxlo long, pxhi long, pylo long, pyhi long",
    )


def zone_merge(partials: DataFrame) -> DataFrame:
    """Merge zone-map partials across any split: min-of-mins /
    max-of-maxes / sum-of-counts — associative, commutative, exact, so
    partition or microbatch boundaries provably cannot change the
    merged table."""
    return partials.groupBy("layout", "bucket").agg(
        F.min("min_bx").alias("min_bx"),
        F.max("max_bx").alias("max_bx"),
        F.min("min_by").alias("min_by"),
        F.max("max_by").alias("max_by"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )


def scan_counts(zm: DataFrame, probes: DataFrame) -> DataFrame:
    """Buckets/rows a zone-map-pruned scan touches per (layout, probe):
    the <= 2*ZO_BUCKETS-row zone-map table against the broadcast probe
    rectangles."""
    return (
        zm.join(
            F.broadcast(probes),
            (F.col("min_bx") <= F.col("pxhi"))
            & (F.col("max_bx") >= F.col("pxlo"))
            & (F.col("min_by") <= F.col("pyhi"))
            & (F.col("max_by") >= F.col("pylo")),
        )
        .groupBy("layout", "probe")
        .agg(
            F.count(F.lit(1)).cast("long").alias("buckets_scanned"),
            F.sum("n_rows").cast("long").alias("rows_scanned"),
        )
    )


def matched_counts(g: DataFrame, probes: DataFrame) -> DataFrame:
    """Ground truth per probe: how many rows actually fall inside the
    rectangle (layout-independent)."""
    return (
        g.join(
            F.broadcast(probes),
            F.col("bx").between(F.col("pxlo"), F.col("pxhi"))
            & F.col("by").between(F.col("pylo"), F.col("pyhi")),
        )
        .groupBy("probe")
        .agg(F.count(F.lit(1)).cast("long").alias("rows_matched"))
    )


def zone_maps(layouted: DataFrame) -> DataFrame:
    """Per-(layout, bucket) min/max of both grid coordinates + row count:
    the zone-map table a scan prunes against.  One combiner-friendly
    shuffle of <= 2*ZO_BUCKETS rows."""
    return layouted.groupBy("layout", "bucket").agg(
        F.min("bx").alias("min_bx"),
        F.max("bx").alias("max_bx"),
        F.min("by").alias("min_by"),
        F.max("by").alias("max_by"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def write_zordered(df: DataFrame, path: str, order_col: str, n_files: int) -> None:
    """The production layout writer: distributed range-sort on
    ``order_col`` (Spark samples boundaries — balanced files without a
    single-partition sort), rows sorted within each file so parquet
    row-group min/max footers are tight zone maps on every column that
    is monotone-ish along the curve."""
    (
        df.repartitionByRange(n_files, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
