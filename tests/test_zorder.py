"""Z-order layout operator (functions/zorder.py + zorder_layout_gate).

Engine parity of the gate itself is covered by test_oracle_parity; here:
the interleave golden (SQL polynomial == pure-Python bit interleave in
BOTH engines), the aligned-tile structure that makes Z-zone-maps tight
(every 1024-wide aligned zkey range is one 32x32 square), the pruning
claims the gate exists to certify, and the production writer's parquet
footers actually forming tight per-file zone maps on both dimensions.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from seisdb_spark.functions.zorder import (
    ZO_BITS,
    ZO_SIDE,
    ZO_Z_W,
    grid_bins,
    interleave_py,
    interleave_sql,
    write_zordered,
)
from seisdb_spark.queries import REGISTRY
from tests.conftest import SF_DIR, SMOKE_SF_DIR

EDGE = [0, 1, 2, 3, 31, 32, 96, 127, 128, 254, 255]
PAIRS = [(x, y) for x in EDGE for y in EDGE]


def test_interleave_python_golden_spark(spark):
    df = spark.createDataFrame(PAIRS, "bx long, by long").withColumn(
        "z", F.expr(interleave_sql("bx", "by"))
    )
    got = {(r.bx, r.by): r.z for r in df.collect()}
    for bx, by in PAIRS:
        assert got[(bx, by)] == interleave_py(bx, by), (bx, by)


def test_interleave_python_golden_duckdb_full_grid():
    """DuckDB evaluates the '//' form over the ENTIRE 256x256 grid;
    spot-check every diagonal + edge cell against the Python golden and
    pin injectivity (65536 distinct zkeys) + range [0, 65536)."""
    con = duckdb.connect()
    expr = interleave_sql("bx", "by", idiv="//")
    rows = con.execute(
        f"SELECT bx, by, {expr} AS z FROM "
        "(SELECT unnest(generate_series(0, 255)) AS bx), "
        "(SELECT unnest(generate_series(0, 255)) AS by)"
    ).fetchall()
    assert len(rows) == ZO_SIDE * ZO_SIDE
    zs = {r[2] for r in rows}
    assert len(zs) == ZO_SIDE * ZO_SIDE
    assert min(zs) == 0 and max(zs) == ZO_SIDE * ZO_SIDE - 1
    for bx, by, z in rows:
        if bx == by or bx in EDGE or by in EDGE:
            assert z == interleave_py(bx, by), (bx, by)


def test_aligned_zkey_ranges_are_square_tiles():
    """ZO_Z_W = 1024 = 4^5, so bucket = zkey // 1024 must equal the
    Morton index of the 32x32 tile containing the cell — the structural
    fact that makes every Z-bucket's zone map a square."""
    for bx in range(0, ZO_SIDE, 7):
        for by in range(0, ZO_SIDE, 11):
            bucket = interleave_py(bx, by, ZO_BITS) // ZO_Z_W
            tile = interleave_py(bx // 32, by // 32, 3)
            assert bucket == tile, (bx, by)


def test_gate_pruning_claims(spark):
    pdf = (
        REGISTRY["zorder_layout_gate"].spark(spark, SF_DIR).toPandas()
    )
    t = {
        (r.layout, r.probe): r for r in pdf.itertuples()
    }
    assert len(t) == 6
    # rows_matched is a layout-independent fact
    for p in ("x", "y", "xy"):
        assert t[("linear_x", p)].rows_matched == t[("zorder", p)].rows_matched
        for lay in ("linear_x", "zorder"):
            r = t[(lay, p)]
            assert r.rows_scanned >= r.rows_matched
            assert 1 <= r.buckets_scanned <= 64
    # sorted-by-x prunes the x-slab but must scan EVERYTHING for the
    # y-slab (each linear bucket spans the full y range)
    lin_y = t[("linear_x", "y")]
    assert lin_y.rows_scanned >= 4 * t[("zorder", "y")].rows_scanned
    # the Z-layout prunes BOTH single-dim probes and nails the box probe
    assert t[("zorder", "y")].buckets_scanned <= 16
    assert t[("zorder", "xy")].buckets_scanned <= 4
    # worst case over probes: the OPTIMIZE ZORDER claim
    worst_lin = max(t[("linear_x", p)].rows_scanned for p in ("x", "y", "xy"))
    worst_z = max(t[("zorder", p)].rows_scanned for p in ("x", "y", "xy"))
    assert worst_z * 2 <= worst_lin


def test_gate_plan_shape(spark):
    """No global sort and no unbroadcast cartesian anywhere: bucketing is
    integer key ranges, the only nested-loop joins carry broadcast 1-row
    (grid bounds) or 3-row (probes) sides."""
    df = REGISTRY["zorder_layout_gate"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # zone maps + scan counts aggregate, but nothing sorts the corpus
    assert "Sort [" not in plan.replace("SortAggregate", "")


def _file_zone_maps(path: str) -> list[tuple[int, int, int, int, int]]:
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins = {"bx": None, "by": None}
        maxs = {"bx": None, "by": None}
        n = 0
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            n += g.num_rows
            for c in ("bx", "by"):
                st = g.column(idx[c]).statistics
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        if n:
            out.append((mins["bx"], maxs["bx"], mins["by"], maxs["by"], n))
    return out


def _mean_area(zms) -> float:
    areas = [
        (xh - xl + 1) * (yh - yl + 1) / (ZO_SIDE * ZO_SIDE)
        for xl, xh, yl, yh, _ in zms
    ]
    return sum(areas) / len(areas)


def test_write_zordered_parquet_footers(spark, tmp_path):
    """The production writer: repartitionByRange on zkey + in-file sort.
    Parquet column statistics (the real zone maps a scan prunes with)
    must form small bounding boxes in BOTH dims, vs a sorted-by-x write
    whose per-file boxes span the full y range; both layouts must agree
    with each other on a both-dims filter."""
    ev = spark.read.parquet(os.path.join(SMOKE_SF_DIR, "events.parquet"))
    d = ev.select(
        "event_id",
        F.col("user_id").alias("x"),
        F.expr("cast(floor(value * 1000) as bigint)").alias("y"),
    )
    g = grid_bins(d, "x", "y").select("event_id", "bx", "by", "zkey")
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(g, zpath, "zkey", 16)
    write_zordered(g, lpath, "bx", 16)

    zzm, lzm = _file_zone_maps(zpath), _file_zone_maps(lpath)
    assert sum(n for *_, n in zzm) == sum(n for *_, n in lzm) == g.count()
    # Z-files: bounded boxes (each file spans a short z-range, never the
    # whole grid); and the scan-relevant metric — how many FILES a
    # y-slab probe must read from the footer stats alone — must favor
    # the Z-layout, while the x-sorted layout reads (nearly) all of
    # them because every x-slab file spans the y range.
    assert _mean_area(zzm) < 0.25

    def overlapping(zms, pxlo, pxhi, pylo, pyhi):
        return sum(
            1
            for xl, xh, yl, yh, _ in zms
            if xl <= pxhi and xh >= pxlo and yl <= pyhi and yh >= pylo
        )

    z_y = overlapping(zzm, 0, ZO_SIDE - 1, 96, 127)
    l_y = overlapping(lzm, 0, ZO_SIDE - 1, 96, 127)
    assert 2 * z_y <= l_y, (z_y, l_y)
    assert overlapping(zzm, 96, 127, 96, 127) <= z_y
    # correctness under the layout: a both-dims filter reads identically
    cond = "bx BETWEEN 96 AND 127 AND by BETWEEN 96 AND 127"
    zc = spark.read.parquet(zpath).where(cond)
    lc = spark.read.parquet(lpath).where(cond)
    assert sorted(r.event_id for r in zc.collect()) == sorted(
        r.event_id for r in lc.collect()
    )


def test_grid_bins_deterministic_under_repartition(spark):
    """Binning + zkey are pure functions of row content and the global
    min/max — the input's partition layout cannot change a single key."""
    ev = spark.read.parquet(os.path.join(SMOKE_SF_DIR, "events.parquet"))
    d = ev.select(
        "event_id",
        F.col("user_id").alias("x"),
        F.expr("cast(floor(value * 1000) as bigint)").alias("y"),
    )
    a = {r.event_id: r.zkey for r in grid_bins(d, "x", "y").collect()}
    b = {
        r.event_id: r.zkey
        for r in grid_bins(d.repartition(7), "x", "y").collect()
    }
    assert a == b


def test_grid_bounds_empty_and_inverted_guards(spark):
    """Publishing a grid from an empty table and binning under inverted
    bounds both fail loudly — either would otherwise bin silently wrong
    (None -> TypeError deep in int(); negative extent -> garbage bins)."""
    import pytest

    from seisdb_spark.functions.zorder import grid_bins_fixed, grid_bounds

    empty = spark.createDataFrame([], "x long, y long")
    with pytest.raises(ValueError, match="empty table"):
        grid_bounds(empty, "x", "y")
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="inverted bounds"):
        grid_bins_fixed(df, "x", "y", (10, 0, 0, 10))


def test_grid_bins_fixed_clamps_out_of_grid_rows(spark):
    """Rows outside a PUBLISHED grid (the streaming case: new extremes
    arriving after the grid was fixed) must clamp into the edge bins on
    BOTH sides — an unclamped low side would emit negative bins and
    silently corrupt zone maps."""
    from seisdb_spark.functions.zorder import ZO_SIDE, grid_bins_fixed

    df = spark.createDataFrame(
        [(-50, 5), (5, -50), (2000, 5), (5, 2000), (0, 999)],
        "x long, y long",
    )
    rows = grid_bins_fixed(df, "x", "y", (0, 999, 0, 999)).collect()
    for r in rows:
        assert 0 <= r.bx < ZO_SIDE and 0 <= r.by < ZO_SIDE, r
        assert 0 <= r.zkey < ZO_SIDE * ZO_SIDE, r
    byx = {(r.x, r.y): (r.bx, r.by) for r in rows}
    assert byx[(-50, 5)][0] == 0 and byx[(5, -50)][1] == 0
    assert byx[(2000, 5)][0] == ZO_SIDE - 1 and byx[(5, 2000)][1] == ZO_SIDE - 1
