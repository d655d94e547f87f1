"""Reference-format export parity: the packed per-proc ``*_data.bin`` files
must be BYTE-IDENTICAL to what the reference writer produces (re-expressed
by the golden numpy builder on the same fixture), and the header table must
carry the HDF5 datasets/attrs (DSGT.py:118-196) in blob order."""

from __future__ import annotations

import os

import pytest

from seisdb_spark.pipeline import (
    db_meta,
    dgf_build,
    export_reference_format,
    sgt_build,
    write_hdf5_headers,
)
from tests import golden_numpy as golden
from tests.conftest import NPROCS


def _export(spark, m, tmp_path, kind):
    build = sgt_build if kind == "SGT" else dgf_build
    records, meta, steps = build(
        spark,
        os.path.join(m["model_dir"], "proc*_ibool.bin"),
        m["force_dirs"],
        m["nspec"],
        m["step0"],
        m["step1"],
        m["dstep"],
        network="CI",
        station="USC",
    )
    out = str(tmp_path / f"refdb_{kind}")
    summary = export_reference_format(records, meta, out, kind=kind)
    return out, summary


@pytest.mark.parametrize("kind", ["SGT", "DGF"])
def test_data_bin_bytes_equal_golden_writer(spark, fixture_meta, tmp_path, kind):
    m = fixture_meta
    out, summary = _export(spark, m, tmp_path, kind)
    assert list(summary.proc) == list(range(NPROCS))
    gold_fn = golden.golden_sgt if kind == "SGT" else golden.golden_dgf
    suffix = "sgt_data" if kind == "SGT" else "dgf_data"
    for proc in range(NPROCS):
        g = gold_fn(
            m["model_dir"], m["force_dirs"], proc, m["nspec"],
            m["step0"], m["step1"], m["dstep"],
        )
        want = b"".join(g["blob"])  # the reference writer is exactly this
        path = os.path.join(out, f"proc{proc:06d}_{suffix}.bin")
        with open(path, "rb") as fh:
            got = fh.read()
        assert got == want, f"{kind} proc {proc} blob file differs"


def test_header_table_matches_golden(spark, fixture_meta, tmp_path):
    m = fixture_meta
    out, _ = _export(spark, m, tmp_path, "SGT")
    hdr = (
        spark.read.parquet(os.path.join(out, "headers_parquet"))
        .toPandas()
        .sort_values("proc")
        .reset_index(drop=True)
    )
    assert set(hdr.columns) >= {
        "index", "start", "length", "length_sizeof", "offset", "scale",
        "proc_name", "ngll", "nstep", "nforce", "nparas", "dt", "nspec",
        "type", "forder", "version",
    }
    for proc in range(NPROCS):
        g = golden.golden_sgt(
            m["model_dir"], m["force_dirs"], proc, m["nspec"],
            m["step0"], m["step1"], m["dstep"],
        )
        row = hdr[hdr.proc == proc].iloc[0]
        assert list(row["index"]) == [int(x) for x in g["names"]]
        assert list(row["start"]) == g["start"]
        assert list(row["length"]) == g["length"]
        # the reference's sys.getsizeof quirk (DSGT.py:163): len + 33
        assert list(row["length_sizeof"]) == [n + 33 for n in g["length"]]
        assert list(row["offset"]) == pytest.approx(g["offset"])
        assert list(row["scale"]) == pytest.approx(g["scale"])
        assert row["ngll"] == len(g["names"])
        assert row["type"] == "SGT"
        assert row["proc_name"] == f"proc{proc:06d}"


def test_empty_proc_still_gets_bin_and_header(spark, fixture_meta, tmp_path):
    """A proc present in db_meta but with zero surviving records must still
    produce its per-proc .bin file (empty) and a header row with empty
    dataset arrays — the reference writer always creates the file
    (DSGT.py:118-126 opens it before the record loop), so a consumer
    iterating procs from the header table never hits a missing file."""
    import os

    m = fixture_meta
    records, meta, _ = sgt_build(
        spark,
        os.path.join(m["model_dir"], "proc*_ibool.bin"),
        m["force_dirs"],
        m["nspec"],
        m["step0"],
        m["step1"],
        m["dstep"],
        network="CI",
        station="USC",
    )
    # drop every record of proc 0: meta still lists it
    out = str(tmp_path / "refdb_empty_proc")
    from pyspark.sql import functions as F

    summary = export_reference_format(
        records.filter(F.col("proc") != 0), meta, out, kind="SGT"
    )
    assert list(summary.proc) == list(range(NPROCS))
    row0 = summary[summary.proc == 0].iloc[0]
    assert row0.n_blobs == 0 and row0.n_bytes == 0
    path0 = os.path.join(out, "proc000000_sgt_data.bin")
    assert os.path.exists(path0) and os.path.getsize(path0) == 0
    hdr = spark.read.parquet(os.path.join(out, "headers_parquet")).toPandas()
    h0 = hdr[hdr.proc == 0].iloc[0]
    assert len(h0["index"]) == 0 and len(h0["start"]) == 0
    assert h0["proc_name"] == "proc000000"  # attrs still come from meta


def test_hdf5_headers_written_without_h5py(spark, fixture_meta, tmp_path):
    """The literal-.hdf5 conversion no longer needs h5py: the minimal
    spec-subset writer (pipeline/hdf5_min.py) produces one parseable file
    per proc (full content parity vs the parquet header table is covered
    in tests/test_hdf5_min.py)."""
    m = fixture_meta
    out, _ = _export(spark, m, tmp_path, "SGT")
    paths = write_hdf5_headers(spark, out, kind="SGT")
    assert [os.path.basename(p) for p in paths] == [
        f"proc{p:06d}_header.hdf5" for p in range(m["nprocs"])
    ]
    from tests.test_hdf5_min import read_hdf5

    for p in paths:
        ds, attrs = read_hdf5(p)
        assert set(ds) == {"index", "start", "length", "offset", "scale"}
        assert attrs["type"] == "SGT"
