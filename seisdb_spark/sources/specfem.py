"""SPECFEM3D binary sources (SURVEY §2.1, operators S1-S6).

The reference reads SPECFEM's Fortran unformatted-sequential dumps with file
handles and raw byte offsets on a single node
(`/root/reference/seisdb/DSEM_Utils/bin_reader.py:13-74`,
`ibool_reader.py:14-33`, `disp_reader.py:13-25`,
`strainfield_reader.py:13-72`).  Here the same formats are decoded
*distributedly*: files arrive as ``(path, content)`` rows from Spark's
``binaryFile`` source (one task per file, no driver involvement, scales to
millions of snapshot files), and pure-numpy kernels inside ``mapInPandas``
(Arrow-batched) turn each file into long rows against an explicit schema.

Decode kernels are format knowledge, not ported code:

* A Fortran unformatted-sequential record is ``[int32 len][payload][int32
  len]``.  The reference skips the markers with sample offsets
  (``offset=1``, ``inter_offset=2`` at ``strainfield_reader.py:43-45``);
  we parse the framing explicitly and validate the trailing marker.
* ibool payload: ``NSPEC*125`` int32, **1-based** on disk; shifted to
  0-based at decode (reference does the same at ``ibool_reader.py:31``).
* strain payload: 6 records of ``NSPEC*125`` float32 in order
  ``(trace, xx_dev, yy_dev, xy, xz, yz)``; full-tensor completion
  (``strainfield_reader.py:57-59``) is float32 arithmetic:
  ``exx = xx_dev + tr/3; eyy = yy_dev + tr/3; ezz = tr - exx - eyy``.
* displacement payload: one record of ``NGLL*3`` float32, point-major
  ``(ux, uy, uz)`` per point (the reference's reshape+transpose at
  ``disp_reader.py:25`` is an AoS->SoA pivot that vanishes in long form).
"""

from __future__ import annotations

import os
import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seisdb_spark.schemas import (
    DISP_SCHEMA,
    IBOOL_SCHEMA,
    N_GLL_PER_ELEMENT,
    STRAIN_PARAS,
    STRAIN_SCHEMA,
)

# filename convention: proc%06d_<kind>_Step_%d.bin (DDBbase.py:74-76) and
# proc%06d_ibool.bin (DDBbase.py:50-51).
SNAPSHOT_RE = re.compile(r"proc(\d{6})_(.+)_Step_(\d+)\.bin$")
IBOOL_RE = re.compile(r"proc(\d{6})_ibool\.bin$")


# ---------------------------------------------------------------------------
# numpy decode kernels (S1/S2 framing, S4/S5/S6 payload semantics)
# ---------------------------------------------------------------------------
def split_fortran_records(buf: bytes) -> list[bytes]:
    """S1: parse Fortran unformatted-sequential framing into record payloads.

    Validates that each trailing length marker matches the leading one —
    corrupt or truncated files fail loudly instead of yielding garbage.
    """
    out: list[bytes] = []
    pos, n = 0, len(buf)
    while pos + 4 <= n:
        (reclen,) = struct.unpack_from("<i", buf, pos)
        end = pos + 4 + reclen
        if end + 4 > n:
            raise ValueError(f"truncated Fortran record at byte {pos} (len={reclen})")
        (trailer,) = struct.unpack_from("<i", buf, end)
        if trailer != reclen:
            raise ValueError(f"record marker mismatch at byte {pos}: {reclen} != {trailer}")
        out.append(buf[pos + 4 : end])
        pos = end + 4
    if pos != n:
        raise ValueError(f"{n - pos} trailing bytes after last Fortran record")
    return out


def read_samples_at(buf: bytes, offset_samples: int, count: int, dtype=np.float32) -> np.ndarray:
    """S2: raw offset scan — seek to ``offset*itemsize`` and read ``count``
    items, the reference's marker-skipping access pattern
    (``bin_reader.py:53-74``)."""
    itemsize = np.dtype(dtype).itemsize
    start = offset_samples * itemsize
    return np.frombuffer(buf, dtype=dtype, count=count, offset=start)


def decode_ibool(buf: bytes, nspec: int) -> np.ndarray:
    """S4: ibool scan -> (NSPEC, 125) int32, shifted to 0-based ids."""
    payload = split_fortran_records(buf)[0]
    ib = np.frombuffer(payload, dtype="<i4")
    if ib.size != nspec * N_GLL_PER_ELEMENT:
        raise ValueError(f"ibool size {ib.size} != NSPEC*125 = {nspec * N_GLL_PER_ELEMENT}")
    # disk ids are 1-based (ibool_reader.py:31)
    return ib.reshape(nspec, N_GLL_PER_ELEMENT) - 1


def decode_strain(buf: bytes, nspec: int) -> np.ndarray:
    """S6: strain scan + deviatoric->full completion -> (6, NSPEC, 125) float32.

    Record order on disk is (trace, xx_dev, yy_dev, xy, xz, yz); output
    component order is STRAIN_PARAS = (exx, eyy, ezz, exy, exz, eyz).
    All arithmetic in float32 to match the reference bit-for-bit.
    """
    n = nspec * N_GLL_PER_ELEMENT
    recs = split_fortran_records(buf)
    if len(recs) != 6:
        raise ValueError(f"strain file has {len(recs)} records, expected 6")
    tr, xxd, yyd, xy, xz, yz = (np.frombuffer(r, dtype="<f4", count=n) for r in recs)
    exx = xxd + tr / 3.0  # float32 array / python scalar stays float32
    eyy = yyd + tr / 3.0
    ezz = tr - exx - eyy
    full = np.stack([exx, eyy, ezz, xy, xz, yz])
    return full.reshape(6, nspec, N_GLL_PER_ELEMENT)


def decode_disp(buf: bytes, ngll: int | None = None) -> np.ndarray:
    """S5: displacement scan -> (3, NGLL) float32 channel-major.  NGLL is
    validated when given, inferred from the record length otherwise (procs
    in one distributed job can have different point counts)."""
    payload = split_fortran_records(buf)[0]
    dat = np.frombuffer(payload, dtype="<f4")
    if dat.size % 3:
        raise ValueError(f"disp record of {dat.size} floats is not 3 channels per point")
    if ngll is not None and dat.size != ngll * 3:
        raise ValueError(f"disp size {dat.size} != NGLL*3 = {ngll * 3}")
    return dat.reshape(dat.size // 3, 3).T


# ---------------------------------------------------------------------------
# Spark readers: binaryFile -> mapInPandas -> long DataFrames
# ---------------------------------------------------------------------------
def _binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    return spark.read.format("binaryFile").load(path_glob)


def read_ibool(spark: SparkSession, path_glob: str, nspec: int) -> DataFrame:
    """Distributed S4: every proc's ibool file -> long (proc, i_spec, i_gll,
    gll_id) rows.  One task per file; ids already 0-based."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                m = IBOOL_RE.search(os.path.basename(path))
                if not m:
                    continue
                proc = int(m.group(1))
                ib = decode_ibool(bytes(content), nspec)
                nsp, ng = ib.shape
                yield pd.DataFrame(
                    {
                        "proc": np.full(nsp * ng, proc, dtype=np.int32),
                        "i_spec": np.repeat(np.arange(nsp, dtype=np.int32), ng),
                        "i_gll": np.tile(np.arange(ng, dtype=np.int32), nsp),
                        "gll_id": ib.ravel().astype(np.int32),
                    }
                )

    return _binary_files(spark, path_glob).select("path", "content").mapInPandas(
        decode, IBOOL_SCHEMA
    )


def read_strain_snapshots(
    spark: SparkSession, force_dirs: list[str], nspec: int, name_data: str = "strain_field"
) -> DataFrame:
    """Distributed S6: the 3 per-force snapshot directories -> one long
    STRAIN_SCHEMA DataFrame.  ``force_dirs`` order defines force ids 0/1/2
    (N/E/Z), mirroring the reference's dNEZ_dirList convention
    (DSGT.py:103-111)."""
    parts = []
    for force, d in enumerate(force_dirs):
        glob = os.path.join(d, f"proc*_{name_data}_Step_*.bin")

        def decode(batches: Iterator[pd.DataFrame], force: int = force) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for path, content in zip(pdf["path"], pdf["content"]):
                    m = SNAPSHOT_RE.search(os.path.basename(path))
                    if not m:
                        continue
                    proc, step = int(m.group(1)), int(m.group(3))
                    full = decode_strain(bytes(content), nspec)  # (6, nspec, 125)
                    nsp = full.shape[1]
                    ncell = nsp * N_GLL_PER_ELEMENT
                    cols = {
                        "proc": np.full(ncell, proc, dtype=np.int32),
                        "force": np.full(ncell, force, dtype=np.int32),
                        "step": np.full(ncell, step, dtype=np.int32),
                        "i_spec": np.repeat(np.arange(nsp, dtype=np.int32), N_GLL_PER_ELEMENT),
                        "i_gll": np.tile(np.arange(N_GLL_PER_ELEMENT, dtype=np.int32), nsp),
                    }
                    for i, para in enumerate(STRAIN_PARAS):
                        cols[para] = full[i].ravel()
                    yield pd.DataFrame(cols)

        parts.append(
            _binary_files(spark, glob).select("path", "content").mapInPandas(
                decode, STRAIN_SCHEMA
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_disp_snapshots(
    spark: SparkSession, force_dirs: list[str], ngll: int | None = None, name_data: str = "disp"
) -> DataFrame:
    """Distributed S5: displacement snapshots -> long DISP_SCHEMA rows."""
    parts = []
    for force, d in enumerate(force_dirs):
        glob = os.path.join(d, f"proc*_{name_data}_Step_*.bin")

        def decode(batches: Iterator[pd.DataFrame], force: int = force) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for path, content in zip(pdf["path"], pdf["content"]):
                    m = SNAPSHOT_RE.search(os.path.basename(path))
                    if not m:
                        continue
                    proc, step = int(m.group(1)), int(m.group(3))
                    dat = decode_disp(bytes(content), ngll)  # (3, n_points)
                    n_points = dat.shape[1]
                    yield pd.DataFrame(
                        {
                            "proc": np.full(n_points, proc, dtype=np.int32),
                            "force": np.full(n_points, force, dtype=np.int32),
                            "step": np.full(n_points, step, dtype=np.int32),
                            "gll_id": np.arange(n_points, dtype=np.int32),
                            "ux": dat[0],
                            "uy": dat[1],
                            "uz": dat[2],
                        }
                    )

        parts.append(
            _binary_files(spark, glob).select("path", "content").mapInPandas(
                decode, DISP_SCHEMA
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_listing(spark: SparkSession, force_dirs: list[str], name_data: str) -> DataFrame:
    """File listing as a DataFrame (path metadata only — selecting just
    ``path`` prunes the content column, so no file bytes are read).  Feeds
    the P3 valid-step filter (DDBbase.py:55-84) as a join instead of a
    driver-side os.path.exists loop.  A dir with no matching files yields
    zero rows (not a PATH_NOT_FOUND error), so the empty-steps case surfaces
    through the pipeline's explicit check, as in the reference
    (DDBbase.py:82-84)."""
    parts = []
    for force, d in enumerate(force_dirs):
        glob = os.path.join(d, f"proc*_{name_data}_Step_*.bin")
        try:
            files = _binary_files(spark, glob)
        except AnalysisException:
            parts.append(spark.createDataFrame([], "proc int, force int, step int"))
            continue
        df = (
            files
            .select("path")
            .withColumn("force", F.lit(force))
            .withColumn("base", F.element_at(F.split(F.col("path"), "/"), -1))
            .withColumn(
                "proc",
                F.regexp_extract("base", r"proc(\d{6})_", 1).cast("int"),
            )
            .withColumn(
                "step",
                F.regexp_extract("base", r"_Step_(\d+)\.bin$", 1).cast("int"),
            )
            .select("proc", "force", "step")
        )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
