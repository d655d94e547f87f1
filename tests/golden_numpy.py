"""Independent numpy re-expression of the reference algorithm — the golden
oracle for the Spark pipeline (VERDICT.md next-round item 1, SURVEY §5.2-2).

Semantics mirrored (not code): running-max dedup `ibool_reader.py:116-173`,
valid-step existence filter `DDBbase.py:55-84`, strain completion
`strainfield_reader.py:57-59`, buffer gather `DSGT.py:98-115` /
`DDGF.py:96-112`, flatten+encode `DSGT.py:117-170` / `DDGF.py:124-163`.
Reads fixture files with its own streaming file-handle record reader
(scipy's FortranFile is not in this container), kept independent of the
engine's in-memory parser so the two cross-validate each other and the
fixture writer.

Deliberate deviations (same as the engine, SURVEY §7):
  - length is the true ``len(blob)``, not sys.getsizeof;
  - constant series encode to zero codes with scale=0.0 (reference is UB).
"""

from __future__ import annotations

import os
import zlib

import struct

import numpy as np

from seisdb_spark.schemas import INDEX27, N_GLL_PER_ELEMENT


def _read_record(fh, dtype) -> np.ndarray:
    """Read one Fortran unformatted-sequential record from an open handle
    (the access pattern scipy.io.FortranFile.read_reals implements)."""
    head = fh.read(4)
    if len(head) < 4:
        raise EOFError("no record header")
    (reclen,) = struct.unpack("<i", head)
    payload = fh.read(reclen)
    (trailer,) = struct.unpack("<i", fh.read(4))
    assert trailer == reclen, f"marker mismatch {reclen} != {trailer}"
    return np.frombuffer(payload, dtype=dtype)


def load_ibool(path: str, nspec: int) -> np.ndarray:
    with open(path, "rb") as fh:
        ib = _read_record(fh, np.int32)
    return ib.reshape(nspec, N_GLL_PER_ELEMENT) - 1


def running_max_dedup(ib: np.ndarray, points_per_element: int = 27):
    """The reference's literal order-dependent dedup: scan cells row-major,
    keep a cell iff its id exceeds the running max."""
    cols = np.asarray(INDEX27) if points_per_element == 27 else np.arange(ib.shape[1])
    names, cells = [], []
    current = -1
    for i_spec in range(ib.shape[0]):
        for i_gll in cols:
            gid = ib[i_spec, i_gll]
            if gid > current:
                current = gid
                names.append(gid)
                cells.append((i_spec, i_gll))
    return np.asarray(names), np.asarray(cells)


def load_strain_full(path: str, nspec: int) -> np.ndarray:
    """(6, NSPEC, 125) float32 full strain, components (xx,yy,zz,xy,xz,yz)."""
    n = nspec * N_GLL_PER_ELEMENT
    with open(path, "rb") as fh:
        tr = _read_record(fh, np.float32)[:n]
        xxd = _read_record(fh, np.float32)[:n]
        yyd = _read_record(fh, np.float32)[:n]
        xy = _read_record(fh, np.float32)[:n]
        xz = _read_record(fh, np.float32)[:n]
        yz = _read_record(fh, np.float32)[:n]
    exx = xxd + tr / 3.0
    eyy = yyd + tr / 3.0
    ezz = tr - exx - eyy
    return np.stack([exx, eyy, ezz, xy, xz, yz]).reshape(6, nspec, N_GLL_PER_ELEMENT)


def load_disp(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        dat = _read_record(fh, np.float32)
    return dat.reshape(dat.size // 3, 3).T


def existing_steps(force_dirs, proc, name_data, step0, step1, dstep):
    out = []
    for step in range(step0, step1, dstep):
        if all(
            os.path.exists(os.path.join(d, f"proc{proc:06d}_{name_data}_Step_{step}.bin"))
            for d in force_dirs
        ):
            out.append(step)
    return out


def encode_point(flat: np.ndarray, level: int = 8):
    """float32 offset/scale/quantize/zlib — one point's flattened series."""
    data = flat.astype(np.float32)
    offset = data.min()
    data = data - offset
    scale = data.max()
    dtype = np.uint8 if level == 8 else np.uint16
    if scale > 0:
        codes = ((data / scale) * (2**level - 1)).astype(dtype)
    else:
        codes = np.zeros(data.size, dtype=dtype)
    blob = zlib.compress(codes.tobytes())
    return float(offset), float(scale), codes, blob


def golden_sgt(model_dir, force_dirs, proc, nspec, step0, step1, dstep, level=8):
    """Full golden SGT build for one proc.  Returns parallel arrays keyed by
    the dedup emission order (ascending gll_id on conforming input)."""
    ib = load_ibool(os.path.join(model_dir, f"proc{proc:06d}_ibool.bin"), nspec)
    names, cells = running_max_dedup(ib, 27)
    steps = existing_steps(force_dirs, proc, "strain_field", step0, step1, dstep)
    n_gll, n_step = len(names), len(steps)

    buffer = np.zeros((n_gll, n_step, 3, 6), dtype=np.float32)
    for idx, step in enumerate(steps):
        for i_force, d in enumerate(force_dirs):
            eps = load_strain_full(
                os.path.join(d, f"proc{proc:06d}_strain_field_Step_{step}.bin"), nspec
            )
            for i_para in range(6):
                buffer[:, idx, i_force, i_para] = eps[i_para, cells[:, 0], cells[:, 1]]

    out = {"names": names, "offset": [], "scale": [], "length": [], "start": [], "blob": [], "codes": [], "flat": []}
    pos = 0
    for i in range(n_gll):
        # [force][para][time] flatten (DSGT.py:128-135)
        flat = buffer[i].transpose(1, 2, 0).ravel()
        offset, scale, codes, blob = encode_point(flat, level)
        out["flat"].append(flat)
        out["offset"].append(offset)
        out["scale"].append(scale)
        out["codes"].append(codes)
        out["blob"].append(blob)
        out["start"].append(pos)
        out["length"].append(len(blob))
        pos += len(blob)
    return out


def golden_dgf(model_dir, force_dirs, proc, nspec, step0, step1, dstep, level=8):
    """Golden DGF build: displacement gather by global id, [para][force][time]
    flatten (DDGF.py:128-132 — para-major)."""
    ib = load_ibool(os.path.join(model_dir, f"proc{proc:06d}_ibool.bin"), nspec)
    names, _cells = running_max_dedup(ib, 27)
    steps = existing_steps(force_dirs, proc, "disp", step0, step1, dstep)
    n_gll, n_step = len(names), len(steps)

    buffer = np.zeros((n_gll, n_step, 3, 3), dtype=np.float32)  # (para, force)
    for idx, step in enumerate(steps):
        for i_force, d in enumerate(force_dirs):
            dat = load_disp(os.path.join(d, f"proc{proc:06d}_disp_Step_{step}.bin"))
            for i_para in range(3):
                buffer[:, idx, i_para, i_force] = dat[i_para, names]

    out = {"names": names, "offset": [], "scale": [], "length": [], "start": [], "blob": [], "codes": [], "flat": []}
    pos = 0
    for i in range(n_gll):
        flat = buffer[i].transpose(1, 2, 0).ravel()  # (para, force, time)
        offset, scale, codes, blob = encode_point(flat, level)
        out["flat"].append(flat)
        out["offset"].append(offset)
        out["scale"].append(scale)
        out["codes"].append(codes)
        out["blob"].append(blob)
        out["start"].append(pos)
        out["length"].append(len(blob))
        pos += len(blob)
    return out
