"""Deterministic synthetic SPECFEM fixtures (FIXTURES.md §B).

Writes the exact on-disk layout the reference consumes — Fortran
unformatted-sequential records, 1-based ibool ids, deviatoric strain records
in (trace, xx_dev, yy_dev, xy, xz, yz) order, ``proc%06d_<kind>_Step_%d.bin``
filenames — so both our distributed decode path and a numpy golden
re-expression of the reference algorithm can run on the same bytes.

The generated mesh is *conforming*: elements share their x=0 GLL plane with
the previous element's x=4 plane, and new global ids are assigned in
encounter order.  That is the property that makes the reference's
running-max dedup (`ibool_reader.py:116-141`) equivalent to order-independent
first-occurrence dedup (SURVEY §2.4 D1) — tests assert both the equivalence
on conforming input and the divergence on a non-conforming counterexample.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from seisdb_spark.schemas import N_GLL_PER_ELEMENT, NGLLX, NGLLY, NGLLZ


def write_fortran_record(fh, arr: np.ndarray) -> None:
    marker = struct.pack("<i", arr.nbytes)
    fh.write(marker)
    fh.write(arr.tobytes())
    fh.write(marker)


def conforming_ibool(nspec: int, proc: int) -> np.ndarray:
    """(NSPEC, 125) int32 of 0-based global ids; x=0 plane of element e
    aliases the x=4 plane of element e-1; fresh ids in encounter order."""
    ib = np.zeros((nspec, N_GLL_PER_ELEMENT), dtype=np.int32)
    counter = 0
    for spec in range(nspec):
        for k in range(NGLLZ):
            for j in range(NGLLY):
                for i in range(NGLLX):
                    cell = k * NGLLY * NGLLX + j * NGLLX + i
                    if spec > 0 and i == 0:
                        ib[spec, cell] = ib[spec - 1, k * NGLLY * NGLLX + j * NGLLX + (NGLLX - 1)]
                    else:
                        ib[spec, cell] = counter
                        counter += 1
    return ib


def _field(rng: np.random.Generator, n: int) -> np.ndarray:
    # smooth-ish signed values, float32; includes negative amplitudes so the
    # A1 offset stage is exercised with offset < 0
    return (rng.standard_normal(n) * 0.5).astype(np.float32)


def generate_fixture(
    root: str,
    nprocs: int = 2,
    nspec: int = 3,
    step0: int = 0,
    step1: int = 80,
    dstep: int = 10,
    missing_steps: tuple[int, ...] = (30,),
    seed: int = 7,
    kinds: tuple[str, ...] = ("strain_field", "disp"),
) -> dict:
    """Write a complete fixture tree under ``root``:

        root/model/proc%06d_ibool.bin
        root/{N,E,Z}/proc%06d_strain_field_Step_%d.bin   (6 records each)
        root/{N,E,Z}/proc%06d_disp_Step_%d.bin           (1 record each)

    ``missing_steps`` are written only to the N dir (force 0), so the P3
    "exists in all 3 force dirs" predicate has something to reject.
    Returns metadata (ngll per proc, the valid step list, dirs).
    """
    rng = np.random.default_rng(seed)
    model_dir = os.path.join(root, "model")
    force_dirs = [os.path.join(root, d) for d in ("N", "E", "Z")]
    os.makedirs(model_dir, exist_ok=True)
    for d in force_dirs:
        os.makedirs(d, exist_ok=True)

    ngll_by_proc: dict[int, int] = {}
    steps = list(range(step0, step1, dstep))
    valid = [s for s in steps if s not in missing_steps]

    for proc in range(nprocs):
        ib = conforming_ibool(nspec, proc)
        ngll = int(ib.max()) + 1
        ngll_by_proc[proc] = ngll
        with open(os.path.join(model_dir, f"proc{proc:06d}_ibool.bin"), "wb") as fh:
            write_fortran_record(fh, (ib + 1).astype("<i4"))  # 1-based on disk

        n = nspec * N_GLL_PER_ELEMENT
        for step in steps:
            for force, d in enumerate(force_dirs):
                if step in missing_steps and force != 0:
                    continue
                if "strain_field" in kinds:
                    path = os.path.join(d, f"proc{proc:06d}_strain_field_Step_{step}.bin")
                    with open(path, "wb") as fh:
                        for _ in range(6):  # trace, xx_dev, yy_dev, xy, xz, yz
                            write_fortran_record(fh, _field(rng, n))
                if "disp" in kinds:
                    path = os.path.join(d, f"proc{proc:06d}_disp_Step_{step}.bin")
                    with open(path, "wb") as fh:
                        write_fortran_record(fh, _field(rng, ngll * 3))

    return {
        "model_dir": model_dir,
        "force_dirs": force_dirs,
        "nprocs": nprocs,
        "nspec": nspec,
        "ngll_by_proc": ngll_by_proc,
        "steps": steps,
        "valid_steps": valid,
        "step0": step0,
        "step1": step1,
        "dstep": dstep,
    }


_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".fixture_cache")


def cached_fixture(**kwargs) -> dict:
    """Idempotent fixture under the repo's .fixture_cache (gitignored) so
    queries() entries can run the real pipeline without a tmpdir.

    The cache key covers EVERY kwarg (tuple values included — two calls
    differing only in ``missing_steps``/``kinds`` must not collide), and the
    generation metadata is persisted next to the files and read back on a
    hit, so the hit path can never disagree with what is on disk."""
    key = "-".join(
        f"{k}{'_'.join(map(str, v)) if isinstance(v, tuple) else v}"
        for k, v in sorted(kwargs.items())
    )
    root = os.path.join(_CACHE_ROOT, key or "default")
    marker = os.path.join(root, ".meta.json")
    if not os.path.exists(marker):
        meta = generate_fixture(root, **kwargs)
        with open(marker, "w") as fh:
            json.dump(meta, fh)
        return meta
    with open(marker) as fh:
        meta = json.load(fh)
    meta["ngll_by_proc"] = {int(k): v for k, v in meta["ngll_by_proc"].items()}
    return meta
