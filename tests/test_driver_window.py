"""Driver-window governance: the harness hash-checks only the first 50
registry entries per round, so the window must (a) stay exactly 50 and
well-formed, and (b) — jointly with the r2/r3 windows recorded in the
repo's CORRECTNESS artifacts — cover EVERY oracle-bearing registry query,
so no query ships without a hard driver correctness row in some round."""

from __future__ import annotations

import json
import os

from seisdb_spark.queries import DRIVER_WINDOW, REGISTRY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_window(fname: str) -> set[str]:
    with open(os.path.join(REPO, fname)) as fh:
        return set(json.load(fh))


def test_window_is_50_unique_registered_names():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert all(n in REGISTRY for n in DRIVER_WINDOW)
    # the reorder actually happened: registry iteration leads with the window
    assert list(REGISTRY)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_windows_cumulatively_cover_every_oracle_query():
    """The union of every RECORDED round window plus the current one must
    include every oracle-bearing registry query — the rotation exists so
    none is forever pytest-only.  New CORRECTNESS_r*.json artifacts join
    the union automatically as the driver records them."""
    import glob

    recorded = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    assert len(recorded) >= 3  # r2..r4 exist today; later rounds accrue
    checked = set(DRIVER_WINDOW)
    for fname in recorded:
        checked |= _round_window(os.path.basename(fname))
    oracle_bearing = {n for n, s in REGISTRY.items() if s.oracle is not None}
    missing = sorted(oracle_bearing - checked)
    assert not missing, (
        f"{len(missing)} oracle-bearing queries have never been in a driver "
        f"window: {missing} — rotate them into DRIVER_WINDOW"
    )


def test_window_keeps_flagship_and_one_per_core_family():
    """Rotation must never drop the flagship or leave a §2 operator family
    without an in-window representative."""
    families = {
        "P": {"p1_positional_projection", "p3_stride_filter"},
        "J": {"j1_gather_join", "j2_semi_gather", "j3_step_alignment"},
        "D": {"d1_first_occurrence_dedup", "d1_running_max_dedup"},
        "A": {"a1a2_group_normalize", "a3_counts", "a4_prefix_sum"},
        "R": {"r1_array_assembly", "r2_canonical_flatten_arrays"},
        "L": {"l1_point_lookup", "l2_element_reorder"},
        "E": {"sgt_flagship_encode", "e1_quantize_codes"},
    }
    window = set(DRIVER_WINDOW)
    assert "sgt_flagship_encode" in window
    for fam, members in families.items():
        assert window & members, f"§2 family {fam} has no in-window member"
