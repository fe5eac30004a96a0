"""Model-family smoke tests: every reference workload builds and steps."""

import os

import numpy as np
import pytest

from easysimp_tpu.models import beam_2x1x1, cantilever
from easysimp_tpu.models.tol_study import run_tolerance_study

REF_DATA = "/root/reference/data"


@pytest.mark.parametrize("variant", ["basic", "sliding", "acceleration"])
def test_cantilever_variants(variant):
    res = cantilever.run(variant, nels=(12, 4, 2), max_iterations=3)
    assert np.isfinite(res.energy)
    assert res.energy_history[-1] < res.energy_history[0]


@pytest.mark.parametrize("variant",
                         ["four_legs", "mbb", "michell", "michell_half"])
def test_beam_variants(variant):
    res = beam_2x1x1.run(variant, nels=(8, 4, 4), max_iterations=3)
    assert np.isfinite(res.energy)
    assert res.energy_history[-1] < res.energy_history[0]
    # volume constraint on physical densities
    assert abs(res.volume / 2.0 - 0.4) < 1e-5  # domain volume = 2.0


def test_full_resolution_builders():
    """Node selections at the reference resolutions are non-trivial."""
    grid, loads, bcs, params, _ = beam_2x1x1.build_four_legs()
    assert grid.nels == (40, 20, 20)
    assert len(bcs[0].nodes) > 20          # 4 corner patches
    assert len(loads[0].nodes) >= 4        # circular tip region
    grid, loads, bcs, params, _ = beam_2x1x1.build_mbb()
    assert len(bcs) == 3                   # symmetry + roller + z-pin
    assert bcs[0].components == (0,)
    assert bcs[1].components == (1,)
    assert bcs[2].components == (2,)
    grid, loads, bcs, params, _ = cantilever.build_basic()
    assert grid.nels == (60, 20, 4)
    assert len(loads[0].nodes) >= 1


@pytest.mark.skipif(not os.path.exists(REF_DATA), reason="no reference data")
def test_gripper_builds():
    from easysimp_tpu.models import gripper

    mesh, loads, bcs, params, accel = gripper.build()
    assert mesh.cell_type == "hex8"
    assert len(bcs[0].nodes) > 0 and len(bcs[1].nodes) > 0
    assert len(loads) == 2
    assert accel is not None


@pytest.mark.skipif(not os.path.exists(REF_DATA), reason="no reference data")
def test_wheel_builds():
    from easysimp_tpu.models import wheel

    mesh, loads, bcs, params, accel = wheel.build()
    assert mesh.cell_type == "tet4"
    assert len(bcs[0].nodes) > 0
    assert len(loads[0].nodes) > 0


def test_tolerance_study_harness(tmp_path):
    rows = run_tolerance_study(
        beam_2x1x1.build_four_legs, tolerances=(0.16, 0.08),
        results_root=str(tmp_path), task_name="t", nels=(8, 4, 4),
        max_iterations=20)
    assert len(rows) == 2
    assert rows[0]["iterations"] <= rows[1]["iterations"]
    assert (tmp_path / "t_batch_summary.txt").exists()
    # per-run exports
    assert (tmp_path / "t_08tol" / "optimization_progress.csv").exists()
