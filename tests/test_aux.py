"""Auxiliary subsystems: checkpoint/resume, mesh extraction, FD verifier."""

import os

import numpy as np
import pytest

import easysimp_tpu as et
from easysimp_tpu.models import cantilever


def _problem():
    return cantilever.build_basic(nels=(10, 4, 2), max_iterations=8,
                                  tolerance=1e-9)


class TestCheckpointResume:
    def test_resume_reproduces_uninterrupted_run(self, tmp_path):
        grid, loads, bcs, params, _ = _problem()
        params.dtype = "float64"
        res_full = et.simp_optimize(grid, loads, bcs, params)

        # interrupted run: 4 iterations, checkpoint, then resume for 4 more
        grid, loads, bcs, p1, _ = _problem()
        p1.dtype = "float64"
        p1.max_iterations = 4
        p1.checkpoint_interval = 4
        p1.checkpoint_path = str(tmp_path / "ckpt")
        et.simp_optimize(grid, loads, bcs, p1)
        assert os.path.exists(str(tmp_path / "ckpt.npz"))

        grid, loads, bcs, p2, _ = _problem()
        p2.dtype = "float64"
        res_resumed = et.simp_optimize(
            grid, loads, bcs, p2, resume_from=str(tmp_path / "ckpt"))

        assert res_resumed.iterations == res_full.iterations
        np.testing.assert_allclose(res_resumed.energy_history,
                                   res_full.energy_history, rtol=1e-10)
        np.testing.assert_allclose(res_resumed.densities, res_full.densities,
                                   atol=1e-12)

    def test_resume_with_recycling_reproduces_run(self, tmp_path):
        """The subspace-recycling ring buffer is checkpointed state: a
        resumed recycled run must reproduce the uninterrupted recycled
        trajectory to fp64 roundoff (a zeroed buffer would change warm
        starts within cg_rtol — correct, but not bit-reproducing)."""
        def with_recycle(p):
            p.dtype = "float64"
            p.cg_recycle_k = 3
            return p

        grid, loads, bcs, params, _ = _problem()
        res_full = et.simp_optimize(grid, loads, bcs, with_recycle(params))

        grid, loads, bcs, p1, _ = _problem()
        p1 = with_recycle(p1)
        p1.max_iterations = 4
        p1.checkpoint_interval = 4
        p1.checkpoint_path = str(tmp_path / "rk")
        et.simp_optimize(grid, loads, bcs, p1)

        grid, loads, bcs, p2, _ = _problem()
        res_resumed = et.simp_optimize(
            grid, loads, bcs, with_recycle(p2),
            resume_from=str(tmp_path / "rk"))

        np.testing.assert_allclose(res_resumed.energy_history,
                                   res_full.energy_history, rtol=1e-10)
        np.testing.assert_allclose(res_resumed.densities, res_full.densities,
                                   atol=1e-12)

    def test_checkpoint_roundtrip(self, tmp_path):
        from easysimp_tpu.opt.checkpoint import load_checkpoint, \
            save_checkpoint

        rng = np.random.default_rng(0)
        path = save_checkpoint(
            str(tmp_path / "s"), design=rng.uniform(size=(4, 3, 2)),
            u=rng.standard_normal((5, 4, 3, 3)), iteration=7,
            energy_history=[3.0, 2.0], volume_history=[1.0, 1.0],
            change_history=[0.2, 0.1], cg_history=[10, 12],
            checkpoint_triggered=[True, False])
        state = load_checkpoint(path)
        assert state["iteration"] == 7
        assert state["cg_history"] == [10, 12]
        assert state["checkpoint_triggered"] == [True, False]
        assert state["design"].shape == (4, 3, 2)


def test_extract_mesh_from_vtu(tmp_path):
    from easysimp_tpu.post.vtu import read_vtu, write_vtu
    from easysimp_tpu.utils.extract_mesh import extract_mesh_from_vtu

    grid = et.generate_grid((3, 2, 2))
    src = write_vtu(str(tmp_path / "res"), grid.node_coords,
                    grid.hex_connectivity, 12,
                    cell_data={"density": np.ones(grid.n_cells)})
    out = extract_mesh_from_vtu(src)
    back = read_vtu(out)
    assert back.cell_data == {}
    np.testing.assert_allclose(back.points, grid.node_coords)


def test_verify_sensitivities_utility(capsys):
    from easysimp_tpu.opt.verify_sensitivities import verify_sensitivities

    grid, loads, bcs, params, _ = cantilever.build_basic(nels=(6, 3, 2))
    a, fd, rel = verify_sensitivities(grid, loads, bcs, params, n_elements=4,
                                      perturbation=1e-6)
    assert np.all(rel < 1e-3)
    assert np.all(a < 0)  # compliance sensitivities are negative


def test_unstructured_checkpoint_resume(tmp_path):
    """Resume reproduces the uninterrupted run on the unstructured path."""
    from test_unstructured import tet_mesh_from_voxels

    mesh = tet_mesh_from_voxels((4, 2, 2))
    fixed = et.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-6)
    tip = et.select_nodes_by_box(mesh, [4, 0, 0], [4, 0, 2])
    bc = et.apply_fixed_boundary(mesh, fixed)
    load = et.PointLoad(tip, [0.0, -1.0, 0.0])

    def params(**kw):
        return et.OptimizationParameters(
            E0=100.0, Emin=1e-6, volume_fraction=0.5, tolerance=1e-9,
            filter_radius=1.5, dtype="float64", cg_rtol=1e-12, **kw)

    res_full = et.simp_optimize(mesh, [load], [bc], params(max_iterations=6))
    et.simp_optimize(mesh, [load], [bc], params(
        max_iterations=3, checkpoint_interval=3,
        checkpoint_path=str(tmp_path / "uck")))
    res_resumed = et.simp_optimize(
        mesh, [load], [bc], params(max_iterations=6),
        resume_from=str(tmp_path / "uck"))
    np.testing.assert_allclose(res_resumed.energy_history,
                               res_full.energy_history, rtol=1e-10)
    np.testing.assert_allclose(res_resumed.densities, res_full.densities,
                               atol=1e-12)


def test_unstructured_checkpoint_resume_with_recycling(tmp_path):
    """The recycle ring buffer round-trips through unstructured checkpoints
    too (same bit-reproducing-resume contract as the voxel driver)."""
    from test_unstructured import tet_mesh_from_voxels

    mesh = tet_mesh_from_voxels((4, 2, 2))
    fixed = et.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-6)
    tip = et.select_nodes_by_box(mesh, [4, 0, 0], [4, 0, 2])
    bc = et.apply_fixed_boundary(mesh, fixed)
    load = et.PointLoad(tip, [0.0, -1.0, 0.0])

    def params(**kw):
        return et.OptimizationParameters(
            E0=100.0, Emin=1e-6, volume_fraction=0.5, tolerance=1e-9,
            filter_radius=1.5, dtype="float64", cg_rtol=1e-12,
            cg_recycle_k=3, **kw)

    res_full = et.simp_optimize(mesh, [load], [bc], params(max_iterations=6))
    et.simp_optimize(mesh, [load], [bc], params(
        max_iterations=3, checkpoint_interval=3,
        checkpoint_path=str(tmp_path / "urk")))
    res_resumed = et.simp_optimize(
        mesh, [load], [bc], params(max_iterations=6),
        resume_from=str(tmp_path / "urk"))
    np.testing.assert_allclose(res_resumed.energy_history,
                               res_full.energy_history, rtol=1e-10)
    np.testing.assert_allclose(res_resumed.densities, res_full.densities,
                               atol=1e-12)
