"""Coarse-to-fine continuation (opt/continuation.py).

No reference analogue (the reference always starts uniform,
Optimization.jl:222); the invariants here are internal: exact volume
preservation of the design prolongation, trilinear node prolongation
consistency, faithful load/BC remapping, and an end-to-end run whose
final design quality matches the cold start while its early CG counts
drop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import easysimp_tpu as et
from easysimp_tpu.opt.continuation import (
    coarsen_problem,
    continuation_init,
    prolong_design,
    prolong_displacement,
)


def _problem(nels):
    grid = et.generate_grid(nels)
    nx, ny, nz = nels
    bc = et.apply_fixed_boundary(
        grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
    load = et.PointLoad(
        et.select_nodes_by_box(grid, [nx, 0, 0], [nx, 0, nz]),
        [0.0, -1.0, 0.0])
    return grid, bc, load


def test_prolong_design_preserves_volume():
    rng = np.random.default_rng(0)
    dc = jnp.asarray(rng.uniform(0.1, 0.9, size=(4, 3, 2)))
    df = prolong_design(dc)
    assert df.shape == (8, 6, 4)
    assert float(jnp.mean(df)) == pytest.approx(float(jnp.mean(dc)),
                                                rel=1e-14)
    # each coarse cell fills its 2x2x2 children exactly
    np.testing.assert_array_equal(np.asarray(df[::2, ::2, ::2]),
                                  np.asarray(dc))
    np.testing.assert_array_equal(np.asarray(df[1::2, 1::2, 1::2]),
                                  np.asarray(dc))


def test_prolong_displacement_matches_coarse_nodes():
    rng = np.random.default_rng(1)
    uc = jnp.asarray(rng.normal(size=(5, 4, 3, 3)))
    uf = prolong_displacement(uc)
    assert uf.shape == (9, 7, 5, 3)
    # injection at coincident (even) fine nodes
    np.testing.assert_allclose(np.asarray(uf[::2, ::2, ::2]),
                               np.asarray(uc), rtol=1e-14)
    # trilinear midpoints along one axis
    np.testing.assert_allclose(
        np.asarray(uf[1::2, ::2, ::2]),
        0.5 * (np.asarray(uc[:-1]) + np.asarray(uc[1:])), rtol=1e-13)


def test_coarsen_problem_remaps_bcs_and_loads():
    grid, bc, load = _problem((8, 4, 4))
    coarse, closs, cbcs = coarsen_problem(grid, [load], [bc])
    assert coarse.nels == (4, 2, 2)
    # the x=0 fixed plane maps onto the coarse x=0 plane, all of it
    expect_bc = et.select_nodes_by_plane(coarse, [0, 0, 0], [1, 0, 0], 1e-6)
    np.testing.assert_array_equal(np.sort(cbcs[0].nodes),
                                  np.sort(expect_bc))
    assert cbcs[0].components == bc.components
    # the load edge (x=8, y=0) maps onto the coarse edge, total force kept
    # (coordinates are PHYSICAL — identical across resolutions)
    expect_ld = et.select_nodes_by_box(coarse, [8, 0, 0], [8, 0, 4])
    np.testing.assert_array_equal(np.sort(closs[0].nodes),
                                  np.sort(expect_ld))
    assert closs[0].force_vector == load.force_vector
    # odd dims refuse
    with pytest.raises(ValueError, match="even"):
        coarsen_problem(et.generate_grid((7, 4, 4)), [load], [bc])


def test_continuation_init_shapes_and_volume():
    grid, bc, load = _problem((8, 4, 4))
    params = et.OptimizationParameters(
        E0=100.0, Emin=1e-6, volume_fraction=0.4, filter_radius=1.5,
        dtype="float64", cg_rtol=1e-8, continuation_levels=1,
        continuation_iters=3)
    d0, u0 = continuation_init(grid, [load], [bc], params)
    assert d0.shape == grid.nels
    assert u0.shape == (*grid.nnodes_per_axis, 3)
    # piecewise-constant prolongation of an OC-feasible design keeps the
    # volume constraint to bisection tolerance
    assert float(jnp.mean(d0)) == pytest.approx(0.4, abs=1e-5)
    # the prolonged displacement respects the x=0 Dirichlet plane
    assert float(jnp.max(jnp.abs(u0[0]))) == 0.0


def test_continuation_driver_end_to_end():
    """A continued run reaches the cold run's design quality (final energy
    within a few percent — the trajectories legitimately differ) while its
    FIRST fine-level CG count is at most the cold run's (the whole point)."""
    grid, bc, load = _problem((12, 6, 4))
    common = dict(E0=100.0, Emin=1e-6, volume_fraction=0.4,
                  filter_radius=1.5, dtype="float64", cg_rtol=1e-8,
                  max_iterations=10, tolerance=0.0)
    cold = et.simp_optimize(grid, [load], [bc],
                            et.OptimizationParameters(**common))
    warm = et.simp_optimize(
        grid, [load], [bc],
        et.OptimizationParameters(**common, continuation_levels=1,
                                  continuation_iters=8))
    assert warm.energy == pytest.approx(cold.energy, rel=0.05)
    assert abs(warm.volume - cold.volume) < 1e-6
    assert warm.cg_iterations_history[0] <= cold.cg_iterations_history[0]
