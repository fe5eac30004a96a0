"""Pallas fused matvec vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import easysimp_tpu as et
from easysimp_tpu.ops.pallas_kernels import (
    make_pallas_matvec,
    pallas_matvec_available,
)


@pytest.mark.parametrize("nels,block", [((16, 8, 4), 8), ((8, 16, 8), 4)])
def test_pallas_matvec_matches_xla(nels, block):
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                            (1.6, 1.1, 0.9))
    op = et.VoxelOperator(grid, E0=3.0, Emin=1e-9, nu=0.3, p=3.0,
                          dtype=jnp.float64)
    assert pallas_matvec_available(grid, block)
    mv = make_pallas_matvec(op, block=block, interpret=True)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((*grid.nnodes_per_axis, 3)))
    rho = jnp.asarray(rng.uniform(0.05, 1.0, grid.nels))
    scale = op.youngs_modulus(rho)
    got = np.asarray(mv(u, scale))
    want = np.asarray(op.apply_K(u, scale))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_unavailable_for_non_tiling_grid():
    grid = et.generate_grid((10, 6, 4))
    assert not pallas_matvec_available(grid, 8)


def test_optimize_with_pallas_matvec_matches():
    """2-iteration trajectory identical with the fused kernel installed."""
    grid = et.generate_grid((8, 8, 4), (0.0, 0.0, 0.0), (8.0, 8.0, 4.0))
    bc = et.apply_fixed_boundary(
        grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
    load = et.PointLoad(et.select_nodes_by_box(grid, [8, 0, 0], [8, 0, 4]),
                        [0.0, -1.0, 0.0])

    def run(use_pallas):
        params = et.OptimizationParameters(
            E0=100.0, Emin=1e-6, volume_fraction=0.5, max_iterations=2,
            tolerance=1e-9, filter_radius=1.5, dtype="float64",
            cg_rtol=1e-11, preconditioner="multigrid",
            use_pallas_matvec=use_pallas)
        return et.simp_optimize(grid, [load], [bc], params)

    res_x = run(False)
    res_p = run(True)
    np.testing.assert_allclose(res_p.energy_history, res_x.energy_history,
                               rtol=1e-10)
    np.testing.assert_allclose(res_p.densities, res_x.densities, atol=1e-10)
