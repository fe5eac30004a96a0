"""Pallas fused kernels vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import easysimp_tpu as et
from easysimp_tpu.ops.pallas_kernels import (
    make_pallas_energies,
    make_pallas_matvec,
    pallas_matvec_available,
    select_blocks,
)


def _random_problem(nels, extents, seed=0):
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0), extents)
    op = et.VoxelOperator(grid, E0=3.0, Emin=1e-9, nu=0.3, p=3.0,
                          dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((*grid.nnodes_per_axis, 3)))
    rho = jnp.asarray(rng.uniform(0.05, 1.0, grid.nels))
    return grid, op, u, op.youngs_modulus(rho)


@pytest.mark.parametrize("nels,block", [
    ((16, 8, 4), 8),          # x-blocked only (BY = ny)
    ((8, 16, 8), 4),
    ((8, 16, 4), (4, 8)),     # y-blocked: 2 tiles in y
    ((8, 24, 4), (2, 8)),     # y-blocked: 3 tiles in y
])
def test_pallas_matvec_matches_xla(nels, block):
    grid, op, u, scale = _random_problem(nels, (1.6, 1.1, 0.9))
    assert pallas_matvec_available(grid, block)
    mv = make_pallas_matvec(op, block=block, interpret=True)
    got = np.asarray(mv(u, scale))
    want = np.asarray(op.apply_K(u, scale))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("nels,block", [
    ((16, 8, 4), (8, 8)),
    ((8, 16, 4), (4, 8)),     # y-blocked
])
def test_pallas_energies_match_xla(nels, block):
    grid, op, u, _ = _random_problem(nels, (1.3, 0.9, 1.1), seed=3)
    en = make_pallas_energies(op, block=block, interpret=True)
    got = np.asarray(en(u))
    want = np.asarray(op.element_energies_unit(u))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_unavailable_for_non_tiling_grid():
    grid = et.generate_grid((10, 6, 4))
    assert not pallas_matvec_available(grid, 8)


def test_select_blocks_fits_256_cubed():
    """The y-blocked variant keeps the kernel engaged at 256^3 (round-1
    VMEM-gate arithmetic: unblocked-y needs 46-89MB vs the 34MB budget)."""
    blocks = select_blocks((256, 256, 256))
    assert blocks is not None
    BX, BY = blocks
    assert 256 % BX == 0 and 256 % BY == 0 and BY < 256
    # 128^3 keeps the round-1 x-only tiling (BY = full ny)
    assert select_blocks((128, 128, 128)) == (4, 128)
    # non-power-of-two but 8-divisible y still tiles
    assert select_blocks((192, 192, 192)) is not None


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


@pytest.mark.parametrize("nels", [(8, 8, 8), (16, 16, 16), (32, 32, 32)])
def test_pallas_matvec_small_cubes(nels):
    """Coarse-multigrid-level shapes: exactly what install_fused_matvec
    would pick if the kernel is propagated below the 64-dim gate (the
    all-levels-pallas configuration under evaluation for the TPU
    mixed-program flake)."""
    from easysimp_tpu.ops.pallas_kernels import select_blocks

    block = select_blocks(nels)
    assert block is not None
    grid, op, u, scale = _random_problem(nels, (1.6, 1.1, 0.9), seed=7)
    mv = make_pallas_matvec(op, block=block, interpret=True)
    got = np.asarray(mv(u, scale))
    want = np.asarray(op.apply_K(u, scale))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_pallas_matvec_bfloat16_storage():
    """bf16 operator (mg_cycle_dtype path): storage stays bf16, in-kernel
    compute upcasts to fp32 (Mosaic roll is unimplemented for 16-bit).
    Tolerance reflects bf16 rounding of inputs/outputs."""
    import jax.numpy as jnp

    nels = (16, 8, 4)
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0), (1.6, 1.1, 0.9))
    op16 = et.VoxelOperator(grid, dtype=jnp.bfloat16)
    op64 = et.VoxelOperator(grid, dtype=jnp.float64)
    rng = np.random.default_rng(11)
    u = rng.standard_normal((*grid.nnodes_per_axis, 3))
    rho = rng.uniform(0.05, 1.0, grid.nels)
    scale64 = op64.youngs_modulus(jnp.asarray(rho))
    mv = make_pallas_matvec(op16, block=8, interpret=True)
    got = np.asarray(mv(jnp.asarray(u, jnp.bfloat16),
                        jnp.asarray(scale64, jnp.bfloat16)), dtype=np.float64)
    want = np.asarray(op64.apply_K(jnp.asarray(u), scale64))
    scale_ref = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale_ref, rtol=0.05)
