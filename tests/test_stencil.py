"""Node-stencil assembly, BC folding, and Galerkin (RAP) coarsening.

Everything is verified against explicit dense linear algebra: the stencil
apply against the element-based matrix-free operator (itself verified against
the scipy-assembled K in test_operator.py), and the Galerkin coarsening
against literal dense P^T A P with P formed column-by-column from `prolong`.
"""

import numpy as np
import jax.numpy as jnp

import easysimp_tpu as et
from easysimp_tpu.ops.multigrid import prolong
from easysimp_tpu.ops.stencil import (
    apply_stencil,
    assemble_node_stencil,
    coarsen_stencil,
    compose_level_weights,
    fold_bc_into_stencil,
    level1_stencil_from_scale,
    level1_weights,
    level_stencil_from_scale,
    stencil_diagonal,
    stencil_row_abs_sums,
    stencil_to_dense,
)


def _problem(nels=(4, 3, 2), spacing=(0.7, 1.1, 0.9), seed=0):
    grid = et.generate_grid(
        nels, (0.0, 0.0, 0.0),
        tuple(n * s for n, s in zip(nels, spacing)))
    op = et.VoxelOperator(grid, E0=70.0, Emin=1e-6, nu=0.3, p=3.0,
                          dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    scale = jnp.asarray(op.youngs_modulus(rng.uniform(0.05, 1.0, nels)))
    u = jnp.asarray(rng.standard_normal((*grid.nnodes_per_axis, 3)))
    mask = np.ones((*grid.nnodes_per_axis, 3))
    mask[0, :, :, :] = 0.0                      # fix the x=0 plane
    mask[-1, 0, :, 1] = 0.0                     # plus a sliding edge
    return grid, op, scale, u, jnp.asarray(mask)


def _dense_prolongation(coarse_nnodes):
    """Dense P: columns are prolong() applied to coarse basis vectors."""
    ncx, ncy, ncz = coarse_nnodes
    cols = []
    for i in range(ncx):
        for j in range(ncy):
            for k in range(ncz):
                for c in range(3):
                    e = np.zeros((ncx, ncy, ncz, 3))
                    e[i, j, k, c] = 1.0
                    cols.append(np.asarray(prolong(jnp.asarray(e))).reshape(-1))
    return np.stack(cols, axis=1)


class TestStencilAssembly:
    def test_apply_matches_element_operator(self):
        """sum_o C_o(n) u(n+o) == scatter(E_e * ke @ u_e) to fp64 roundoff."""
        _, op, scale, u, _ = _problem()
        C = assemble_node_stencil(scale, op.ke)
        ref = np.asarray(op.apply_K(u, scale))
        out = np.asarray(apply_stencil(C, u))
        np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)

    def test_folded_bc_apply_matches_masked_operator(self):
        """Folded stencil == M K (M u) + (I - M) u exactly."""
        _, op, scale, u, mask = _problem(seed=1)
        C = fold_bc_into_stencil(assemble_node_stencil(scale, op.ke), mask)
        ref = np.asarray(op.apply(u, scale, mask) + (1.0 - mask) * u)
        out = np.asarray(apply_stencil(C, u))
        np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)

    def test_diagonal_and_row_abs(self):
        _, op, scale, u, mask = _problem(seed=2)
        C = fold_bc_into_stencil(assemble_node_stencil(scale, op.ke), mask)
        np.testing.assert_allclose(
            np.asarray(stencil_diagonal(C)),
            np.asarray(op.diagonal(scale, mask)), rtol=1e-12)
        K = np.asarray(stencil_to_dense(C))
        nnx, nny, nnz = C.shape[5:8]
        ref_rowabs = np.abs(K).sum(axis=1).reshape(nnx, nny, nnz, 3)
        np.testing.assert_allclose(
            np.asarray(stencil_row_abs_sums(C)), ref_rowabs, rtol=1e-12)

    def test_dense_roundtrip_symmetric(self):
        """stencil_to_dense is consistent with apply and symmetric."""
        _, op, scale, u, mask = _problem(seed=3)
        C = fold_bc_into_stencil(assemble_node_stencil(scale, op.ke), mask)
        K = np.asarray(stencil_to_dense(C))
        np.testing.assert_allclose(K, K.T, rtol=1e-12, atol=1e-12)
        out = K @ np.asarray(u).reshape(-1)
        ref = np.asarray(apply_stencil(C, u)).reshape(-1)
        np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


class TestGalerkinCoarsening:
    def test_rap_matches_dense(self):
        """coarsen_stencil == P^T A P with literal dense P (masked A)."""
        grid, op, scale, u, mask = _problem(nels=(4, 2, 2), seed=4)
        C = fold_bc_into_stencil(assemble_node_stencil(scale, op.ke), mask)
        A = np.asarray(stencil_to_dense(C))
        Cc = coarsen_stencil(C)
        Ac = np.asarray(stencil_to_dense(Cc))
        P = _dense_prolongation((3, 2, 2))
        np.testing.assert_allclose(Ac, P.T @ A @ P, rtol=1e-12, atol=1e-12)

    def test_rap_is_spd(self):
        """Galerkin coarse operator of the folded-BC fine operator is SPD."""
        grid, op, scale, u, mask = _problem(nels=(4, 4, 2), seed=5)
        C = fold_bc_into_stencil(assemble_node_stencil(scale, op.ke), mask)
        Ac = np.asarray(stencil_to_dense(coarsen_stencil(C)))
        w = np.linalg.eigvalsh(Ac)
        assert w.min() > 0.0

    def test_level1_conv_matches_assemble_then_coarsen(self):
        """The fused scale->level-1 conv == assemble fine + RAP (unmasked)."""
        grid, op, scale, u, _ = _problem(nels=(4, 2, 6), seed=6)
        C0 = assemble_node_stencil(scale, op.ke)
        ref = np.asarray(coarsen_stencil(C0))
        G = level1_weights(op.ke)
        out = np.asarray(level1_stencil_from_scale(scale, G))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-11, atol=1e-11)

    def test_direct_level_builds_match_rap_chain(self):
        """Host-composed weights + one im2col matmul per level == the full
        assemble-fine-then-RAP chain (unmasked), at levels 2 and 3."""
        grid, op, scale, u, _ = _problem(nels=(8, 8, 8), seed=8)
        C0 = assemble_node_stencil(scale, op.ke)
        G = level1_weights(np.asarray(op.ke, dtype=np.float64))
        ref = coarsen_stencil(C0)
        for lvl in (2, 3):
            G = compose_level_weights(G, lvl - 1)
            ref = coarsen_stencil(ref)
            out = np.asarray(level_stencil_from_scale(scale, G, lvl))
            assert out.shape == ref.shape
            np.testing.assert_allclose(out, np.asarray(ref),
                                       rtol=1e-11, atol=1e-11)

    def test_rap_twice_matches_dense(self):
        """Two RAP levels compose correctly (8^3 -> 4^3 -> 2^3 elements)."""
        grid, op, scale, u, mask = _problem(nels=(8, 4, 4), seed=7)
        C = fold_bc_into_stencil(assemble_node_stencil(scale, op.ke), mask)
        A = np.asarray(stencil_to_dense(C))
        P1 = _dense_prolongation((5, 3, 3))
        P2 = _dense_prolongation((3, 2, 2))
        Cc = coarsen_stencil(coarsen_stencil(C))
        Ac = np.asarray(stencil_to_dense(Cc))
        ref = P2.T @ (P1.T @ A @ P1) @ P2
        np.testing.assert_allclose(Ac, ref, rtol=1e-11, atol=1e-11)
