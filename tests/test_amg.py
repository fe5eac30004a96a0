"""Two-level aggregation AMG: transfer operators, Galerkin coarse matrix,
and iteration-count wins over block Jacobi at SIMP contrast."""

import numpy as np
import jax.numpy as jnp

import easysimp_tpu as et
from easysimp_tpu.ops.amg import (
    TwoLevelAMG,
    greedy_aggregate,
    rigid_body_prolongator,
)
from easysimp_tpu.ops.cg import cg_solve
from easysimp_tpu.ops.elements import element_stiffness_batch_np
from easysimp_tpu.ops.operator import UnstructuredOperator
from test_unstructured import tet_mesh_from_voxels


def _problem(nels=(6, 3, 3), seed=0, contrast=1e9):
    mesh = tet_mesh_from_voxels(nels)
    bc = et.apply_fixed_boundary(
        mesh, et.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-6))
    ke, vols = element_stiffness_batch_np(
        mesh.node_coords[mesh.connectivity], E=1.0, nu=0.3)
    op = UnstructuredOperator(ke, mesh.connectivity, mesh.n_nodes,
                              E0=1.0, Emin=1.0 / contrast, nu=0.3, p=3.0,
                              dtype=jnp.float64)
    mask = jnp.asarray(et.build_free_mask(mesh, [bc]), dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    # binary-ish density field: the SIMP-contrast regime that kills Jacobi
    rho = jnp.asarray(np.where(rng.uniform(size=mesh.n_cells) < 0.5,
                               1.0, 1e-3))
    scale = op.youngs_modulus(rho)
    f = jnp.asarray(rng.standard_normal(mesh.n_dofs)) * mask
    return mesh, op, mask, scale, f


def test_aggregation_covers_all_nodes():
    mesh = tet_mesh_from_voxels((4, 2, 2))
    agg, n_agg = greedy_aggregate(mesh.connectivity, mesh.n_nodes)
    assert agg.shape == (mesh.n_nodes,)
    assert agg.min() >= 0 and agg.max() == n_agg - 1
    assert n_agg < mesh.n_nodes / 2  # actually coarsens


def test_prolongator_orthonormal_and_masked():
    mesh = tet_mesh_from_voxels((4, 2, 2))
    agg, n_agg = greedy_aggregate(mesh.connectivity, mesh.n_nodes)
    mask = np.ones((mesh.n_nodes, 3))
    mask[:4, :] = 0.0
    P = rigid_body_prolongator(mesh.node_coords, agg, n_agg, mask)
    # masked rows exactly zero
    np.testing.assert_array_equal(P[:4], 0.0)
    # per-aggregate columns orthonormal (up to trimmed rank)
    flat = np.zeros((3 * mesh.n_nodes, 6 * n_agg))
    for v in range(mesh.n_nodes):
        flat[3 * v : 3 * v + 3, 6 * agg[v] : 6 * agg[v] + 6] = P[v]
    G = flat.T @ flat
    for a in range(n_agg):
        blk = G[6 * a : 6 * a + 6, 6 * a : 6 * a + 6]
        d = np.diag(blk)
        keep = d > 0.5
        np.testing.assert_allclose(blk[np.ix_(keep, keep)],
                                   np.eye(keep.sum()), atol=1e-10)


def test_coarse_matrix_is_galerkin():
    """A_c from the per-element scatter equals the dense P^T (M K M) P."""
    mesh, op, mask, scale, _ = _problem((3, 2, 2))
    amg = TwoLevelAMG(op, mesh, np.asarray(mask))
    Ac = np.asarray(amg.coarse_matrix(scale))

    # dense masked K
    n = mesh.n_dofs
    K = np.zeros((n, n))
    dof = np.asarray(op.dofmap)
    kes = np.asarray(op.ke) * np.asarray(scale)[:, None, None]
    for e in range(mesh.n_cells):
        K[np.ix_(dof[e], dof[e])] += kes[e]
    m = np.asarray(mask)
    Km = K * m[:, None] * m[None, :]
    Pn, agg = np.asarray(amg.Pn), np.asarray(amg.agg_idx)
    flat = np.zeros((n, amg.nc))
    for v in range(mesh.n_nodes):
        flat[3 * v : 3 * v + 3, 6 * agg[v] : 6 * agg[v] + 6] = Pn[v]
    want = flat.T @ Km @ flat
    # the scatter regularizes zero diagonal entries to 1
    fix = np.diag(want) <= 1e-30
    want[fix, fix] = 1.0
    np.testing.assert_allclose(Ac, want, rtol=1e-9, atol=1e-9)


def test_vcycle_is_spd_and_beats_block_jacobi():
    """CG with the AMG cycle converges in far fewer iterations than block
    Jacobi on a SIMP-contrast operator (the VERDICT item-6 criterion:
    multilevel behavior on imported meshes)."""
    mesh, op, mask, scale, f = _problem((6, 3, 3))
    A = lambda v: op.apply(v, scale, mask)
    Binv = op.block_diagonal_inverse(scale, mask)

    sol_bj = cg_solve(A, f, x0=jnp.zeros_like(f),
                      M=lambda r: op.apply_block_jacobi(Binv, r),
                      rtol=1e-10, maxiter=2000)

    amg = TwoLevelAMG(op, mesh, np.asarray(mask))
    L, omega = amg.setup(scale, mask, Binv, A)
    sol_amg = cg_solve(A, f, x0=jnp.zeros_like(f),
                       M=lambda r: amg.apply(r, A, Binv, L, omega, mask),
                       rtol=1e-10, maxiter=2000)

    # both converge to the same solution
    np.testing.assert_allclose(np.asarray(sol_amg.u), np.asarray(sol_bj.u),
                               rtol=1e-6, atol=1e-8)
    assert int(sol_amg.iterations) < int(sol_bj.iterations) / 2, (
        int(sol_amg.iterations), int(sol_bj.iterations))
