"""Multilevel aggregation AMG: transfer operators, Galerkin levels,
and iteration-count wins over block Jacobi at SIMP contrast."""

import numpy as np
import jax.numpy as jnp

import easysimp_tpu as et
from easysimp_tpu.ops.amg import (
    MultilevelAMG,
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


def _dense_masked_K(mesh, op, mask, scale):
    n = mesh.n_dofs
    K = np.zeros((n, n))
    dof = np.asarray(op.dofmap)
    kes = np.asarray(op.ke) * np.asarray(scale)[:, None, None]
    for e in range(mesh.n_cells):
        K[np.ix_(dof[e], dof[e])] += kes[e]
    m = np.asarray(mask)
    return K * m[:, None] * m[None, :]


def _level1_dense(amg, blocks):
    n1 = amg.sizes[0]
    A1 = np.zeros((n1, 6, n1, 6))
    r = np.asarray(amg.pair_rows[0])
    c = np.asarray(amg.pair_cols[0])
    b = np.asarray(blocks)
    for p in range(r.size):
        A1[r[p], :, c[p], :] += b[p]
    return A1.reshape(6 * n1, 6 * n1)


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


def test_coarse_basis_factorization():
    """B0|agg == Q @ B1[agg]: the carried near-nullspace is exactly the
    coarse representation of the fine RBMs."""
    mesh = tet_mesh_from_voxels((4, 2, 2))
    agg, n_agg = greedy_aggregate(mesh.connectivity, mesh.n_nodes)
    mask = np.ones((mesh.n_nodes, 3))
    P, B1 = rigid_body_prolongator(mesh.node_coords, agg, n_agg, mask,
                                   return_coarse=True)
    coords = mesh.node_coords
    for a in range(min(n_agg, 5)):
        nodes = np.nonzero(agg == a)[0]
        x = coords[nodes] - coords[nodes].mean(axis=0)
        m = nodes.size
        B0 = np.zeros((m, 3, 6))
        B0[:, :, :3] = np.eye(3)
        B0[:, 0, 4], B0[:, 0, 5] = x[:, 2], -x[:, 1]
        B0[:, 1, 3], B0[:, 1, 5] = -x[:, 2], x[:, 0]
        B0[:, 2, 3], B0[:, 2, 4] = x[:, 1], -x[:, 0]
        got = np.einsum("nki,ij->nkj", P[nodes], B1[a])
        np.testing.assert_allclose(got, B0, atol=1e-9)


def test_level1_blocks_are_galerkin():
    """The chunked device assembly of A_1 equals the dense P^T (M K M) P."""
    mesh, op, mask, scale, _ = _problem((3, 2, 2))
    amg = MultilevelAMG(op, mesh, np.asarray(mask))
    A1 = _level1_dense(amg, amg._assemble_level1(scale))

    Km = _dense_masked_K(mesh, op, mask, scale)
    Pn, agg = np.asarray(amg.Pn), np.asarray(amg.agg_idx)
    n1 = amg.sizes[0]
    flat = np.zeros((mesh.n_dofs, 6 * n1))
    for v in range(mesh.n_nodes):
        flat[3 * v : 3 * v + 3, 6 * agg[v] : 6 * agg[v] + 6] = Pn[v]
    want = flat.T @ Km @ flat
    np.testing.assert_allclose(A1, want, rtol=1e-9, atol=1e-9)


def test_chunked_assembly_matches_unchunked():
    """Forcing many element chunks reproduces the one-shot assembly."""
    mesh, op, mask, scale, _ = _problem((4, 2, 2))
    amg = MultilevelAMG(op, mesh, np.asarray(mask))
    one = np.asarray(amg._assemble_level1(scale))
    E = mesh.n_cells
    amg.chunk_slices = [(s, min(s + 7, E)) for s in range(0, E, 7)]
    many = np.asarray(amg._assemble_level1(scale))
    np.testing.assert_allclose(many, one, rtol=1e-12, atol=1e-12)


def test_deeper_galerkin_is_consistent():
    """A_2 (block-sparse, via pair maps) == P_1^T A_1_dense P_1."""
    mesh, op, mask, scale, _ = _problem((6, 3, 3))
    amg = MultilevelAMG(op, mesh, np.asarray(mask), max_coarse_dofs=60)
    assert amg.n_coarse_levels >= 2
    b1 = amg._assemble_level1(scale)
    b2 = amg._galerkin_next(0, b1)

    A1 = _level1_dense(amg, b1)
    P1b = np.asarray(amg.P_coarse[0])            # (n1, 6, 6)
    agg1 = np.asarray(amg.agg_coarse[0])
    n2 = amg.sizes[1]
    P1 = np.zeros((6 * amg.sizes[0], 6 * n2))
    for v in range(amg.sizes[0]):
        P1[6 * v : 6 * v + 6, 6 * agg1[v] : 6 * agg1[v] + 6] = P1b[v]
    want = P1.T @ A1 @ P1

    n2d = np.zeros((n2, 6, n2, 6))
    r = np.asarray(amg.pair_rows[1])
    c = np.asarray(amg.pair_cols[1])
    for p in range(r.size):
        n2d[r[p], :, c[p], :] += np.asarray(b2)[p]
    np.testing.assert_allclose(n2d.reshape(6 * n2, 6 * n2), want,
                               rtol=1e-9, atol=1e-9)


def test_vcycle_is_spd_and_beats_block_jacobi():
    """CG with the AMG cycle converges in far fewer iterations than block
    Jacobi on a SIMP-contrast operator."""
    mesh, op, mask, scale, f = _problem((6, 3, 3))
    A = lambda v: op.apply(v, scale, mask)
    Binv = op.block_diagonal_inverse(scale, mask)

    sol_bj = cg_solve(A, f, x0=jnp.zeros_like(f),
                      M=lambda r: op.apply_block_jacobi(Binv, r),
                      rtol=1e-10, maxiter=2000)

    amg = MultilevelAMG(op, mesh, np.asarray(mask))
    state = amg.setup(scale, mask, Binv, A)
    sol_amg = cg_solve(A, f, x0=jnp.zeros_like(f),
                       M=lambda r: amg.apply(r, A, Binv, state, mask),
                       rtol=1e-10, maxiter=2000)

    # both converge to the same solution
    np.testing.assert_allclose(np.asarray(sol_amg.u), np.asarray(sol_bj.u),
                               rtol=1e-6, atol=1e-8)
    assert int(sol_amg.iterations) < int(sol_bj.iterations) / 2, (
        int(sol_amg.iterations), int(sol_bj.iterations))


def test_multilevel_matches_twolevel_solution():
    """Forcing a >= 3-level hierarchy converges to the same solution with
    a similar iteration count (the deep cycle is a valid SPD
    preconditioner, not just the 2-level special case)."""
    mesh, op, mask, scale, f = _problem((8, 4, 4))
    A = lambda v: op.apply(v, scale, mask)
    Binv = op.block_diagonal_inverse(scale, mask)

    two = MultilevelAMG(op, mesh, np.asarray(mask))   # default: 2 levels
    assert two.n_coarse_levels == 1
    st2 = two.setup(scale, mask, Binv, A)
    sol2 = cg_solve(A, f, x0=jnp.zeros_like(f),
                    M=lambda r: two.apply(r, A, Binv, st2, mask),
                    rtol=1e-10, maxiter=2000)

    deep = MultilevelAMG(op, mesh, np.asarray(mask), max_coarse_dofs=60)
    assert deep.n_coarse_levels >= 2
    std = deep.setup(scale, mask, Binv, A)
    sold = cg_solve(A, f, x0=jnp.zeros_like(f),
                    M=lambda r: deep.apply(r, A, Binv, std, mask),
                    rtol=1e-10, maxiter=2000)

    np.testing.assert_allclose(np.asarray(sold.u), np.asarray(sol2.u),
                               rtol=1e-6, atol=1e-8)
    assert int(sold.iterations) < 3 * int(sol2.iterations), (
        int(sold.iterations), int(sol2.iterations))


def test_unstructured_driver_runs_with_deep_hierarchy():
    """amg_max_coarse_dofs plumbs through the driver; the trajectory with a
    forced >= 3-level hierarchy matches the default to solver roundoff."""
    mesh = tet_mesh_from_voxels((6, 3, 2))
    bc = et.apply_fixed_boundary(
        mesh, et.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-6))
    load = et.PointLoad(
        et.select_nodes_by_plane(mesh, [6, 0, 0], [1, 0, 0], 1e-6),
        [0.0, -1.0, 0.0])

    def run(**kw):
        p = et.OptimizationParameters(
            E0=100.0, Emin=1e-6, volume_fraction=0.4, max_iterations=6,
            tolerance=0.0, filter_radius=1.5, dtype="float64",
            cg_rtol=1e-10, **kw)
        return et.simp_optimize(mesh, [load], [bc], p)

    res_default = run()
    res_deep = run(amg_max_coarse_dofs=60)
    np.testing.assert_allclose(res_deep.energy_history,
                               res_default.energy_history, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(res_deep.densities),
                               np.asarray(res_default.densities),
                               rtol=1e-6, atol=1e-8)


def _dense_from_pairs(rows, cols, blocks, n, k=6):
    """Dense matrix from a block-sparse (rows, cols, (p, k, k)) level."""
    A = np.zeros((n, k, n, k))
    r, c, b = np.asarray(rows), np.asarray(cols), np.asarray(blocks)
    for p in range(r.size):
        A[r[p], :, c[p], :] += b[p]
    return A.reshape(k * n, k * n)


def _dense_Ps(na, Ps, n_fine, n_agg, k):
    """Dense (k * n_fine, 6 * n_agg) prolongator from its na pattern."""
    na_r, na_c = np.asarray(na[0]), np.asarray(na[1])
    P = np.zeros((n_fine, k, n_agg, 6))
    for p in range(na_r.size):
        P[na_r[p], :, na_c[p], :] += np.asarray(Ps)[p]
    return P.reshape(k * n_fine, 6 * n_agg)


def test_smoothed_level1_blocks_are_galerkin():
    """With smooth_prolongator, A_1 == P_s^T (M K M) P_s for the dense
    P_s = (I - 4/3 Binv_l1 K) P_t rebuilt independently."""
    mesh, op, mask, scale, _ = _problem((3, 2, 2))
    amg = MultilevelAMG(op, mesh, np.asarray(mask), smooth_prolongator=True)
    A = lambda v: op.apply(v, scale, mask)
    Binv = op.block_diagonal_inverse(scale, mask)
    state = amg.setup(scale, mask, Binv, A)

    Km = _dense_masked_K(mesh, op, mask, scale)
    n, n1 = mesh.n_nodes, amg.sizes[0]
    # dense tentative P_t and l1 block inverse
    Pn, agg = np.asarray(amg.Pn), np.asarray(amg.agg_idx)
    Pt = np.zeros((3 * n, 6 * n1))
    for v in range(n):
        Pt[3 * v : 3 * v + 3, 6 * agg[v] : 6 * agg[v] + 6] = Pn[v]
    B0 = np.asarray(amg._fine_l1_binv(scale, mask))
    Bd = np.zeros((3 * n, 3 * n))
    for v in range(n):
        Bd[3 * v : 3 * v + 3, 3 * v : 3 * v + 3] = B0[v]
    Anode = amg._assemble_node_blocks(scale, mask)
    Binv0j = amg._fine_l1_binv(scale, mask)
    lam0 = float(amg._sa_lambda(
        lambda v: amg._node_matvec(Anode, v),
        lambda v: jnp.einsum("nab,nb->na", Binv0j, v), n, 3, jnp.float64))
    Ps_dense = Pt - ((4.0 / 3.0) / lam0) * Bd @ Km @ Pt

    got_Ps = _dense_Ps(amg._sa_na[0], state["Ps"][0], n, n1, 3)
    np.testing.assert_allclose(got_Ps, Ps_dense, rtol=1e-9, atol=1e-9)

    # 2-level hierarchy: the single coarse level goes dense into L, so
    # recompute its blocks through the same device pieces setup uses
    A1 = _dense_from_pairs(amg.pair_rows[0], amg.pair_cols[0],
                           amg._sa_galerkin(0, Anode, state["Ps"][0]), n1)
    np.testing.assert_allclose(A1, Ps_dense.T @ Km @ Ps_dense,
                               rtol=1e-9, atol=1e-9)


def test_smoothed_deeper_galerkin_is_consistent():
    """A_2 == P_s1^T A_1 P_s1 with both sides densified from the
    block-sparse state (the recursive SA structure is self-consistent)."""
    mesh, op, mask, scale, _ = _problem((6, 3, 3))
    amg = MultilevelAMG(op, mesh, np.asarray(mask), max_coarse_dofs=60,
                        smooth_prolongator=True)
    assert amg.n_coarse_levels >= 2
    A = lambda v: op.apply(v, scale, mask)
    Binv = op.block_diagonal_inverse(scale, mask)
    state = amg.setup(scale, mask, Binv, A)

    n1, n2 = amg.sizes[0], amg.sizes[1]
    A1 = _dense_from_pairs(amg.pair_rows[0], amg.pair_cols[0],
                           state["blocks"][0], n1)
    # dense tentative P_1 and the level-1 l1 block inverse
    P1b, agg1 = np.asarray(amg.P_coarse[0]), np.asarray(amg.agg_coarse[0])
    Pt = np.zeros((6 * n1, 6 * n2))
    for v in range(n1):
        Pt[6 * v : 6 * v + 6, 6 * agg1[v] : 6 * agg1[v] + 6] = P1b[v]
    B1j = amg._level_l1_binv(0, state["blocks"][0])
    B1 = np.asarray(B1j)
    Bd = np.zeros((6 * n1, 6 * n1))
    for v in range(n1):
        Bd[6 * v : 6 * v + 6, 6 * v : 6 * v + 6] = B1[v]
    lam1 = float(amg._sa_lambda(
        lambda v: amg._matvec_level(0, state["blocks"][0], v),
        lambda v: jnp.einsum("nab,nb->na", B1j, v), n1, 6, jnp.float64))
    Ps_dense = Pt - ((4.0 / 3.0) / lam1) * Bd @ A1 @ Pt
    got_Ps = _dense_Ps(amg._sa_na[1], state["Ps"][1], n1, n2, 6)
    np.testing.assert_allclose(got_Ps, Ps_dense, rtol=1e-9, atol=1e-9)

    A2 = _dense_from_pairs(amg.pair_rows[1], amg.pair_cols[1],
                           amg._sa_galerkin(1, state["blocks"][0],
                                            state["Ps"][1]), n2)
    np.testing.assert_allclose(A2, Ps_dense.T @ A1 @ Ps_dense,
                               rtol=1e-9, atol=1e-9)


def test_smoothed_converges_to_same_solution():
    """The smoothed cycle is a valid SPD preconditioner: same solution,
    no more CG iterations than the tentative transfers."""
    mesh, op, mask, scale, f = _problem((6, 3, 3))
    A = lambda v: op.apply(v, scale, mask)
    Binv = op.block_diagonal_inverse(scale, mask)

    its = {}
    sols = {}
    for sp in (False, True):
        amg = MultilevelAMG(op, mesh, np.asarray(mask), max_coarse_dofs=60,
                            smooth_prolongator=sp)
        st = amg.setup(scale, mask, Binv, A)
        sol = cg_solve(A, f, x0=jnp.zeros_like(f),
                       M=lambda r: amg.apply(r, A, Binv, st, mask),
                       rtol=1e-10, maxiter=2000)
        its[sp], sols[sp] = int(sol.iterations), np.asarray(sol.u)
    np.testing.assert_allclose(sols[True], sols[False], rtol=1e-6, atol=1e-8)
    assert its[True] <= its[False], its


def test_unstructured_driver_smoothed_prolongator():
    """amg_smooth_prolongator plumbs through the driver; the trajectory
    matches the tentative-transfer default to solver roundoff."""
    mesh = tet_mesh_from_voxels((6, 3, 2))
    bc = et.apply_fixed_boundary(
        mesh, et.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-6))
    load = et.PointLoad(
        et.select_nodes_by_plane(mesh, [6, 0, 0], [1, 0, 0], 1e-6),
        [0.0, -1.0, 0.0])

    def run(**kw):
        p = et.OptimizationParameters(
            E0=100.0, Emin=1e-6, volume_fraction=0.4, max_iterations=6,
            tolerance=0.0, filter_radius=1.5, dtype="float64",
            cg_rtol=1e-10, **kw)
        return et.simp_optimize(mesh, [load], [bc], p)

    res_default = run()
    res_sa = run(amg_smooth_prolongator=True)
    np.testing.assert_allclose(res_sa.energy_history,
                               res_default.energy_history, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(res_sa.densities),
                               np.asarray(res_default.densities),
                               rtol=1e-6, atol=1e-8)
