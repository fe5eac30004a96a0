"""Matrix-free operator verification against explicit sparse assembly."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from easysimp_tpu import (
    DirichletBC,
    VoxelOperator,
    apply_fixed_boundary,
    build_free_mask,
    generate_grid,
    select_nodes_by_plane,
)
from easysimp_tpu.ops.operator import (
    UnstructuredOperator,
    gather_element_dofs,
    scatter_element_dofs,
)
from reference_impl import ReferenceProblem


def make_problem(nels=(3, 2, 2), spacing=None, seed=0):
    corner1 = None
    if spacing is not None:
        corner1 = tuple(n * s for n, s in zip(nels, spacing))
    grid = generate_grid(nels, (0.0, 0.0, 0.0), corner1)
    rng = np.random.default_rng(seed)
    rho_flat = rng.uniform(0.05, 1.0, grid.n_cells)
    prob = ReferenceProblem(
        grid.node_coords, grid.hex_connectivity, E0=7.0, Emin=1e-6, nu=0.3, p=3.0
    )
    op = VoxelOperator(grid, E0=7.0, Emin=1e-6, nu=0.3, p=3.0, dtype=jnp.float64)
    return grid, prob, op, rho_flat, rng


class TestGatherScatter:
    def test_adjoint(self):
        """scatter is the exact transpose of gather."""
        grid = generate_grid((3, 2, 2))
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.standard_normal((*grid.nnodes_per_axis, 3)))
        fe = jnp.asarray(rng.standard_normal((*grid.nels, 24)))
        lhs = float(jnp.vdot(gather_element_dofs(u), fe))
        rhs = float(jnp.vdot(u, scatter_element_dofs(fe)))
        assert np.isclose(lhs, rhs, rtol=1e-13)

    def test_gather_matches_connectivity(self):
        grid = generate_grid((3, 2, 2))
        rng = np.random.default_rng(4)
        u = rng.standard_normal((*grid.nnodes_per_axis, 3))
        ue = np.asarray(gather_element_dofs(jnp.asarray(u)))
        ue_flat = grid.cells_flat(ue[..., 0])  # first dof (corner 0, comp x)
        u_nodes = grid.nodes_flat(u)
        np.testing.assert_allclose(
            ue_flat, u_nodes[grid.hex_connectivity[:, 0], 0], rtol=0, atol=0
        )
        # every corner/component
        ue_all = ue.transpose(2, 1, 0, 3).reshape(grid.n_cells, 8, 3)
        np.testing.assert_array_equal(
            ue_all, u_nodes[grid.hex_connectivity]
        )


class TestVoxelOperator:
    def test_matvec_matches_sparse(self):
        grid, prob, op, rho_flat, rng = make_problem((3, 2, 2), (0.7, 1.2, 0.9))
        K = prob.assemble(rho_flat)
        u = rng.standard_normal((*grid.nnodes_per_axis, 3))
        scale = op.youngs_modulus(jnp.asarray(grid.cells_3d(rho_flat)))
        out = np.asarray(op.apply_K(jnp.asarray(u), scale))
        expected = (K @ grid.dofs_flat(u)).reshape(-1, 3)
        np.testing.assert_allclose(
            grid.nodes_flat(out), expected, rtol=1e-12, atol=1e-12
        )

    def test_masked_matvec_matches_eliminated_sparse(self):
        grid, prob, op, rho_flat, rng = make_problem((4, 3, 2))
        fixed_nodes = select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6)
        bc = apply_fixed_boundary(grid, fixed_nodes)
        mask = jnp.asarray(build_free_mask(grid, [bc]))
        fixed_dofs = np.nonzero(grid.dofs_flat(np.asarray(mask)) == 0)[0]

        K = prob.assemble(rho_flat)
        Kbc, _ = prob.apply_bcs(K, np.zeros(grid.n_dofs), fixed_dofs)

        u = rng.standard_normal((*grid.nnodes_per_axis, 3))
        u_flat = grid.dofs_flat(u)
        scale = op.youngs_modulus(jnp.asarray(grid.cells_3d(rho_flat)))
        out = grid.dofs_flat(np.asarray(op.apply(jnp.asarray(u), scale, mask)))
        expected = np.asarray(Kbc @ u_flat)
        # masked operator returns 0 on constrained dofs (Kbc has identity there)
        expected[fixed_dofs] = 0.0
        np.testing.assert_allclose(out, expected, rtol=1e-12, atol=1e-12)

    def test_diagonal_matches_sparse(self):
        grid, prob, op, rho_flat, _ = make_problem((3, 3, 2), (0.5, 0.8, 1.1))
        bc = DirichletBC(nodes=[0, 5, 17], components=(0, 2))
        mask = jnp.asarray(build_free_mask(grid, [bc]))
        K = prob.assemble(rho_flat)
        scale = op.youngs_modulus(jnp.asarray(grid.cells_3d(rho_flat)))
        diag = grid.dofs_flat(np.asarray(op.diagonal(scale, mask)))
        expected = K.diagonal().copy()
        expected[grid.dofs_flat(np.asarray(mask)) == 0] = 1.0
        np.testing.assert_allclose(diag, expected, rtol=1e-12)

    def test_sensitivities_match_reference(self):
        grid, prob, op, rho_flat, rng = make_problem((3, 2, 2))
        u = rng.standard_normal((*grid.nnodes_per_axis, 3))
        scale3d = jnp.asarray(grid.cells_3d(rho_flat))
        s = grid.cells_flat(
            np.asarray(op.compliance_sensitivities(jnp.asarray(u), scale3d))
        )
        s_ref = prob.sensitivities(rho_flat, grid.dofs_flat(u))
        np.testing.assert_allclose(s, s_ref, rtol=1e-11)


class TestUnstructuredOperator:
    def test_matvec_matches_sparse_hex(self):
        grid, prob, _, rho_flat, rng = make_problem((3, 2, 2), (0.9, 1.1, 0.6))
        op = UnstructuredOperator(
            prob.ke_unit, grid.hex_connectivity, grid.n_nodes,
            E0=7.0, Emin=1e-6, nu=0.3, p=3.0, dtype=jnp.float64,
        )
        u = rng.standard_normal(grid.n_dofs)
        K = prob.assemble(rho_flat)
        scale = op.youngs_modulus(jnp.asarray(rho_flat))
        out = np.asarray(op.apply_K(jnp.asarray(u), scale))
        np.testing.assert_allclose(out, K @ u, rtol=1e-12, atol=1e-10)

    def test_voxel_equals_unstructured(self):
        """The two operator regimes agree on the same mesh."""
        grid, prob, vop, rho_flat, rng = make_problem((2, 3, 2))
        uop = UnstructuredOperator(
            prob.ke_unit, grid.hex_connectivity, grid.n_nodes,
            E0=7.0, Emin=1e-6, nu=0.3, p=3.0, dtype=jnp.float64,
        )
        u = rng.standard_normal((*grid.nnodes_per_axis, 3))
        scale3 = vop.youngs_modulus(jnp.asarray(grid.cells_3d(rho_flat)))
        scale1 = uop.youngs_modulus(jnp.asarray(rho_flat))
        a = grid.dofs_flat(np.asarray(vop.apply_K(jnp.asarray(u), scale3)))
        b = np.asarray(uop.apply_K(jnp.asarray(grid.dofs_flat(u)), scale1))
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-11)
