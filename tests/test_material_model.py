"""Variable-material (two-field Lamé) path.

The reference's `assemble_variable_material!` branch (use_cache=false,
FiniteElementAnalysis.jl:719-743) recomputes each element ke from an
arbitrary rho -> (lam, mu) material model.  Here ke is linear in (lam, mu),
so the operator contracts two constant basis kes against two Lamé fields —
verified against per-element dense assembly with per-element (E, nu), and
against the SIMP fast path when the model IS the SIMP law.
"""

import numpy as np
import jax
import jax.numpy as jnp

import easysimp_tpu as et
from easysimp_tpu.ops.elements import (
    element_stiffness_batch_np,
    elasticity_matrix,
    hex8_stiffness_lame_basis,
    lame_parameters,
    simp_youngs_modulus,
)


def _problem(nels=(6, 4, 3), seed=0):
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                            tuple(0.8 * n for n in nels))
    rng = np.random.default_rng(seed)
    rho = jnp.asarray(rng.uniform(0.05, 1.0, nels))
    u = jnp.asarray(rng.standard_normal((*grid.nnodes_per_axis, 3)))
    return grid, rho, u


def _dense_K(grid, lam_e, mu_e):
    """Independent dense K: per-element ke from per-element (lam, mu) via
    the Voigt elasticity matrix, scattered with hex connectivity."""
    import scipy.sparse as sp

    conn = grid.hex_connectivity
    coords = grid.node_coords[conn]
    n = grid.n_dofs
    K = np.zeros((n, n))
    for e in range(conn.shape[0]):
        # E, nu back from (lam, mu):  mu = E/(2(1+nu)), lam = E nu/((1+nu)(1-2nu))
        lam, mu = float(lam_e[e]), float(mu_e[e])
        nu = lam / (2.0 * (lam + mu))
        E = 2.0 * mu * (1.0 + nu)
        ke, _ = element_stiffness_batch_np(coords[e:e + 1], E=E, nu=nu)
        dofs = (3 * conn[e][:, None] + np.arange(3)).reshape(-1)
        K[np.ix_(dofs, dofs)] += ke[0]
    return K


class TestLameOperator:
    def test_simp_model_matches_fast_path(self):
        """lam/mu from the SIMP law == unit-ke scaling to fp64 roundoff."""
        grid, rho, u = _problem()
        op = et.VoxelOperator(grid, E0=70.0, Emin=1e-6, nu=0.3, p=3.0,
                              dtype=jnp.float64)
        E = op.youngs_modulus(rho)
        lam_f, mu_f = lame_parameters(E, 0.3)
        got = np.asarray(op.apply_K_lame(u, lam_f, mu_f))
        want = np.asarray(op.apply_K(u, E))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_varying_nu_matches_dense_assembly(self):
        """A density-dependent Poisson ratio — inexpressible by unit-ke
        scaling — matches per-element dense assembly."""
        grid, rho, u = _problem(nels=(3, 2, 2), seed=1)
        op = et.VoxelOperator(grid, dtype=jnp.float64)

        def model(r):
            E = simp_youngs_modulus(r, 1.0, 1e-6, 3.0)
            nu = 0.2 + 0.15 * r            # nu varies with density
            return lame_parameters(E, nu)

        lam_f, mu_f = model(rho)
        got = grid.dofs_flat(np.asarray(op.apply_K_lame(u, lam_f, mu_f)))
        lam_e = grid.cells_flat(np.asarray(lam_f))
        mu_e = grid.cells_flat(np.asarray(mu_f))
        K = _dense_K(grid, lam_e, mu_e)
        want = K @ grid.dofs_flat(np.asarray(u))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)

    def test_lame_basis_reconstructs_ke(self):
        grid, _, _ = _problem()
        kl, km = hex8_stiffness_lame_basis(grid.spacing)
        from easysimp_tpu.ops.elements import hex8_stiffness

        lam, mu = lame_parameters(3.7, 0.28)
        np.testing.assert_allclose(
            lam * kl + mu * km, hex8_stiffness(grid.spacing, 3.7, 0.28),
            rtol=1e-12, atol=1e-14)

    def test_diagonal_lame(self):
        grid, rho, u = _problem(seed=2)
        op = et.VoxelOperator(grid, dtype=jnp.float64)
        mask = np.ones((*grid.nnodes_per_axis, 3))
        mask[0] = 0.0
        mask = jnp.asarray(mask)
        E = op.youngs_modulus(rho)
        lam_f, mu_f = lame_parameters(E, op.nu)
        np.testing.assert_allclose(
            np.asarray(op.diagonal_lame(lam_f, mu_f, mask)),
            np.asarray(op.diagonal(E, mask)), rtol=1e-12)


class TestMaterialModelDriver:
    def test_simp_closure_reproduces_default_trajectory(self):
        """simp_optimize(material_model=<SIMP closure>) == the fast path."""
        grid = et.generate_grid((8, 4, 2))
        bc = et.apply_fixed_boundary(
            grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
        load = et.PointLoad(
            et.select_nodes_by_box(grid, [8, 0, 0], [8, 0, 2]),
            [0.0, -1.0, 0.0])
        kw = dict(E0=100.0, Emin=1e-6, nu=0.3, p=3.0, volume_fraction=0.4,
                  max_iterations=4, tolerance=0.0, filter_radius=1.5,
                  dtype="float64", cg_rtol=1e-12)
        ref = et.simp_optimize(grid, [load], [bc],
                               et.OptimizationParameters(**kw))
        model = et.create_simp_material_model(100.0, 0.3, Emin=1e-6, p=3.0)
        got = et.simp_optimize(
            grid, [load], [bc],
            et.OptimizationParameters(material_model=model, **kw))
        np.testing.assert_allclose(got.energy_history, ref.energy_history,
                                   rtol=1e-9)
        np.testing.assert_allclose(got.densities, ref.densities, atol=1e-9)
        np.testing.assert_allclose(got.element_energies,
                                   ref.element_energies, rtol=1e-8,
                                   atol=1e-12)

    def test_ramp_sensitivities_match_finite_differences(self):
        """jvp-based material-derivative sensitivities vs FD for a RAMP
        interpolation with varying nu (the case the reference's hardcoded
        SIMP sensitivity formula gets WRONG on its variable branch)."""
        from easysimp_tpu.opt.optimize import build_voxel_step

        grid = et.generate_grid((5, 3, 2))
        bc = et.apply_fixed_boundary(
            grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
        load = et.PointLoad(
            et.select_nodes_by_box(grid, [5, 0, 0], [5, 0, 2]),
            [0.0, -1.0, 0.0])

        def model(r):
            E = 1e-6 + r / (1.0 + 4.0 * (1.0 - r))   # RAMP, q=4
            nu = 0.25 + 0.1 * r
            return lame_parameters(E, nu)

        params = et.OptimizationParameters(
            material_model=model, volume_fraction=0.4, filter_radius=1.5,
            dtype="float64", cg_rtol=1e-13, preconditioner="jacobi")
        vs = build_voxel_step(grid, [load], [bc], params)
        rng = np.random.default_rng(3)
        design = jnp.asarray(rng.uniform(0.3, 0.9, grid.nels))

        phys, u, energy, *_ = jax.jit(vs.step_solve)(
            design, vs.u0, vs.pvecs0, *vs.step_args[:2])
        # sensitivities of compliance wrt PHYSICAL density (no filter chain)
        lam_f, mu_f = model(phys)
        _, (dlam, dmu) = jax.jvp(model, (phys,), (jnp.ones_like(phys),))
        wl, wm = vs.op.element_energies_lame(u)
        sens = np.asarray(-(2.0 * 0.5) * (dlam * wl + dmu * wm))

        # central FD on a few elements: c(rho) = u(rho)^T K(rho) u(rho) / ...
        # compliance = 2 * energy = u^T f; perturb physical density directly
        def compliance(d):
            _, _, e, *_ = jax.jit(vs.step_solve)(
                d, vs.u0, vs.pvecs0, *vs.step_args[:2])
            return float(e)

        h = 1e-6
        for (i, j, k) in [(0, 0, 0), (2, 1, 1), (4, 2, 1)]:
            dp = design.at[i, j, k].add(h)
            dm = design.at[i, j, k].add(-h)
            fd = (compliance(dp) - compliance(dm)) / (2 * h)
            np.testing.assert_allclose(sens[i, j, k] / 2.0, fd, rtol=2e-4)

class TestUnstructuredMaterialModel:
    """The variable-material branch on imported meshes — the reference's
    `assemble_variable_material!` works for any Ferrite grid
    (FiniteElementAnalysis.jl:719-743), so the unstructured path must accept
    material_model too (round-3 VERDICT item 4)."""

    def _tet_problem(self, nels=(3, 2, 2)):
        from test_unstructured import tet_mesh_from_voxels

        mesh = tet_mesh_from_voxels(nels)
        bc = et.apply_fixed_boundary(
            mesh, et.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-6))
        load = et.PointLoad(
            et.select_nodes_by_plane(mesh, [nels[0], 0, 0], [1, 0, 0], 1e-6),
            [0.0, -1.0, 0.0])
        return mesh, bc, load

    def test_lame_basis_reconstructs_batched_ke(self):
        from easysimp_tpu.ops.elements import (
            element_stiffness_lame_basis_batch_np)

        mesh, _, _ = self._tet_problem()
        coords = mesh.node_coords[mesh.connectivity]
        kl, km = element_stiffness_lame_basis_batch_np(coords)
        lam, mu = lame_parameters(3.7, 0.28)
        want, _ = element_stiffness_batch_np(coords, E=3.7, nu=0.28)
        np.testing.assert_allclose(lam * kl + mu * km, want,
                                   rtol=1e-12, atol=1e-13)

    def test_varying_nu_matches_dense_assembly(self):
        """Density-dependent Poisson ratio on a tet mesh vs per-element
        dense assembly (the case unit-ke scaling cannot express)."""
        from easysimp_tpu.ops.elements import (
            element_stiffness_lame_basis_batch_np)
        from easysimp_tpu.ops.operator import UnstructuredOperator

        mesh, _, _ = self._tet_problem()
        coords = mesh.node_coords[mesh.connectivity]
        ke_unit, _ = element_stiffness_batch_np(coords)
        op = UnstructuredOperator(ke_unit, mesh.connectivity, mesh.n_nodes,
                                  E0=1.0, Emin=1e-9, nu=0.3, p=3.0,
                                  dtype=jnp.float64)
        op.set_lame_basis(*element_stiffness_lame_basis_batch_np(coords))

        rng = np.random.default_rng(7)
        rho = rng.uniform(0.05, 1.0, mesh.n_cells)
        u = rng.standard_normal(3 * mesh.n_nodes)

        def model(r):
            E = simp_youngs_modulus(r, 1.0, 1e-6, 3.0)
            nu = 0.2 + 0.15 * r
            return lame_parameters(E, nu)

        lam_e, mu_e = model(rho)
        got = np.asarray(op.apply_K_lame(jnp.asarray(u), jnp.asarray(lam_e),
                                         jnp.asarray(mu_e)))

        K = np.zeros((3 * mesh.n_nodes, 3 * mesh.n_nodes))
        dofmap = np.asarray(op.dofmap)
        for e in range(mesh.n_cells):
            nu = lam_e[e] / (2.0 * (lam_e[e] + mu_e[e]))
            E = 2.0 * mu_e[e] * (1.0 + nu)
            ke, _ = element_stiffness_batch_np(coords[e:e + 1], E=E, nu=nu)
            K[np.ix_(dofmap[e], dofmap[e])] += ke[0]
        np.testing.assert_allclose(got, K @ u, rtol=1e-10, atol=1e-10)

    def test_simp_closure_reproduces_default_trajectory(self):
        """simp_optimize(material_model=<SIMP closure>) == the fast path on
        a tet mesh, incl. stresses and element energies."""
        mesh, bc, load = self._tet_problem()
        kw = dict(E0=100.0, Emin=1e-6, nu=0.3, p=3.0, volume_fraction=0.4,
                  max_iterations=3, tolerance=0.0, filter_radius=1.5,
                  dtype="float64", cg_rtol=1e-12)
        ref = et.simp_optimize(mesh, [load], [bc],
                               et.OptimizationParameters(**kw))
        model = et.create_simp_material_model(100.0, 0.3, Emin=1e-6, p=3.0)
        got = et.simp_optimize(
            mesh, [load], [bc],
            et.OptimizationParameters(material_model=model, **kw))
        np.testing.assert_allclose(got.energy_history, ref.energy_history,
                                   rtol=1e-9)
        np.testing.assert_allclose(got.densities, ref.densities, atol=1e-9)
        np.testing.assert_allclose(got.element_energies,
                                   ref.element_energies, rtol=1e-8,
                                   atol=1e-12)
        np.testing.assert_allclose(got.stresses.qp_stresses,
                                   ref.stresses.qp_stresses,
                                   rtol=1e-8, atol=1e-12)

    def test_sensitivities_match_finite_differences(self):
        """jvp-based material-derivative sensitivities vs FD for a RAMP
        interpolation with varying nu on a tet mesh."""
        from easysimp_tpu.opt.optimize_unstructured import (
            build_unstructured_step)

        mesh, bc, load = self._tet_problem()

        def model(r):
            E = 1e-6 + r / (1.0 + 4.0 * (1.0 - r))   # RAMP, q=4
            nu = 0.25 + 0.1 * r
            return lame_parameters(E, nu)

        params = et.OptimizationParameters(
            material_model=model, volume_fraction=0.4, filter_radius=1.5,
            dtype="float64", cg_rtol=1e-13, preconditioner="jacobi")
        us = build_unstructured_step(mesh, [load], [bc], params)
        rng = np.random.default_rng(3)
        design = jnp.asarray(rng.uniform(0.3, 0.9, mesh.n_cells))

        # filter_type defaults to "sensitivity", so phys == design here
        solve = jax.jit(us.solve)
        _, u, energy = solve(design)
        _, (dlam, dmu) = jax.jvp(model, (design,), (jnp.ones_like(design),))
        wl, wm = us.op.element_energies_lame(u)
        sens = np.asarray(-(dlam * wl + dmu * wm))

        def compliance(d):
            _, _, e = solve(d)
            return 2.0 * float(e)

        h = 1e-6
        for e in [0, mesh.n_cells // 2, mesh.n_cells - 1]:
            dp = design.at[e].add(h)
            dm = design.at[e].add(-h)
            fd = (compliance(dp) - compliance(dm)) / (2 * h)
            np.testing.assert_allclose(sens[e], fd, rtol=2e-4)
