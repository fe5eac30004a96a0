"""Multigrid transfer-operator and preconditioner correctness."""

import numpy as np
import pytest
import jax.numpy as jnp

import easysimp_tpu as et
from easysimp_tpu.ops.cg import cg_solve
from easysimp_tpu.ops.multigrid import (
    MultigridPreconditioner,
    coarsen_cells,
    prolong,
    restrict,
)


class TestTransferOperators:
    def test_prolong_constant(self):
        """Trilinear prolongation reproduces constants exactly."""
        xc = jnp.ones((5, 4, 3, 3))
        xf = prolong(xc)
        assert xf.shape == (9, 7, 5, 3)
        np.testing.assert_allclose(np.asarray(xf), 1.0, atol=1e-15)

    def test_prolong_linear(self):
        """...and linear fields exactly (trilinear interpolation)."""
        nc = (4, 3, 2)
        coords = np.stack(
            np.meshgrid(*[np.arange(n + 1, dtype=float) for n in nc],
                        indexing="ij"), axis=-1)
        lin = (2.0 * coords[..., 0] - 0.5 * coords[..., 1]
               + 3.0 * coords[..., 2])[..., None] * np.ones(3)
        xf = np.asarray(prolong(jnp.asarray(lin)))
        coords_f = np.stack(
            np.meshgrid(*[np.arange(2 * n + 1, dtype=float) / 2 for n in nc],
                        indexing="ij"), axis=-1)
        lin_f = (2.0 * coords_f[..., 0] - 0.5 * coords_f[..., 1]
                 + 3.0 * coords_f[..., 2])[..., None] * np.ones(3)
        np.testing.assert_allclose(xf, lin_f, atol=1e-13)

    def test_restrict_is_adjoint_of_prolong(self):
        rng = np.random.default_rng(0)
        xc = jnp.asarray(rng.standard_normal((4, 3, 5, 3)))
        xf = jnp.asarray(rng.standard_normal((7, 5, 9, 3)))
        lhs = float(jnp.vdot(prolong(xc), xf))
        rhs = float(jnp.vdot(xc, restrict(xf)))
        assert np.isclose(lhs, rhs, rtol=1e-13)

    def test_coarsen_cells_mean(self):
        rng = np.random.default_rng(1)
        s = jnp.asarray(rng.uniform(size=(4, 6, 2)))
        c = np.asarray(coarsen_cells(s))
        assert c.shape == (2, 3, 1)
        np.testing.assert_allclose(
            c[0, 0, 0], np.asarray(s)[:2, :2, :2].mean(), rtol=1e-14
        )

    def test_coarsen_cells_rules(self):
        """Harmonic/mixed coarsening: reproduce constants exactly, stay
        positive, and order harmonic <= mixed <= arithmetic (AM-HM
        inequality) with strict gaps on heterogeneous blocks."""
        rng = np.random.default_rng(2)
        s = jnp.asarray(rng.uniform(0.01, 1.0, size=(4, 4, 4)))
        arith = np.asarray(coarsen_cells(s, "arithmetic"))
        harm = np.asarray(coarsen_cells(s, "harmonic"))
        mixed = np.asarray(coarsen_cells(s, "mixed"))
        blocks = np.asarray(s).reshape(2, 2, 2, 2, 2, 2)
        np.testing.assert_allclose(
            harm, 1.0 / (1.0 / blocks).mean(axis=(1, 3, 5)), rtol=1e-13)
        np.testing.assert_allclose(mixed, 0.5 * (arith + harm), rtol=1e-14)
        assert np.all(harm > 0) and np.all(harm < arith)
        assert np.all((harm < mixed) & (mixed < arith))
        const = jnp.full((2, 2, 2), 0.37)
        for rule in ("arithmetic", "harmonic", "mixed"):
            np.testing.assert_allclose(
                np.asarray(coarsen_cells(const, rule)), 0.37, rtol=1e-14)
        with pytest.raises(ValueError):
            coarsen_cells(const, "geometric")


class TestMGPreconditioner:
    def _problem(self, nels=(16, 8, 4), contrast=True):
        grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                                tuple(float(n) for n in nels))
        op = et.VoxelOperator(grid, E0=200.0, Emin=1e-6, nu=0.3, p=3.0,
                              dtype=jnp.float64)
        bc = et.apply_fixed_boundary(
            grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
        mask = jnp.asarray(et.build_free_mask(grid, [bc]))
        nx, ny, nz = nels
        load = et.PointLoad(
            et.select_nodes_by_box(grid, [nx, 0, 0], [nx, 0, nz]),
            [0.0, -1.0, 0.0])
        f = jnp.asarray(et.build_load_field(grid, [load])) * mask
        rng = np.random.default_rng(5)
        if contrast:
            rho = rng.choice([0.02, 1.0], size=grid.nels, p=[0.5, 0.5])
        else:
            rho = rng.uniform(0.3, 1.0, grid.nels)
        scale = op.youngs_modulus(jnp.asarray(rho))
        return grid, op, mask, f, scale

    def test_vcycle_is_linear_and_symmetric(self):
        grid, op, mask, f, scale = self._problem((8, 4, 4))
        mg = MultigridPreconditioner(op, smooth_iters=2)
        assert mg.n_levels >= 2
        M = mg.preconditioner_factory()(scale, mask)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal(f.shape)) * mask
        y = jnp.asarray(rng.standard_normal(f.shape)) * mask
        # linearity
        got = np.asarray(M(2.5 * x - 1.5 * y))
        want = np.asarray(2.5 * M(x) - 1.5 * M(y))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        # symmetry <Mx, y> == <x, My>
        assert np.isclose(float(jnp.vdot(M(x), y)), float(jnp.vdot(x, M(y))),
                          rtol=1e-10)

    def test_mg_cg_matches_jacobi_cg_and_is_faster(self):
        grid, op, mask, f, scale = self._problem((16, 8, 4), contrast=True)
        A = lambda v: op.apply(v, scale, mask)
        diag = op.diagonal(scale, mask)
        sol_j = cg_solve(A, f, M=lambda r: r / diag, rtol=1e-10, maxiter=50000)
        mg = MultigridPreconditioner(op, smooth_iters=2)
        M = mg.preconditioner_factory()(scale, mask)
        sol_m = cg_solve(A, f, M=M, rtol=1e-10, maxiter=5000)
        np.testing.assert_allclose(
            np.asarray(sol_m.u), np.asarray(sol_j.u), rtol=1e-6, atol=1e-9
        )
        assert int(sol_m.iterations) < int(sol_j.iterations) / 3, (
            int(sol_m.iterations), int(sol_j.iterations))

    def test_optimize_with_multigrid_matches_jacobi(self):
        """Full SIMP trajectory identical under either preconditioner."""
        nels = (8, 4, 4)
        grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                                tuple(float(n) for n in nels))
        bc = et.apply_fixed_boundary(
            grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
        load = et.PointLoad(
            et.select_nodes_by_box(grid, [8, 0, 0], [8, 0, 4]),
            [0.0, -1.0, 0.0])

        def run(precond):
            params = et.OptimizationParameters(
                E0=100.0, Emin=1e-6, volume_fraction=0.4, max_iterations=6,
                tolerance=0.01, filter_radius=1.5, dtype="float64",
                cg_rtol=1e-12, preconditioner=precond)
            return et.simp_optimize(grid, [load], [bc], params)

        res_j = run("jacobi")
        res_m = run("multigrid")
        np.testing.assert_allclose(res_m.energy_history, res_j.energy_history,
                                   rtol=1e-8)
        np.testing.assert_allclose(res_m.densities, res_j.densities, atol=1e-7)
        assert sum(res_m.cg_iterations_history) < sum(res_j.cg_iterations_history)


class TestSmootherVariants:
    def test_chebyshev_beats_jacobi_on_hard_contrast(self):
        import easysimp_tpu as et
        from easysimp_tpu.ops.cg import cg_solve

        grid = et.generate_grid((16, 8, 4), (0.0, 0.0, 0.0),
                                (16.0, 8.0, 4.0))
        op = et.VoxelOperator(grid, E0=1.0, Emin=1e-9, nu=0.3, p=3.0,
                              dtype=jnp.float64)
        bc = et.apply_fixed_boundary(
            grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
        mask = jnp.asarray(et.build_free_mask(grid, [bc]))
        load = et.PointLoad(
            et.select_nodes_by_box(grid, [16, 0, 0], [16, 0, 4]),
            [0.0, -1.0, 0.0])
        f = jnp.asarray(et.build_load_field(grid, [load])) * mask
        rng = np.random.default_rng(3)
        rho = jnp.asarray(rng.choice([0.001, 1.0], size=grid.nels))
        scale = op.youngs_modulus(rho)
        A = lambda v: op.apply(v, scale, mask)
        iters = {}
        for sm in ("jacobi", "chebyshev"):
            mg = MultigridPreconditioner(op, smooth_iters=2, smoother=sm)
            M = mg.preconditioner_factory()(scale, mask)
            sol = cg_solve(A, f, M=M, rtol=1e-9, maxiter=5000)
            iters[sm] = int(sol.iterations)
            np.testing.assert_allclose(float(sol.residual_norm), 0, atol=1e-7)
        assert iters["chebyshev"] < iters["jacobi"]

    def test_bf16_cycle_converges_like_fp32(self):
        import easysimp_tpu as et
        from easysimp_tpu.ops.cg import cg_solve

        grid = et.generate_grid((16, 8, 4), (0.0, 0.0, 0.0),
                                (16.0, 8.0, 4.0))
        op = et.VoxelOperator(grid, E0=1.0, Emin=1e-9, nu=0.3, p=3.0,
                              dtype=jnp.float32)
        bc = et.apply_fixed_boundary(
            grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
        mask = jnp.asarray(et.build_free_mask(grid, [bc]), jnp.float32)
        load = et.PointLoad(
            et.select_nodes_by_box(grid, [16, 0, 0], [16, 0, 4]),
            [0.0, -1.0, 0.0])
        f = jnp.asarray(et.build_load_field(grid, [load]),
                        jnp.float32) * mask
        scale = op.youngs_modulus(jnp.full(grid.nels, 0.4, jnp.float32))
        A = lambda v: op.apply(v, scale, mask)
        sols = {}
        for tag, cd in (("fp32", None), ("bf16", jnp.bfloat16)):
            mg = MultigridPreconditioner(op, smooth_iters=2, cycle_dtype=cd)
            M = mg.preconditioner_factory()(scale, mask)
            sols[tag] = cg_solve(A, f, M=M, rtol=1e-5, maxiter=1000)
        assert int(sols["bf16"].iterations) <= 2 * int(sols["fp32"].iterations)
        # both reach the same residual tolerance; solutions agree to a
        # condition-number-amplified tolerance
        bnorm = float(jnp.sqrt(jnp.vdot(f, f)))
        assert float(sols["bf16"].residual_norm) <= 1.1e-5 * bnorm
        assert float(sols["fp32"].residual_norm) <= 1.1e-5 * bnorm
        umax = np.abs(np.asarray(sols["fp32"].u)).max()
        np.testing.assert_allclose(
            np.asarray(sols["bf16"].u), np.asarray(sols["fp32"].u),
            atol=2e-3 * umax)

    def test_bf16_stencil_storage_converges_like_fp32(self):
        """stencil_dtype=bf16 (narrow Galerkin coefficient STORAGE, fp32
        smoother arithmetic) reaches the same CG tolerance with a mild
        iteration penalty — the knob that halves the dominant coarse-side
        HBM traffic on TPU."""
        import easysimp_tpu as et
        from easysimp_tpu.ops.cg import cg_solve

        grid = et.generate_grid((16, 8, 4), (0.0, 0.0, 0.0),
                                (16.0, 8.0, 4.0))
        op = et.VoxelOperator(grid, E0=1.0, Emin=1e-9, nu=0.3, p=3.0,
                              dtype=jnp.float32)
        bc = et.apply_fixed_boundary(
            grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
        mask = jnp.asarray(et.build_free_mask(grid, [bc]), jnp.float32)
        load = et.PointLoad(
            et.select_nodes_by_box(grid, [16, 0, 0], [16, 0, 4]),
            [0.0, -1.0, 0.0])
        f = jnp.asarray(et.build_load_field(grid, [load]),
                        jnp.float32) * mask
        rng = np.random.default_rng(11)
        scale = op.youngs_modulus(
            jnp.asarray(rng.choice([0.01, 1.0], size=grid.nels),
                        jnp.float32))
        A = lambda v: op.apply(v, scale, mask)
        sols = {}
        for tag, sd in (("fp32", None), ("bf16", jnp.bfloat16)):
            mg = MultigridPreconditioner(op, smooth_iters=(1, 3),
                                         stencil_dtype=sd)
            M = mg.preconditioner_factory()(scale, mask)
            sols[tag] = cg_solve(A, f, M=M, rtol=1e-5, maxiter=1000)
        assert int(sols["bf16"].iterations) <= \
            int(1.5 * sols["fp32"].iterations) + 2
        bnorm = float(jnp.sqrt(jnp.vdot(f, f)))
        assert float(sols["bf16"].residual_norm) <= 1.1e-5 * bnorm
        umax = np.abs(np.asarray(sols["fp32"].u)).max()
        np.testing.assert_allclose(
            np.asarray(sols["bf16"].u), np.asarray(sols["fp32"].u),
            atol=2e-3 * umax)


class TestDeflatedCG:
    """Subspace-recycled CG (`cg_solve(deflate=...)`): the Galerkin
    projection over a basis stack, incl. the rank-deficient ring-buffer
    cases the driver produces (zero rows, duplicate rows)."""

    def _problem(self):
        import easysimp_tpu as et

        grid = et.generate_grid((12, 6, 4), (0.0, 0.0, 0.0),
                                (12.0, 6.0, 4.0))
        op = et.VoxelOperator(grid, E0=1.0, Emin=1e-9, nu=0.3, p=3.0,
                              dtype=jnp.float64)
        bc = et.apply_fixed_boundary(
            grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
        mask = jnp.asarray(et.build_free_mask(grid, [bc]))
        load = et.PointLoad(
            et.select_nodes_by_box(grid, [12, 0, 0], [12, 0, 4]),
            [0.0, -1.0, 0.0])
        f = jnp.asarray(et.build_load_field(grid, [load])) * mask
        rng = np.random.default_rng(5)
        scale = op.youngs_modulus(
            jnp.asarray(rng.choice([0.05, 1.0], size=grid.nels)))
        A = lambda v: op.apply(v, scale, mask)
        return A, f, mask

    def test_solution_in_span_converges_immediately(self):
        from easysimp_tpu.ops.cg import cg_solve

        A, f, mask = self._problem()
        exact = cg_solve(A, f, rtol=1e-12, maxiter=5000)
        rng = np.random.default_rng(6)
        noise = jnp.asarray(rng.standard_normal(f.shape)) * mask
        W = jnp.stack([exact.u, 0.5 * noise])
        sol = cg_solve(A, f, deflate=W, rtol=1e-10, maxiter=50)
        # the projection finds the exact solution before CG iterates
        assert int(sol.iterations) <= 1
        np.testing.assert_allclose(np.asarray(sol.u), np.asarray(exact.u),
                                   atol=1e-8)

    def test_rank_deficient_basis_is_safe_and_helps(self):
        from easysimp_tpu.ops.cg import cg_solve

        A, f, mask = self._problem()
        plain = cg_solve(A, f, rtol=1e-8, maxiter=5000)
        near = cg_solve(A, f, rtol=1e-2, maxiter=5000).u  # coarse solve
        # ring-buffer pathology: zero rows + duplicated direction
        W = jnp.stack([near, near, jnp.zeros_like(near)])
        sol = cg_solve(A, f, deflate=W, rtol=1e-8, maxiter=5000)
        assert np.isfinite(float(sol.residual_norm))
        assert int(sol.iterations) <= int(plain.iterations)
        np.testing.assert_allclose(np.asarray(sol.u), np.asarray(plain.u),
                                   atol=1e-6 * float(jnp.max(jnp.abs(plain.u))))


class TestPowerInitSplit:
    def test_split_matches_one_shot(self):
        """power_init_split (per-level device programs, the flake-robust TPU
        form) returns exactly the vectors of the one-program power_init."""
        grid = et.generate_grid((16, 8, 8), (0.0, 0.0, 0.0), (16.0, 8.0, 8.0))
        op = et.VoxelOperator(grid, E0=200.0, Emin=1e-6, nu=0.3, p=3.0,
                              dtype=jnp.float64)
        bc = et.apply_fixed_boundary(
            grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
        mask = jnp.asarray(et.build_free_mask(grid, [bc]))
        rng = np.random.default_rng(7)
        scale = op.youngs_modulus(
            jnp.asarray(rng.choice([0.02, 1.0], size=grid.nels)))
        mg = MultigridPreconditioner(op, smooth_iters=2)
        assert mg.n_levels >= 2
        one = mg.power_init(scale, mask)
        split = mg.power_init_split(scale, mask)
        assert len(one) == len(split)
        for a, b in zip(one, split):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-14)


def test_setup_light_reuses_deep_and_refreshes_fine(monkeypatch):
    """setup_light (params.mg_full_setup_every): level-0/1 data must equal
    a full warm setup's on the NEW design; deeper stencils and the
    coarsest Cholesky must be the previous state's, and the output pytree
    structure must match `setup`'s (one compiled CG program serves both)."""
    import jax

    from easysimp_tpu.ops.operator import VoxelOperator
    from easysimp_tpu.ops.stencil import level_stencil_from_scale

    monkeypatch.setenv("EASYSIMP_MAX_COARSE_DOFS", "500")
    grid = et.generate_grid((16, 8, 8), (0.0, 0.0, 0.0), (16.0, 8.0, 8.0))
    op = VoxelOperator(grid, E0=100.0, Emin=1e-6, nu=0.3, p=3.0,
                       dtype=jnp.float64)
    mg = MultigridPreconditioner(op, smooth_iters=(1, 2))
    assert mg.n_levels >= 3 and mg.supports_light_setup

    rng = np.random.default_rng(3)
    dA = jnp.asarray(rng.uniform(0.2, 1.0, grid.nels), jnp.float64)
    dB = jnp.clip(dA + jnp.asarray(
        rng.uniform(-0.2, 0.2, grid.nels), jnp.float64), 0.05, 1.0)
    mask = jnp.ones((*grid.nnodes_per_axis, 3), jnp.float64)
    mask = mask.at[0].set(0.0)
    scaleA = op.youngs_modulus(dA)
    scaleB = op.youngs_modulus(dB)

    pv0 = mg.power_init(scaleA, mask)
    stateA, vecsA = jax.jit(mg.setup)(scaleA, mask, pv0)
    stateL, vecsL = jax.jit(mg.setup_light)(scaleB, mask, vecsA, stateA)
    stateF, vecsF = jax.jit(mg.setup)(scaleB, mask, vecsA)  # full, warm

    # identical pytree structure (the compiled CG program accepts either)
    assert jax.tree.structure(stateL) == jax.tree.structure(stateF)

    # fine half refreshed exactly like the full warm setup
    for key in ("diags", "lams", "omegas"):
        for lvl in (0, 1):
            np.testing.assert_allclose(
                np.asarray(stateL[key][lvl]), np.asarray(stateF[key][lvl]),
                rtol=1e-12, err_msg=f"{key}[{lvl}]")
    np.testing.assert_allclose(
        np.asarray(stateL["stencils"][1]),
        np.asarray(level_stencil_from_scale(scaleB, mg._Gs[1], 1)),
        rtol=1e-12)
    for lvl in (0, 1):
        np.testing.assert_allclose(np.asarray(vecsL[lvl]),
                                   np.asarray(vecsF[lvl]), rtol=1e-12)

    # deep levels + coarsest factor reused from the PREVIOUS state
    for lvl in range(2, mg.n_levels):
        np.testing.assert_array_equal(np.asarray(stateL["stencils"][lvl]),
                                      np.asarray(stateA["stencils"][lvl]))
        np.testing.assert_array_equal(np.asarray(stateL["lams"][lvl]),
                                      np.asarray(stateA["lams"][lvl]))
        np.testing.assert_array_equal(np.asarray(vecsL[lvl]),
                                      np.asarray(vecsA[lvl]))
    np.testing.assert_array_equal(np.asarray(stateL["cho"][0][0]),
                                  np.asarray(stateA["cho"][0][0]))
