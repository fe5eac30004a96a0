"""End-to-end SIMP trajectory parity vs the scipy direct-solve reference.

This is the rebuild's analogue of the reference's canonical correctness
workload (test/runtests.jl:16-106: 60x20x4 cantilever, 20 iterations) with the
verification rigor the reference lacks: per-iteration compliance must match a
direct sparse solver to rtol <= 1e-6 (BASELINE.md target) and the density
trajectory must track elementwise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import easysimp_tpu as et
from reference_impl import simp_optimize_reference


def build_cantilever(nels, E0=200.0, vf=0.4, max_iter=10, tol=0.01,
                     filter_radius=1.5, filter_type="sensitivity"):
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                            tuple(float(n) for n in nels))
    fixed_nodes = et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-3)
    nx, ny, nz = nels
    force_nodes = et.select_nodes_by_box(
        grid, [nx, 0, 0], [nx, 0, nz]
    )
    bc = et.apply_fixed_boundary(grid, fixed_nodes)
    load = et.PointLoad(force_nodes, [0.0, -1.0, 0.0])
    params = et.OptimizationParameters(
        E0=E0, Emin=1e-6, nu=0.3, p=3.0, volume_fraction=vf,
        max_iterations=max_iter, tolerance=tol, filter_radius=filter_radius,
        filter_type=filter_type, dtype="float64", cg_rtol=1e-12,
    )
    return grid, bc, load, params


def run_reference(grid, bc, load, params, tag=None):
    """tag != None routes through the committed golden-file oracle cache
    (tests/golden.py) — used by the slow marks only, where the direct-solve
    oracle dominates the suite wall time."""
    f = np.asarray(et.build_load_field(grid, [load]), dtype=np.float64)
    f_flat = grid.dofs_flat(f)
    mask = et.build_free_mask(grid, [bc])
    fixed_dofs = np.nonzero(grid.dofs_flat(mask) == 0)[0]
    kw = dict(
        E0=params.E0, Emin=params.Emin, nu=params.nu, p=params.p,
        volume_fraction=params.volume_fraction,
        max_iterations=params.max_iterations, tolerance=params.tolerance,
        filter_radius_ratio=params.filter_radius,
        filter_type=params.filter_type,
        move=params.move_limit, damping=params.damping,
    )
    if tag is not None:
        from golden import simp_optimize_reference_cached

        return simp_optimize_reference_cached(
            tag, grid.node_coords, grid.hex_connectivity, fixed_dofs,
            f_flat, **kw)
    return simp_optimize_reference(
        grid.node_coords, grid.hex_connectivity, fixed_dofs, f_flat, **kw)


@pytest.mark.parametrize("filter_type", ["sensitivity", "density"])
def test_trajectory_parity_small(filter_type):
    """Full 10-iteration trajectory: compliance rtol <= 1e-6 per iteration,
    density trajectory tracks the direct-solver reference elementwise."""
    grid, bc, load, params = build_cantilever(
        (10, 6, 2), max_iter=10, filter_type=filter_type
    )
    res = et.simp_optimize(grid, [load], [bc], params)
    ref = run_reference(grid, bc, load, params)

    assert len(res.energy_history) == len(ref["energies"])
    np.testing.assert_allclose(
        res.energy_history, ref["energies"], rtol=1e-6,
        err_msg=f"compliance parity ({filter_type})",
    )
    np.testing.assert_allclose(
        res.volume_history, ref["volumes"], rtol=1e-7
    )
    np.testing.assert_allclose(
        res.densities, ref["final_densities"], atol=5e-5
    )
    assert np.isclose(res.energy, ref["final_energy"], rtol=1e-6)


@pytest.mark.slow
def test_canonical_cantilever_60x20x4():
    """The reference's canonical smoke workload (test/runtests.jl:20-104):
    60x20x4 hex cantilever, E0=200, vf=0.4, p=3, r=2.5, 20 iters @ tol 0.08.
    BASELINE.md: compliance rtol <= 1e-6 vs the direct solver."""
    grid = et.generate_grid((60, 20, 4), (0.0, 0.0, 0.0), (60.0, 20.0, 4.0))
    fixed_nodes = et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-3)
    force_nodes = et.select_nodes_by_circle(
        grid, [60.0, 0.0, 2.0], [1.0, 0.0, 0.0], 1.0
    )
    assert len(force_nodes) > 0
    bc = et.apply_fixed_boundary(grid, fixed_nodes)
    load = et.PointLoad(force_nodes, [0.0, -1.0, 0.0])
    params = et.OptimizationParameters(
        E0=200.0, Emin=1e-6, nu=0.3, p=3.0, volume_fraction=0.4,
        max_iterations=20, tolerance=0.08, filter_radius=2.5,
        move_limit=0.2, damping=0.5, dtype="float64", cg_rtol=1e-12,
    )
    res = et.simp_optimize(grid, [load], [bc], params)
    ref = run_reference(grid, bc, load, params, tag="canonical_60x20x4")
    np.testing.assert_allclose(res.energy_history, ref["energies"], rtol=1e-6)
    np.testing.assert_allclose(res.densities, ref["final_densities"], atol=5e-5)
    assert np.isclose(res.energy, ref["final_energy"], rtol=1e-6)


def test_finite_difference_sensitivities():
    """Generalization of the reference's VerifySensitivities.jl FD check.

    Note the reference convention (SensitivityAnalysis.jl:74-78): the
    sensitivities are d(u^T K u)/d rho — FULL compliance, i.e. 2x the logged
    energy 0.5 u^T K u.  The OC update is invariant to uniform sensitivity
    scaling (lambda absorbs it), so this convention is self-consistent; the FD
    check must differentiate the same quantity."""
    grid, bc, load, params = build_cantilever((6, 4, 2), max_iter=1)
    op = et.VoxelOperator(grid, E0=params.E0, Emin=params.Emin, nu=params.nu,
                          p=params.p, dtype=jnp.float64)
    mask = jnp.asarray(et.build_free_mask(grid, [bc]))
    f = jnp.asarray(et.build_load_field(grid, [load])) * mask
    from easysimp_tpu.ops.cg import cg_solve

    def compliance(rho3d):
        scale = op.youngs_modulus(rho3d)
        diag = op.diagonal(scale, mask)
        sol = cg_solve(lambda v: op.apply(v, scale, mask), f,
                       M=lambda r: r / diag, rtol=1e-13, maxiter=5000)
        return float(jnp.vdot(sol.u, f) - sol.u_dot_r), sol.u  # u^T K u

    rng = np.random.default_rng(2)
    rho = rng.uniform(0.3, 0.9, grid.nels)
    c0, u = compliance(jnp.asarray(rho))
    sens = np.asarray(op.compliance_sensitivities(u, jnp.asarray(rho)))

    h = 1e-6
    for idx in [(0, 0, 0), (2, 1, 1), (5, 3, 1)]:
        pert = rho.copy()
        pert[idx] += h
        c1, _ = compliance(jnp.asarray(pert))
        fd = (c1 - c0) / h
        assert np.isclose(fd, sens[idx], rtol=2e-4), (idx, fd, sens[idx])


def test_body_force_matches_reference_semantics():
    """Variable-density body force: total applied force equals
    sum(rho * base_density * V_e) * accel, matching
    apply_variable_density_volume_force! (FiniteElementAnalysis.jl:486-526)."""
    from easysimp_tpu.loads import voxel_body_force

    grid = et.generate_grid((3, 2, 2), (0.0, 0.0, 0.0), (1.5, 1.0, 1.0))
    rng = np.random.default_rng(3)
    rho = rng.uniform(0.2, 1.0, grid.nels)
    accel = (0.0, -9.81, 0.0)
    f = np.asarray(voxel_body_force(jnp.asarray(rho), accel, 7850.0,
                                    grid.element_volume, jnp.float64))
    total = grid.nodes_flat(f).sum(axis=0)
    expected = np.asarray(accel) * 7850.0 * rho.sum() * grid.element_volume
    np.testing.assert_allclose(total, expected, rtol=1e-12)
    # skip guard: rho < 1e-6 contributes nothing
    rho2 = rho.copy()
    rho2[0, 0, 0] = 1e-8
    f2 = np.asarray(voxel_body_force(jnp.asarray(rho2), accel, 7850.0,
                                     grid.element_volume, jnp.float64))
    expected2 = np.asarray(accel) * 7850.0 * (rho2 * (rho2 >= 1e-6)).sum() \
        * grid.element_volume
    np.testing.assert_allclose(grid.nodes_flat(f2).sum(axis=0), expected2,
                               rtol=1e-12)


def test_convergence_and_result_fields():
    grid, bc, load, params = build_cantilever((8, 4, 2), max_iter=60, tol=0.02)
    res = et.simp_optimize(grid, [load], [bc], params)
    assert res.converged
    assert res.iterations < 60
    assert res.change_history[-1] < 0.02
    # energy decreases overall
    assert res.energy_history[-1] < res.energy_history[0]
    # result arrays well-formed
    assert res.densities.shape == (grid.n_cells,)
    assert res.displacements.shape == (grid.n_dofs,)
    assert res.stresses.von_mises.shape == (grid.n_cells,)
    assert res.element_energies.shape == (grid.n_cells,)
    assert np.all(res.element_energies >= 0)


def test_mg_setup_every_trajectory_matches():
    """A stale preconditioner (mg_setup_every=3) must reproduce the
    refresh-every-iteration trajectory: CG always applies the CURRENT
    operator, so with a tight cg_rtol both runs converge to the same
    solves and the SIMP trajectory agrees to solver tolerance."""
    grid, bc, load, params = build_cantilever((10, 6, 4), max_iter=7)

    def run(setup_every):
        p = et.OptimizationParameters(
            **{**params.__dict__, "preconditioner": "multigrid",
               "cg_rtol": 1e-12, "mg_setup_every": setup_every})
        return et.simp_optimize(grid, [load], [bc], p)

    res1 = run(1)
    res3 = run(3)
    np.testing.assert_allclose(res3.energy_history, res1.energy_history,
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res3.densities),
                               np.asarray(res1.densities),
                               rtol=1e-7, atol=1e-9)


def test_split3_with_recycle_matches():
    """The three-program (precond | cg | update) driver path combined with
    subspace recycling — the exact composition the TPU bench runs — must
    match the one-program recycled trajectory."""
    grid, bc, load, params = build_cantilever((10, 6, 4), max_iter=6)

    def run(setup_every):
        p = et.OptimizationParameters(
            **{**params.__dict__, "preconditioner": "multigrid",
               "cg_rtol": 1e-12, "cg_recycle_k": 3,
               "mg_setup_every": setup_every})
        return et.simp_optimize(grid, [load], [bc], p)

    res1 = run(1)   # two-program path
    res2 = run(2)   # forces use_split3 on CPU
    np.testing.assert_allclose(res2.energy_history, res1.energy_history,
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res2.densities),
                               np.asarray(res1.densities),
                               rtol=1e-7, atol=1e-9)


def test_bench_config_trajectory_parity():
    """The bench's measured-best TPU composition — fp32, Galerkin V(1,2),
    bfloat16 cycle interior, subspace-recycled CG — must still track the
    fp64 direct-solver reference: the low-precision pieces only steer the
    preconditioner/warm start, CG converges to cg_rtol either way."""
    grid, bc, load, params = build_cantilever((10, 6, 4), max_iter=8)
    p = et.OptimizationParameters(
        **{**params.__dict__, "dtype": "float32", "cg_rtol": 1e-6,
           "preconditioner": "multigrid", "mg_smooth_iters": (1, 2),
           "mg_cycle_dtype": "bfloat16", "cg_recycle_k": 4})
    res = et.simp_optimize(grid, [load], [bc], p)
    ref = run_reference(grid, bc, load, params)
    np.testing.assert_allclose(res.energy_history, ref["energies"],
                               rtol=2e-4)
    np.testing.assert_allclose(res.volume_history, ref["volumes"],
                               rtol=1e-5)


def test_cg_recycle_trajectory_matches():
    """Subspace-recycled CG (cg_recycle_k) only changes the warm start of
    each solve; with a tight cg_rtol the SIMP trajectory must agree with
    the non-recycled run to solver tolerance, with no extra CG
    iterations."""
    grid, bc, load, params = build_cantilever((10, 6, 4), max_iter=7)

    def run(k):
        p = et.OptimizationParameters(
            **{**params.__dict__, "preconditioner": "multigrid",
               "cg_rtol": 1e-12, "cg_recycle_k": k})
        return et.simp_optimize(grid, [load], [bc], p)

    res0 = run(0)
    res4 = run(4)
    np.testing.assert_allclose(res4.energy_history, res0.energy_history,
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res4.densities),
                               np.asarray(res0.densities),
                               rtol=1e-7, atol=1e-9)
    # CG count is not strictly monotone in the starting residual (it
    # depends on the error's spectral content); allow one extra iteration
    # per solve of slack while still catching a broken projection.
    assert sum(res4.cg_iterations_history) <= \
        sum(res0.cg_iterations_history) + len(res0.cg_iterations_history)


def test_cg_recycle_bf16_ring_matches():
    """A bfloat16-STORED recycle ring (cg_recycle_dtype) only degrades the
    deflation basis — the Galerkin projection upcasts and CG still solves
    to cg_rtol, so the trajectory must agree with the fp-ring run to
    solver tolerance.  (The narrow ring is the 256^3 memory fix: k node
    fields are 4.7 GB fp32 at 51M dofs.)"""
    grid, bc, load, params = build_cantilever((10, 6, 4), max_iter=6)

    def run(ring_dtype):
        p = et.OptimizationParameters(
            **{**params.__dict__, "preconditioner": "multigrid",
               "cg_rtol": 1e-12, "cg_recycle_k": 4,
               "cg_recycle_dtype": ring_dtype})
        return et.simp_optimize(grid, [load], [bc], p)

    res_full = run("")
    res_bf16 = run("bfloat16")
    np.testing.assert_allclose(res_bf16.energy_history,
                               res_full.energy_history, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_bf16.densities),
                               np.asarray(res_full.densities),
                               rtol=1e-7, atol=1e-9)


def test_adaptive_forcing_tight_setting_degenerates_to_fixed():
    """cg_forcing='adaptive' with cg_rtol_max == cg_rtol is the fixed
    schedule (the rtol merely rides in as a device scalar instead of a
    compile-time constant) — trajectory must agree to solver roundoff.
    Run on BOTH driver paths: two-program and split (precond | cg)."""
    grid, bc, load, params = build_cantilever((10, 6, 4), max_iter=6)

    def run(forcing, setup_every=1, **kw):
        p = et.OptimizationParameters(
            **{**params.__dict__, "preconditioner": "multigrid",
               "cg_rtol": 1e-12, "cg_forcing": forcing,
               "mg_setup_every": setup_every, **kw})
        return et.simp_optimize(grid, [load], [bc], p)

    for setup_every in (1, 2):   # 2 forces the split-program path on CPU
        res_f = run("fixed", setup_every)
        res_a = run("adaptive", setup_every, cg_rtol_max=1e-12)
        np.testing.assert_allclose(res_a.energy_history, res_f.energy_history,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(res_a.densities),
                                   np.asarray(res_f.densities),
                                   rtol=1e-8, atol=1e-10)


def test_adaptive_forcing_cuts_cg_preserves_compliance():
    """Inexact SIMP: the adaptive schedule must cut total CG work
    substantially while landing on the same design (the solve only feeds a
    move-limited OC update; the floor cg_rtol restores tight solves as the
    design converges)."""
    grid, bc, load, params = build_cantilever((12, 6, 4), max_iter=20,
                                              tol=0.0)

    def run(forcing):
        p = et.OptimizationParameters(
            **{**params.__dict__, "preconditioner": "multigrid",
               "cg_rtol": 1e-6, "cg_forcing": forcing})
        return et.simp_optimize(grid, [load], [bc], p)

    res_f = run("fixed")
    res_a = run("adaptive")
    total_f = sum(res_f.cg_iterations_history)
    total_a = sum(res_a.cg_iterations_history)
    assert total_a <= 0.85 * total_f, (total_a, total_f)
    # final analysis re-solves at the tight tolerance in both runs
    np.testing.assert_allclose(res_a.energy, res_f.energy, rtol=2e-3)
    np.testing.assert_allclose(res_a.volume_history, res_f.volume_history,
                               rtol=1e-6)


def test_adaptive_forcing_unstructured():
    """Same forcing contract on the unstructured driver."""
    from test_unstructured import tet_mesh_from_voxels

    mesh = tet_mesh_from_voxels((6, 3, 2))
    bc = et.apply_fixed_boundary(
        mesh, et.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-6))
    load = et.PointLoad(
        et.select_nodes_by_plane(mesh, [6, 0, 0], [1, 0, 0], 1e-6),
        [0.0, -1.0, 0.0])

    def run(forcing, **kw):
        p = et.OptimizationParameters(
            E0=100.0, Emin=1e-6, volume_fraction=0.4, max_iterations=12,
            tolerance=0.0, filter_radius=1.5, dtype="float64",
            cg_rtol=1e-8, cg_forcing=forcing, **kw)
        return et.simp_optimize(mesh, [load], [bc], p)

    res_f = run("fixed")
    res_tight = run("adaptive", cg_rtol_max=1e-8)
    np.testing.assert_allclose(res_tight.energy_history,
                               res_f.energy_history, rtol=1e-9)
    res_a = run("adaptive")
    assert sum(res_a.cg_iterations_history) < \
        sum(res_f.cg_iterations_history)
    np.testing.assert_allclose(res_a.energy, res_f.energy, rtol=2e-3)


def test_step_precond_cg_split_matches_step_solve():
    """The round-3 three-program split (step_precond | step_cg | step_update)
    must reproduce the two-program iteration: same CG iteration counts and
    energies over a short trajectory (multigrid preconditioner, so the MG
    setup actually exercises the Galerkin stencil build)."""
    import jax

    from easysimp_tpu.opt.optimize import build_voxel_step

    grid, bc, load, params = build_cantilever((8, 8, 8), max_iter=4)
    params = et.OptimizationParameters(
        **{**params.__dict__, "preconditioner": "multigrid",
           "cg_rtol": 1e-10})
    vs = build_voxel_step(grid, [load], [bc], params)
    assert vs.step_precond is not None and vs.step_cg is not None

    f_ext, free_mask, vsens = vs.step_args
    solve2 = jax.jit(vs.step_solve)
    pre = jax.jit(vs.step_precond)
    cg3 = jax.jit(vs.step_cg)
    upd = jax.jit(vs.step_update)

    d_a = d_b = vs.design0
    u_a = u_b = vs.u0
    pv_a = pv_b = vs.pvecs0
    for _ in range(4):
        phys_a, u_a, e_a, v_a, it_a, res_a, pv_a = solve2(
            d_a, u_a, pv_a, f_ext, free_mask)
        d_a = upd(d_a, phys_a, u_a, vsens)[0]

        phys_b, state, pv_b = pre(d_b, pv_b, free_mask)
        u_b, e_b, v_b, it_b, res_b = cg3(d_b, phys_b, state, u_b, f_ext,
                                         free_mask)
        d_b = upd(d_b, phys_b, u_b, vsens)[0]

        assert int(it_a) == int(it_b)
        np.testing.assert_allclose(float(e_a), float(e_b), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(phys_a), np.asarray(phys_b),
                                   rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b),
                               rtol=1e-9, atol=1e-12)


def test_mg_full_setup_every_light_refresh_matches(monkeypatch):
    """Partial setup (mg_full_setup_every=3): between full setups only the
    fine half (level-0 diag/lambda + level-1 Galerkin stencil) refreshes
    while deep levels + the coarsest Cholesky are reused.  With a tight
    cg_rtol the preconditioner difference cannot move the solves, so the
    trajectory must match the full-refresh run to solver tolerance."""
    monkeypatch.setenv("EASYSIMP_MAX_COARSE_DOFS", "500")
    grid, bc, load, params = build_cantilever((16, 8, 8), max_iter=7)

    def run(full_every):
        p = et.OptimizationParameters(
            **{**params.__dict__, "preconditioner": "multigrid",
               "cg_rtol": 1e-12, "cg_recycle_k": 3,
               "mg_full_setup_every": full_every})
        return et.simp_optimize(grid, [load], [bc], p)

    res1 = run(1)
    res3 = run(3)   # forces use_split3 + the light program on CPU
    np.testing.assert_allclose(res3.energy_history, res1.energy_history,
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res3.densities),
                               np.asarray(res1.densities),
                               rtol=1e-7, atol=1e-9)
