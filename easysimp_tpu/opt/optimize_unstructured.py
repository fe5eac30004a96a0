"""SIMP driver for imported unstructured meshes (tet4 / hex8).

Same iteration semantics as the voxel driver (see optimize.py and
src/Optimization/Optimization.jl:178-565); the differences are mechanical:
flat (n_cells,) density vectors, flat (3*n_nodes,) dof vectors, the
gather/segment-add UnstructuredOperator, padded-neighbor-list filters, and
CG preconditioned by the two-level RBM-aggregation AMG (ops/amg.py; the
algebraic stand-in for the voxel path's geometric multigrid).  Optionally
element-decomposed over a device mesh (device_mesh=...).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..bcs import build_free_mask
from ..config import default_dtype
from ..loads import build_load_field
from ..ops.cg import (cg_solve, recycle_deflate, recycle_init,
                       recycle_push)
from ..ops.elements import element_stiffness_batch_np, shape_integrals_batch_np
from ..ops.filters import UnstructuredFilter
from ..ops.oc import MAX_BISECTION, oc_update, sensitivity_health
from ..ops.operator import UnstructuredOperator
from ..params import OptimizationParameters, OptimizationResult
from ..utils.terminal import (
    print_data,
    print_info,
    print_success,
    print_warning,
)

__all__ = ["simp_optimize_unstructured", "build_unstructured_step"]


def _resolve_dtype(params):
    if params.dtype == "auto":
        return default_dtype()
    return jnp.dtype(params.dtype)


class UnstructuredStep:
    def __init__(self, mesh, op, filt, step, solve, design0, u0,
                 element_volumes, total_volume, dtype, use_density_filter,
                 shape_integrals, element_energy, step_setup=None,
                 step_cg=None, step_update=None):
        self.mesh = mesh
        self.op = op
        self.filt = filt
        self.step = step
        self.solve = solve
        self.design0 = design0
        self.u0 = u0
        self.element_volumes = element_volumes
        self.total_volume = total_volume
        self.dtype = dtype
        self.use_density_filter = use_density_filter
        self.shape_integrals = shape_integrals
        self.element_energy = element_energy
        # OPTIONAL three-program split of `step` for the tunnel TPU,
        # mirroring the voxel path (opt/optimize.py VoxelStep): the
        # one-program composition at >=5e5 elements is too large for the
        # remote-compile relay (round 5: tet44 broke the transport with
        # "Broken pipe" mid-compile), and smaller programs are the
        # established fault mitigation (memory/tpu-env-gotchas.md).
        # step_setup(design) -> (phys, amg_state)
        # step_cg(design, phys, amg_state, u_prev, recycle=, rtol=)
        #     -> (u, energy, volume, cg_iters, cg_res)
        # step_update(design, phys, u)
        #     -> (new_design, change, lam, grayness, max_disp,
        #         bisect_iters, bisect_verr, frac_neg, max_abs, fsens)
        # None when the preconditioner is stateless (jacobi/block_jacobi).
        self.step_setup = step_setup
        self.step_cg = step_cg
        self.step_update = step_update


def build_unstructured_step(mesh, loads, boundary_conditions,
                            params: OptimizationParameters,
                            acceleration_data=None,
                            device_mesh=None) -> UnstructuredStep:
    """Construct the jit-compilable SIMP iteration for an imported mesh.

    device_mesh: optional 1-axis ("e",) jax.sharding.Mesh (see
    parallel/sharding.py:make_element_mesh) — element-decomposes the
    operator/filter/AMG batches over devices; node/dof vectors stay
    replicated and GSPMD all-reduces the scatter-adds.
    """
    dtype = _resolve_dtype(params)

    if not getattr(mesh, "is_volume_mesh", True):
        raise ValueError(
            f"SIMP optimization needs a volume mesh (tet4/hex8); got "
            f"{mesh.cell_type} cells")

    coords = mesh.node_coords[mesh.connectivity]       # (E, nn, 3)
    ke_unit, vols = element_stiffness_batch_np(coords, E=1.0, nu=params.nu)
    op = UnstructuredOperator(
        ke_unit, mesh.connectivity, mesh.n_nodes, E0=params.E0,
        Emin=params.Emin, nu=params.nu, p=params.p, dtype=dtype,
    )
    material_model = params.material_model
    # Equivalent-modulus field for the PRECONDITIONER under a custom
    # material: E_eff = mu(rho) / mu_unit — exact when nu is density-
    # independent; an SPD approximation otherwise (the preconditioner only
    # steers CG, the operator itself stays exact).  Same recipe as the
    # voxel driver (optimize.py:_precond_scale).
    mu_unit = 1.0 / (2.0 * (1.0 + params.nu))
    if material_model is not None:
        from ..ops.elements import element_stiffness_lame_basis_batch_np

        op.set_lame_basis(*element_stiffness_lame_basis_batch_np(coords))

    def _precond_scale(phys):
        if material_model is None:
            return op.youngs_modulus(phys)
        _, mu_f = material_model(phys)
        return mu_f / mu_unit

    element_volumes = jnp.asarray(vols, dtype=dtype)
    total_volume = float(vols.sum())

    radius = params.filter_radius * mesh.characteristic_element_size
    filt = UnstructuredFilter(mesh.cell_centers, vols, radius, dtype=dtype)
    use_density_filter = params.filter_type == "density"

    free_mask = jnp.asarray(build_free_mask(mesh, boundary_conditions),
                            dtype=dtype)
    f_ext = jnp.asarray(build_load_field(mesh, loads).reshape(-1), dtype=dtype)

    shape_integrals = None
    if acceleration_data is not None:
        accel_vec, base_density = acceleration_data
        shape_integrals = jnp.asarray(shape_integrals_batch_np(coords),
                                      dtype=dtype)
        accel = jnp.asarray(accel_vec, dtype=dtype)

    vol_sens_physical = element_volumes / total_volume
    vol_sens = (filt.chain_rule(vol_sens_physical) if use_density_filter
                else vol_sens_physical)

    design0 = jnp.full(mesh.n_cells, params.volume_fraction, dtype=dtype)
    u0 = jnp.zeros(mesh.n_dofs, dtype=dtype)

    if device_mesh is not None:
        from ..parallel.sharding import element_sharding, replicated_sharding

        es = element_sharding(device_mesh)
        rep = replicated_sharding(device_mesh)
        put_e = lambda x: jax.device_put(x, es)
        op.ke, op.dofmap = put_e(op.ke), put_e(op.dofmap)
        if op.ke_lam is not None:
            op.ke_lam, op.ke_mu = put_e(op.ke_lam), put_e(op.ke_mu)
        for name in ("neighbors", "weights", "volumes", "weight_sum",
                     "wv_sum"):
            setattr(filt, name, put_e(getattr(filt, name)))
        element_volumes = put_e(element_volumes)
        vol_sens = put_e(vol_sens)
        design0 = put_e(design0)
        if shape_integrals is not None:
            shape_integrals = put_e(shape_integrals)
        u0, free_mask, f_ext = (jax.device_put(x, rep)
                                for x in (u0, free_mask, f_ext))
    dofmap = op.dofmap

    def body_force(phys):
        # f_a += rho_e * base_density * integral(N_a) * accel, skipping
        # rho < 1e-6 (FiniteElementAnalysis.jl:486-526).
        w = jnp.where(phys < 1e-6, 0.0, phys) * base_density
        fe = (w[:, None] * shape_integrals)[:, :, None] * accel[None, None, :]
        out = jnp.zeros(mesh.n_dofs, dtype=dtype)
        return out.at[dofmap].add(fe.reshape(fe.shape[0], -1))

    # "auto" resolves to the multilevel RBM-aggregation AMG (ops/amg.py) —
    # the multigrid answer to the reference's CHOLMOD at SIMP contrast;
    # "block_jacobi" keeps the 3x3 nodal blocks, "jacobi" the scalar
    # diagonal.
    choice = params.preconditioner
    use_amg = choice in ("auto", "multigrid", "amg")
    use_block_jacobi = use_amg or choice == "block_jacobi"
    amg = None
    if use_amg:
        from ..ops.amg import MultilevelAMG

        free_mask_np = np.asarray(free_mask)
        amg = MultilevelAMG(
            op, mesh, free_mask_np,
            max_coarse_dofs=params.amg_max_coarse_dofs,
            smooth_prolongator=params.amg_smooth_prolongator)
        if device_mesh is not None:
            from ..parallel.sharding import (element_sharding,
                                             replicated_sharding)

            # element-indexed assembly inputs ride element-sharded like
            # op.ke; the (small) aggregate-space arrays stay replicated
            es = element_sharding(device_mesh)
            amg.node_conn = jax.device_put(amg.node_conn, es)
            if amg.smooth_p:
                amg.elem_nodepair_idx = jax.device_put(
                    amg.elem_nodepair_idx, es)
            else:
                amg.elem_pair_idx = jax.device_put(amg.elem_pair_idx, es)
            rep = replicated_sharding(device_mesh)
            amg.Pn = jax.device_put(amg.Pn, rep)
            amg.agg_idx = jax.device_put(amg.agg_idx, rep)

    def forward(design, u_prev, recycle=None, rtol=None):
        phys = filt.density_filter(design) if use_density_filter else design
        scale = _precond_scale(phys)
        f = f_ext if shape_integrals is None else f_ext + body_force(phys)
        f_bc = f * free_mask
        if material_model is None:
            A = lambda v: op.apply(v, scale, free_mask)
        else:
            lam_f, mu_f = material_model(phys)
            A = lambda v: op.apply_lame(v, lam_f, mu_f, free_mask)
        if use_amg:
            Binv = op.block_diagonal_inverse(scale, free_mask)
            amg_state = amg.setup(scale, free_mask, Binv, A)
            M = lambda r: amg.apply(r, A, Binv, amg_state, free_mask)
        elif use_block_jacobi:
            Binv = op.block_diagonal_inverse(scale, free_mask)
            M = lambda r: op.apply_block_jacobi(Binv, r)
        else:
            diag = op.diagonal(scale, free_mask)
            M = lambda r: r / diag
        deflate = recycle_deflate(free_mask, recycle)
        sol = cg_solve(A, f_bc, x0=u_prev * free_mask, M=M,
                       rtol=params.cg_rtol if rtol is None else rtol,
                       maxiter=params.cg_maxiter,
                       deflate=deflate)
        energy = 0.5 * (jnp.vdot(sol.u, f_bc) - sol.u_dot_r)
        volume = jnp.sum(phys * element_volumes)
        return phys, sol, energy, volume

    def _update_core(design, phys, u):
        """Sensitivities -> filter -> OC -> convergence metrics (the
        post-solve half of the iteration; shared by `step` and the split
        `step_update` program)."""
        if material_model is None:
            sens = op.compliance_sensitivities(u, phys)
        else:
            # exact material derivative via one elementwise jvp:
            # dc/drho = -(lam'(rho) u_e^T ke_lam u_e + mu'(rho) u_e^T ke_mu u_e)
            _, (dlam, dmu) = jax.jvp(material_model, (phys,),
                                     (jnp.ones_like(phys),))
            wl, wm = op.element_energies_lame(u)
            sens = -(dlam * wl + dmu * wm)
        if use_density_filter:
            fsens = filt.chain_rule(sens)
        else:
            fsens = filt.sensitivity_filter(design, sens)
        # volume_weights = H^T V = total_volume * vol_sens for both filter
        # types — replaces the reference's filter-in-bisection with a dot
        # product (see ops/oc.py).
        new_design, lam, bisect_iters, bisect_verr = oc_update(
            design, fsens, vol_sens, params.volume_fraction, total_volume,
            element_volumes, params.move_limit, params.damping,
            volume_weights=vol_sens * total_volume,
        )
        change = jnp.max(jnp.abs(new_design - design))
        grayness = jnp.mean(
            jnp.logical_and(phys > 0.1, phys < 0.9).astype(dtype))
        max_disp = jnp.max(jnp.abs(u))
        frac_neg, mean_abs, max_abs = sensitivity_health(fsens)
        return (new_design, change, lam, grayness, max_disp, bisect_iters,
                bisect_verr, frac_neg, max_abs, fsens)

    def step(design, u_prev, recycle=None, rtol=None):
        phys, sol, energy, volume = forward(design, u_prev, recycle=recycle,
                                            rtol=rtol)
        u = sol.u
        (new_design, change, lam, grayness, max_disp, bisect_iters,
         bisect_verr, frac_neg, max_abs, fsens) = _update_core(design, phys,
                                                               u)
        return (new_design, u, phys, energy, volume, change, lam, grayness,
                max_disp, sol.iterations, sol.residual_norm, bisect_iters,
                bisect_verr, frac_neg, max_abs, fsens)

    def step_setup(design):
        """Program 1 of the OPTIONAL three-program iteration: filter +
        per-SIMP-iteration AMG setup (device-assembled Galerkin levels, l1
        smoother inverses, coarsest Cholesky) as its OWN program."""
        phys = filt.density_filter(design) if use_density_filter else design
        scale = _precond_scale(phys)
        Binv = op.block_diagonal_inverse(scale, free_mask)
        if material_model is None:
            A = lambda v: op.apply(v, scale, free_mask)
        else:
            lam_f, mu_f = material_model(phys)
            A = lambda v: op.apply_lame(v, lam_f, mu_f, free_mask)
        return phys, amg.setup(scale, free_mask, Binv, A)

    def step_cg(design, phys, amg_state, u_prev, recycle=None, rtol=None):
        """Program 2: the AMG-CG solve on a prebuilt preconditioner state.
        step_setup + step_cg + step_update == step (tested)."""
        scale = _precond_scale(phys)
        f = f_ext if shape_integrals is None else f_ext + body_force(phys)
        f_bc = f * free_mask
        if material_model is None:
            A = lambda v: op.apply(v, scale, free_mask)
        else:
            lam_f, mu_f = material_model(phys)
            A = lambda v: op.apply_lame(v, lam_f, mu_f, free_mask)
        Binv = op.block_diagonal_inverse(scale, free_mask)
        M = lambda r: amg.apply(r, A, Binv, amg_state, free_mask)
        sol = cg_solve(A, f_bc, x0=u_prev * free_mask, M=M,
                       rtol=params.cg_rtol if rtol is None else rtol,
                       maxiter=params.cg_maxiter,
                       deflate=recycle_deflate(free_mask, recycle))
        energy = 0.5 * (jnp.vdot(sol.u, f_bc) - sol.u_dot_r)
        volume = jnp.sum(phys * element_volumes)
        return sol.u, energy, volume, sol.iterations, sol.residual_norm

    def solve_only(design):
        phys, sol, energy, _ = forward(design, jnp.zeros_like(u0))
        return phys, sol.u, energy

    def element_energy(phys, u):
        """0.5 * u_e^T K_e u_e element field (PostProcessing.jl:172-197)."""
        if material_model is None:
            return 0.5 * op.youngs_modulus(phys) * op.element_energies_unit(u)
        lam_f, mu_f = material_model(phys)
        wl, wm = op.element_energies_lame(u)
        return 0.5 * (lam_f * wl + mu_f * wm)

    return UnstructuredStep(mesh, op, filt, step, solve_only, design0, u0,
                            element_volumes, total_volume, dtype,
                            use_density_filter, shape_integrals,
                            element_energy,
                            step_setup=step_setup if use_amg else None,
                            step_cg=step_cg if use_amg else None,
                            step_update=_update_core if use_amg else None)


def simp_optimize_unstructured(mesh, loads, boundary_conditions,
                               params: OptimizationParameters,
                               acceleration_data=None,
                               resume_from=None,
                               device_mesh=None) -> OptimizationResult:
    print_info("Starting SIMP topology optimization (unstructured path)")
    logger = None
    if params.export_path:
        from .logger import OptimizationLogger

        logger = OptimizationLogger(params.export_path, params.task_name)
    if acceleration_data is not None:
        print_info(
            f"Variable density acceleration enabled: {acceleration_data[0]}")
    print_data(f"Total mesh volume: {mesh.total_volume}")

    us = build_unstructured_step(mesh, loads, boundary_conditions, params,
                                 acceleration_data, device_mesh=device_mesh)
    step_jit = jax.jit(us.step)
    solve_jit = jax.jit(us.solve)
    # Three programs per iteration on the real TPU (setup | AMG-CG |
    # update), mirroring the voxel driver: the one-program composition at
    # >= 5e5 elements overflows the tunnel's remote-compile transport and
    # large single programs are the established fault class
    # (memory/tpu-env-gotchas.md).  CPU keeps the one-program form, whose
    # equivalence to the split is tested (tests/test_unstructured.py).
    import os as _os

    use_split = (us.step_setup is not None
                 and (jax.default_backend() == "tpu"
                      # test/debug escape hatch: exercise the TPU split
                      # wiring on the CPU backend
                      or _os.environ.get(
                          "EASYSIMP_UNSTRUCTURED_SPLIT3") == "1"))
    total_volume = us.total_volume

    design, u = us.design0, us.u0
    # Subspace-recycled CG (params.cg_recycle_k, same recipe as the voxel
    # driver): ring buffer of recent solutions whose deltas deflate the
    # warm-start residual.  Element sharding replicates node fields, so
    # the buffer is mesh-compatible as-is.
    rhist = None
    push_jit = None
    recycle_dtype = (jnp.dtype(params.cg_recycle_dtype)
                      if params.cg_recycle_dtype else None)
    if params.cg_recycle_k > 1:
        rhist = recycle_init(params.cg_recycle_k, u, dtype=recycle_dtype)
        push_jit = jax.jit(recycle_push)
    # Adaptive CG forcing (inexact SIMP) — same schedule as the voxel
    # driver (see optimize.py): rtol rides in as a device scalar.
    if params.cg_forcing not in ("fixed", "adaptive"):
        raise ValueError(f"cg_forcing must be 'fixed' or 'adaptive', "
                         f"got {params.cg_forcing!r}")
    adaptive_forcing = params.cg_forcing == "adaptive"

    def _forcing_rtol(change_prev):
        val = params.cg_rtol_max if change_prev is None else min(
            params.cg_rtol_max,
            max(params.cg_rtol, params.cg_forcing_coeff * change_prev))
        return jnp.asarray(val, dtype=us.dtype)

    rtol_now = _forcing_rtol(None) if adaptive_forcing else None
    energy_history, volume_history = [], []
    change_history, cg_history = [], []
    checkpoint_triggered = [False] * len(params.tolerance_checkpoints)
    start_iteration = 1
    if resume_from:
        from .checkpoint import load_checkpoint, restore_triggered

        state = load_checkpoint(resume_from)
        design = jnp.asarray(state["design"], dtype=us.dtype)
        u = jnp.asarray(state["u"], dtype=us.dtype)
        start_iteration = state["iteration"] + 1
        energy_history = state["energy_history"]
        volume_history = state["volume_history"]
        change_history = state["change_history"]
        cg_history = state["cg_history"]
        checkpoint_triggered = restore_triggered(
            state["checkpoint_triggered"], params.tolerance_checkpoints)
        if rhist is not None:
            saved_rec = state.get("recycle")
            if saved_rec is not None and \
                    saved_rec.shape[0] == params.cg_recycle_k:
                rhist = jnp.asarray(saved_rec,
                                    dtype=recycle_dtype or us.dtype)
            else:
                # checkpoint predates recycling (or different k): seed the
                # buffer with the restored warm start.
                rhist = recycle_init(params.cg_recycle_k, u,
                                     dtype=recycle_dtype)

    if adaptive_forcing and change_history:
        # resumed runs restart the forcing schedule from the restored change
        rtol_now = _forcing_rtol(change_history[-1])

    if use_split:
        # Hoist the mesh-sized closure constants (per-element ke,
        # connectivity, AMG structure arrays) out of the split programs:
        # embedded as HLO literals they overflow the tunnel relay's
        # request cap at >= 5e5 elements (tet44: "HTTP 413: length limit
        # exceeded" on the setup program alone) — see utils/hoist.py.
        # The consts ride as runtime arguments, shared by reference
        # across the three executables.
        from ..utils.hoist import hoist_constants

        setup_h, setup_c, setup_shape = hoist_constants(us.step_setup,
                                                        design)
        _setup_jit = jax.jit(setup_h)
        phys_shape, state_shape = setup_shape
        extra_names, extra_ex = [], []
        if rhist is not None:
            extra_names.append("recycle")
            extra_ex.append(rhist)
        if adaptive_forcing:
            extra_names.append("rtol")
            extra_ex.append(rtol_now)

        def _cg_fn(design, phys, state, u_prev, *extras):
            return us.step_cg(design, phys, state, u_prev,
                              **dict(zip(extra_names, extras)))

        cg_h, cg_c, _ = hoist_constants(_cg_fn, design, phys_shape,
                                        state_shape, u, *extra_ex)
        _cg_jit = jax.jit(cg_h)
        upd_h, upd_c, _ = hoist_constants(us.step_update, design,
                                          phys_shape, u)
        _upd_jit = jax.jit(upd_h)

        def setup_jit(design):
            return _setup_jit(setup_c, design)

        def cg_solve_jit(design, phys, state, u_prev, **kw):
            return _cg_jit(cg_c, design, phys, state, u_prev,
                           *[kw[n] for n in extra_names])

        def update_jit(design, phys, u):
            return _upd_jit(upd_c, design, phys, u)

    def _maybe_save_checkpoint(it, design, u):
        if params.checkpoint_interval > 0 and params.checkpoint_path and \
                it % params.checkpoint_interval == 0:
            from .checkpoint import save_checkpoint

            save_checkpoint(
                params.checkpoint_path,
                design=np.asarray(design), u=np.asarray(u), iteration=it,
                energy_history=energy_history, volume_history=volume_history,
                change_history=change_history, cg_history=cg_history,
                checkpoint_triggered=checkpoint_triggered,
                recycle=(np.asarray(rhist) if rhist is not None else None),
            )

    converged = False
    iteration = start_iteration - 1
    warned_health = False
    warned_bisection = False

    for it in range(start_iteration, params.max_iterations + 1):
        iteration = it
        step_kw = {}
        if rhist is not None:
            step_kw["recycle"] = rhist
        if adaptive_forcing:
            step_kw["rtol"] = rtol_now
        if use_split:
            phys, amg_state = setup_jit(design)
            if it == start_iteration:
                # drain each program before loading the next on the first
                # pass (the first-execution flake mitigation, see the
                # voxel driver)
                jax.block_until_ready(amg_state)
            u, energy, volume, cg_iters, _ = cg_solve_jit(
                design, phys, amg_state, u, **step_kw)
            if it == start_iteration:
                jax.block_until_ready(u)
            (new_design, change, lam, grayness, max_disp, bisect_iters,
             bisect_verr, frac_neg, max_abs, fsens) = update_jit(
                design, phys, u)
        else:
            (new_design, u, phys, energy, volume, change, lam, grayness,
             max_disp, cg_iters, _, bisect_iters, bisect_verr, frac_neg,
             max_abs, fsens) = step_jit(design, u, **step_kw)
        if rhist is not None:
            rhist = push_jit(rhist, u)

        energy, volume, change = float(energy), float(volume), float(change)
        if adaptive_forcing:
            rtol_now = _forcing_rtol(change)
        vol_frac = volume / total_volume
        energy_history.append(energy)
        volume_history.append(volume)
        change_history.append(change)
        cg_history.append(int(cg_iters))

        # Median-centered health warnings (OptimalityCriteria.jl:19-40);
        # the median is a host-side subsample (see ops/oc.py).
        if not warned_health and (it == start_iteration or it % 10 == 0):
            from .optimize import _warn_sensitivity_health

            warned_health = _warn_sensitivity_health(
                float(frac_neg), float(max_abs), fsens)

        # OC bisection non-convergence warning, gated like the reference:
        # only when 200 iterations exhaust (OptimalityCriteria.jl:139-142)
        if not warned_bisection and int(bisect_iters) >= MAX_BISECTION \
                and abs(float(bisect_verr)) >= 1e-6:
            print_warning(
                f"OC bisection did not converge after {int(bisect_iters)} "
                f"iterations (|volume error| = {abs(float(bisect_verr)):.3e})"
            )
            warned_bisection = True

        if logger is not None:
            logger.log_iteration(it, energy, vol_frac, change, float(lam),
                                 float(grayness), float(max_disp))
        print(
            f"Iter {it:4d} | Energy: {energy:.4e} | Vol.Frac: {vol_frac:.4f} "
            f"| Change: {change:.4e} | CG: {int(cg_iters):4d}"
        )

        if params.tolerance_checkpoints and params.export_path:
            for idx, cp in enumerate(params.tolerance_checkpoints):
                if not checkpoint_triggered[idx] and change < cp:
                    checkpoint_triggered[idx] = True
                    print_info(
                        f"Tolerance checkpoint {cp} reached at iteration {it}")
                    _export_intermediate(
                        us, params, phys, u, energy, volume, it,
                        energy_history, volume_history,
                        name=f"final_results_{int(round(cp * 100)):02d}tol")

        if (params.export_interval > 0 and it % params.export_interval == 0
                and params.export_path):
            _export_intermediate(
                us, params, phys, u, energy, volume, it,
                energy_history, volume_history, name=f"iter_{it:04d}")

        design = new_design
        _maybe_save_checkpoint(it, design, u)
        if change < params.tolerance:
            print_success(f"Converged after {it} iterations")
            converged = True
            break

    phys, u, final_energy = solve_jit(design)
    final_energy = float(final_energy)
    final_volume = float(jnp.sum(phys * us.element_volumes))

    from ..stress import unstructured_stresses

    stresses = unstructured_stresses(
        us.mesh, np.asarray(u, dtype=np.float64),
        np.asarray(phys, dtype=np.float64),
        params.E0, params.Emin, params.nu, params.p,
        material_model=params.material_model)
    print_data(
        f"Maximum von Mises stress: {stresses.max_von_mises} "
        f"at cell {stresses.max_vm_cell}")
    elem_energies = np.asarray(us.element_energy(phys, u), dtype=np.float64)

    if logger is not None:
        logger.write_summary(final_energy, final_volume, converged)
        logger.close()

    print_success("Optimization completed")
    print_data(f"Final energy: {final_energy}")
    print_data(f"Final volume fraction: {final_volume / total_volume}")

    return OptimizationResult(
        densities=np.asarray(phys, dtype=np.float64),
        displacements=np.asarray(u, dtype=np.float64),
        stresses=stresses,
        energy=final_energy,
        volume=final_volume,
        iterations=iteration,
        converged=converged,
        energy_history=energy_history,
        volume_history=volume_history,
        cg_iterations_history=cg_history,
        change_history=change_history,
        element_energies=elem_energies,
    )


def _export_intermediate(us, params, phys, u, energy, volume, iteration,
                         energy_history, volume_history, name):
    import os

    from ..post.vtu import create_results_data, export_main_results
    from ..stress import unstructured_stresses

    stresses = unstructured_stresses(
        us.mesh, np.asarray(u, dtype=np.float64),
        np.asarray(phys, dtype=np.float64),
        params.E0, params.Emin, params.nu, params.p,
        material_model=params.material_model)
    elem_energies = np.asarray(us.element_energy(phys, u), dtype=np.float64)
    interim = OptimizationResult(
        densities=np.asarray(phys, dtype=np.float64),
        displacements=np.asarray(u, dtype=np.float64),
        stresses=stresses,
        energy=float(energy),
        volume=float(volume),
        iterations=iteration,
        converged=False,
        energy_history=list(energy_history),
        volume_history=list(volume_history),
        element_energies=elem_energies,
    )
    data = create_results_data(us.mesh, interim)
    export_main_results(data, os.path.join(params.export_path, name))
    print_success(f"Exported: {name}.vtu")
