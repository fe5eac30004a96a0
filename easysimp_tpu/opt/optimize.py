"""The SIMP optimization driver.

TPU-native re-architecture of `simp_optimize`
(src/Optimization/Optimization.jl:178-565).  The per-iteration pipeline —
density filter -> matrix-free solve (PCG, replacing the CHOLMOD
refactorization at Optimization.jl:317) -> compliance -> sensitivities ->
filter -> OC bisection -> convergence metric — is ONE jit-compiled function;
the Python loop around it only moves scalars for logging, convergence checks,
and optional VTU exports, exactly the side effects the reference performs
per iteration.

Iteration semantics match the reference:
  * initial design = fill(volume_fraction)             (Optimization.jl:222)
  * energy logged for the PRE-update design             (:317-324)
  * change = max|new_design - old_design| in DESIGN space (:374)
  * convergence break AFTER logging/exports             (:484-488)
  * final analysis: re-filter, re-solve, stress recovery (:494-539)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..bcs import build_free_mask
from ..config import default_dtype
from ..grids import VoxelGrid
from ..loads import build_load_field, voxel_body_force
from ..ops.cg import (cg_solve, recycle_deflate, recycle_init,
                       recycle_push)
from ..ops.filters import create_filter_cache
from ..ops.oc import (
    MAX_BISECTION,
    host_median_abs,
    oc_update,
    sensitivity_health,
)
from ..ops.operator import VoxelOperator
from ..params import OptimizationParameters, OptimizationResult
from ..utils.terminal import (
    print_data,
    print_info,
    print_success,
    print_warning,
)

__all__ = ["simp_optimize", "build_voxel_step", "VoxelStep"]


def _resolve_dtype(params: OptimizationParameters):
    if params.dtype == "auto":
        return default_dtype()
    return jnp.dtype(params.dtype)


def _warn_sensitivity_health(frac_neg, max_abs, fsens) -> bool:
    """The reference's three health warnings (OptimalityCriteria.jl:19-40):
    <50% negative, median effectively zero, max/median > 1e8.  The median of
    |s| is a host-side subsampled median (see ops/oc.py).  Returns True if a
    warning fired (the drivers warn once, not per iteration)."""
    if frac_neg < 0.5:
        print_warning(
            "Less than 50% of sensitivities are negative. Check if "
            "energy sensitivities are computed correctly."
        )
        return True
    med = host_median_abs(fsens)
    if med < np.finfo(np.float64).eps:
        print_warning(f"Sensitivities are effectively zero (median: {med}).")
        return True
    if max_abs / med > 1e8:
        print_warning(
            f"Sensitivity range too large (max/median: {max_abs / med:.3e})."
            " Check problem scaling."
        )
        return True
    return False


def _build_preconditioner(op, params):
    """Returns (factory, power_vectors0, power_init, mg).

    factory(scale, free_mask, power_vectors) -> (M(r), new_power_vectors) —
    the power vectors are the multigrid smoother's carried lambda_max
    estimation state (empty tuple for Jacobi/none, which ignore it).
    power_init(scale, free_mask) -> power_vectors is the one-time cold
    estimation the drivers run before the loop (None when not needed).

    'auto' resolves to multigrid for voxel grids when a hierarchy exists,
    else Jacobi (see ops/multigrid.py)."""
    choice = params.preconditioner
    if choice in ("auto", "multigrid") and isinstance(op, VoxelOperator):
        from ..ops.multigrid import MultigridPreconditioner

        cycle_dtype = jnp.dtype(params.mg_cycle_dtype) \
            if params.mg_cycle_dtype else None
        stencil_dtype = jnp.dtype(params.mg_stencil_dtype) \
            if params.mg_stencil_dtype else None
        mg = MultigridPreconditioner(
            op, levels=params.mg_levels, smooth_iters=params.mg_smooth_iters,
            cycle_dtype=cycle_dtype, galerkin=params.mg_galerkin,
            cycle=params.mg_cycle, coarsen=params.mg_coarsen,
            stencil_dtype=stencil_dtype,
            refresh_iters=params.mg_refresh_iters,
        )
        if mg.n_levels > 1:
            return (mg.stateful_factory(), mg.init_power_vectors(),
                    mg.power_init, mg)
        if choice == "multigrid":
            print_warning(
                "multigrid requested but grid has no coarsenable levels; "
                "falling back to Jacobi"
            )
    if choice == "none":
        return ((lambda scale, mask, pvecs: ((lambda r: r), pvecs)), (),
                None, None)

    def jacobi_factory(scale, mask, pvecs):
        diag = op.diagonal(scale, mask)
        return (lambda r: r / diag), pvecs

    return jacobi_factory, (), None, None


@dataclass
class VoxelStep:
    """The compiled SIMP iteration and its companion state.

    `step(design, u_prev)` runs one full SIMP iteration (solve + sensitivities
    + filter + OC) and is jit/pjit-compilable; `solve(design)` is the final
    re-analysis.  Exposed for the driver, benchmarks, and the multichip dry
    run — all of which must exercise the exact same compiled pipeline.
    """

    grid: VoxelGrid
    op: VoxelOperator
    filt: Any
    step: Callable          # step(design, u_prev, pvecs, *step_args)
    step_solve: Callable    # step_solve(design, u_prev, pvecs, f_ext, mask)
    step_update: Callable   # step_update(design, phys, u, vsens)
    metrics: Callable
    solve: Callable         # solve(design, pvecs, *step_args)
    design0: jax.Array
    u0: jax.Array
    step_args: tuple        # (f_ext, free_mask, vol_sens) — passed as runtime
                            # buffers, NOT closures: closure arrays become
                            # XLA compile-time constants, which at 256^3 is
                            # ~500MB of HLO and overflows the compile service
    elem_vol: float
    total_volume: float
    dtype: Any
    use_density_filter: bool
    # Multigrid lambda_max power-iteration state, threaded through the step
    # (step appends the refreshed vectors as its LAST output).  pvecs0 is a
    # valid-but-unconverged hash start; power_init(design, f_ext, free_mask)
    # is the one-time cold estimation to run before the loop (None when the
    # preconditioner carries no state).
    pvecs0: tuple = ()
    power_init: Callable | None = None
    # Under a device mesh, node fields are stored PADDED to mesh-divisible
    # shapes (distributed storage); crop_node slices a padded node field back
    # to the exact (nnx, nny, nnz, 3) shape.  Identity when mesh is None.
    crop_node: Callable = staticmethod(lambda a: a)
    # element_energy(phys, u) -> 0.5 u_e^T K_e u_e field (handles both the
    # SIMP fast path and the variable-material branch)
    element_energy: Callable | None = None
    # Host-driven per-level cold power estimation (flake-robust TPU form);
    # None when the preconditioner carries no state or under a device mesh.
    power_init_split: Callable | None = None
    # OPTIONAL finer split of step_solve for the tunnel TPU (round 3):
    # step_precond(design, pvecs, free_mask) -> (phys, mg_state, new_pvecs)
    # runs the filter + per-iteration MG setup (stencil build / power
    # refresh / coarsest factorization) as its OWN program;
    # step_cg(design, phys, mg_state, u_prev, f_ext, free_mask) ->
    # (u, energy, volume, cg_iters, cg_res) runs the MG-CG solve on the
    # prebuilt state.  Together they equal step_solve (tested); None when
    # the preconditioner is stateless or under a device mesh.
    step_precond: Callable | None = None
    step_cg: Callable | None = None
    # PARTIAL setup program (params.mg_full_setup_every > 1):
    # step_precond_light(design, pvecs, free_mask, prev_state) ->
    # (phys, mg_state, new_pvecs) rebuilds only the fine half of the MG
    # state (level-0 diag/lambda + level-1 Galerkin stencil) and reuses
    # the deeper levels + coarsest Cholesky from prev_state (see
    # MultigridPreconditioner.setup_light).  None when the hierarchy is
    # too shallow / non-Galerkin / stateless.
    step_precond_light: Callable | None = None

    # field order returned by `step`.  The convergence/diagnostic reductions
    # live in the separate `metrics` program: compiling them into the same
    # program as the fused Pallas matvec deterministically faulted the TPU
    # at 128^3 (scoped-resource interaction); two dispatches cost ~nothing.
    # For the same reason the DRIVERS run the iteration as TWO programs —
    # `step_solve` (the Pallas/MG-CG forward solve) and `step_update`
    # (sensitivities + filter + OC): round-2 isolation showed the
    # solve+sens+OC composition in ONE program faults the TPU at 128^3
    # while each sub-composition runs clean (memory/tpu-env-gotchas.md).
    # `step` remains the single-program composition for CPU tests and the
    # sharded dryrun.
    STEP_OUTPUTS = (
        "new_design", "u", "phys", "energy", "volume", "lam",
        "cg_iters", "cg_residual", "bisect_iters", "bisect_verr", "fsens",
        "pvecs",
    )
    METRICS_OUTPUTS = (
        "change", "grayness", "max_disp",
        "frac_negative_sens", "mean_abs_sens", "max_abs_sens",
    )


def build_voxel_step(grid, loads, boundary_conditions,
                     params: OptimizationParameters, acceleration_data=None,
                     mesh=None) -> VoxelStep:
    """Construct the jit-compilable SIMP iteration for a voxel problem."""
    dtype = _resolve_dtype(params)
    elem_vol = grid.element_volume
    total_volume = grid.total_volume

    op = VoxelOperator(
        grid, E0=params.E0, Emin=params.Emin, nu=params.nu, p=params.p,
        dtype=dtype,
    )
    if params.use_pallas_matvec and jax.default_backend() == "tpu":
        from ..ops.pallas_kernels import install_fused_matvec

        install_fused_matvec(op)
    filt = create_filter_cache(grid, params.filter_radius, dtype=dtype)
    use_density_filter = params.filter_type == "density"

    free_mask = jnp.asarray(build_free_mask(grid, boundary_conditions),
                            dtype=dtype)
    f_ext = jnp.asarray(build_load_field(grid, loads), dtype=dtype)

    if acceleration_data is not None:
        accel_vec, base_density = acceleration_data

    # Volume sensitivities: geometry-only, chain-ruled ONCE for the density
    # filter (Optimization.jl:241-248).
    vol_sens_physical = jnp.full(grid.nels, elem_vol / total_volume,
                                 dtype=dtype)
    vol_sens = (filt.chain_rule(vol_sens_physical) if use_density_filter
                else vol_sens_physical)

    design0 = jnp.full(grid.nels, params.volume_fraction, dtype=dtype)
    u0_exact = jnp.zeros((*grid.nnodes_per_axis, 3), dtype=dtype)
    u0 = u0_exact
    if mesh is not None:
        from ..parallel.sharding import shard_voxel_state

        # Node fields are PADDED to mesh-divisible shapes and sharded
        # (distributed storage; see parallel/sharding.py node_sharding) —
        # the step wrappers below slice back to exact node shapes at entry
        # and re-pad their node outputs.
        (design0, vol_sens), (u0, free_mask, f_ext) = shard_voxel_state(
            mesh, cell_fields=(design0, vol_sens),
            node_fields=(u0, free_mask, f_ext),
        )

    precond_factory, pvecs0, mg_power_init, mg_obj = \
        _build_preconditioner(op, params)

    material_model = params.material_model
    # Equivalent-modulus field for the PRECONDITIONER under a custom
    # material: E_eff = 2(1+nu)*mu(rho) — exact when nu is density-
    # independent; for varying-nu models an SPD approximation (the
    # preconditioner only steers CG, the operator itself is exact).
    mu_unit = 1.0 / (2.0 * (1.0 + params.nu))

    def _precond_scale(phys):
        if material_model is None:
            return op.youngs_modulus(phys)
        _, mu_f = material_model(phys)
        return mu_f / mu_unit


    def forward(design, u_prev, pvecs, f_ext, free_mask, recycle=None,
                rtol=None):
        """Shared physics: filter -> loads -> solve -> energy/volume.

        rtol: optional per-iteration CG tolerance (device scalar) for the
        adaptive-forcing (inexact SIMP) mode; None = the static
        params.cg_rtol."""
        phys = filt.density_filter(design) if use_density_filter else design
        scale = _precond_scale(phys)
        f = f_ext
        if acceleration_data is not None:
            f = f + voxel_body_force(phys, accel_vec, base_density, elem_vol,
                                     dtype)
        f_bc = f * free_mask
        if material_model is None:
            A = lambda v: op.apply(v, scale, free_mask)
        else:
            lam_f, mu_f = material_model(phys)
            A = lambda v: op.apply_lame(v, lam_f, mu_f, free_mask)
        M, new_pvecs = precond_factory(scale, free_mask, pvecs)
        sol = cg_solve(A, f_bc, x0=u_prev * free_mask, M=M,
                       rtol=params.cg_rtol if rtol is None else rtol,
                       maxiter=params.cg_maxiter,
                       deflate=recycle_deflate(free_mask, recycle))
        # 0.5 u^T K u without an extra matvec: K u = f - r at the CG exit.
        energy = 0.5 * (jnp.vdot(sol.u, f_bc) - sol.u_dot_r)
        volume = jnp.sum(phys) * elem_vol
        return phys, sol, energy, volume, new_pvecs

    def power_init(design, free_mask):
        """One-time cold lambda_max estimation on the initial design."""
        phys = filt.density_filter(design) if use_density_filter else design
        return mg_power_init(_precond_scale(phys), free_mask)

    def power_init_split(design, free_mask):
        """power_init as a host-driven sequence of SMALL device programs —
        the flake-robust form for the tunnel TPU (see
        MultigridPreconditioner.power_init_split).  Meshless path only (the
        driver uses the one-program form under a device mesh, where the
        virtual-CPU devices have no flake)."""
        scale = jax.jit(
            lambda d: _precond_scale(
                filt.density_filter(d) if use_density_filter else d))(design)
        jax.block_until_ready(scale)
        return mg_obj.power_init_split(scale, free_mask)

    def step_solve(design, u_prev, pvecs, f_ext, free_mask, recycle=None,
                   rtol=None):
        """Program 1 of the iteration: filter -> MG-CG solve (Pallas)."""
        phys, sol, energy, volume, new_pvecs = forward(
            design, u_prev, pvecs, f_ext, free_mask, recycle=recycle,
            rtol=rtol)
        return (phys, sol.u, energy, volume, sol.iterations,
                sol.residual_norm, new_pvecs)

    def step_update(design, phys, u, vsens):
        """Program 2: sensitivities -> filter -> OC design update."""
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

        # volume_weights = H^T V = total_volume * vsens for BOTH filter types
        # (vsens is chain-ruled once for the density filter,
        # Optimization.jl:241-248) — replaces the reference's
        # filter-in-bisection with a dot product (see ops/oc.py).
        new_design, lam, bisect_iters, bisect_verr = oc_update(
            design, fsens, vsens, params.volume_fraction, total_volume,
            elem_vol, params.move_limit, params.damping,
            volume_weights=vsens * total_volume,
        )
        return new_design, lam, bisect_iters, bisect_verr, fsens

    def step(design, u_prev, pvecs, f_ext, free_mask, vsens,
             # def-time binding: under a device mesh the module-level names
             # are rebound to pad/crop WRAPPERS below; the one-program
             # composition must keep calling the exact-shape inner parts.
             _solve=step_solve, _update=step_update):
        (phys, u, energy, volume, cg_iters, cg_res, new_pvecs) = _solve(
            design, u_prev, pvecs, f_ext, free_mask)
        new_design, lam, bisect_iters, bisect_verr, fsens = _update(
            design, phys, u, vsens)
        return (new_design, u, phys, energy, volume, lam, cg_iters,
                cg_res, bisect_iters, bisect_verr, fsens,
                new_pvecs)

    def step_precond(design, pvecs, free_mask):
        """Program 1a of the OPTIONAL three-program iteration (round-3 TPU
        fault mitigation): filter + per-SIMP-iteration preconditioner setup
        — Galerkin stencil build (im2col conv + axis RAPs), power refresh,
        coarsest dense factorization.  Isolating these op classes from the
        Pallas/CG program follows the program-splitting pattern that fixed
        the round-2 OC composition fault and the round-3 cold power_init
        flake (memory/tpu-env-gotchas.md)."""
        phys = filt.density_filter(design) if use_density_filter else design
        scale = _precond_scale(phys)
        state, new_pvecs = mg_obj.setup(scale, free_mask, pvecs)
        return phys, state, new_pvecs

    def step_precond_light(design, pvecs, free_mask, prev_state):
        """Program 1a-LIGHT (params.mg_full_setup_every > 1): filter +
        PARTIAL preconditioner refresh — fresh level-0 diag/lambda +
        level-1 Galerkin stencil, deeper levels and the coarsest Cholesky
        reused from `prev_state` (MultigridPreconditioner.setup_light)."""
        # cho_factor's static `lower` flag crossed the program boundary
        # as an array; rebuild the literal (same dance as step_cg)
        cho, dinv_sqrt = prev_state["cho"]
        prev_state = dict(prev_state, cho=((cho[0], False), dinv_sqrt))
        phys = filt.density_filter(design) if use_density_filter else design
        scale = _precond_scale(phys)
        state, new_pvecs = mg_obj.setup_light(scale, free_mask, pvecs,
                                              prev_state)
        return phys, state, new_pvecs

    def step_cg(design, phys, state, u_prev, f_ext, free_mask, recycle=None,
                rtol=None):
        """Program 1b: the MG-CG solve on a prebuilt preconditioner state
        (from step_precond).  step_precond + step_cg == step_solve up to
        XLA fusion-boundary rounding (tests/test_optimize.py)."""
        # cho_factor's static `lower` flag crossed the program boundary as
        # an array; rebuild it as the literal it always is (upper=False).
        cho, dinv_sqrt = state["cho"]
        state = dict(state, cho=((cho[0], False), dinv_sqrt))
        scale = _precond_scale(phys)
        f = f_ext
        if acceleration_data is not None:
            f = f + voxel_body_force(phys, accel_vec, base_density,
                                     elem_vol, dtype)
        f_bc = f * free_mask
        if material_model is None:
            A = lambda v: op.apply(v, scale, free_mask)
        else:
            lam_f, mu_f = material_model(phys)
            A = lambda v: op.apply_lame(v, lam_f, mu_f, free_mask)
        M = mg_obj._make_M(state)
        sol = cg_solve(A, f_bc, x0=u_prev * free_mask, M=M,
                       rtol=params.cg_rtol if rtol is None else rtol,
                       maxiter=params.cg_maxiter,
                       deflate=recycle_deflate(free_mask, recycle))
        energy = 0.5 * (jnp.vdot(sol.u, f_bc) - sol.u_dot_r)
        volume = jnp.sum(phys) * elem_vol
        return sol.u, energy, volume, sol.iterations, sol.residual_norm

    def metrics(new_design, design, phys, u, fsens):
        """Convergence + diagnostic reductions (own program, see above)."""
        change = jnp.max(jnp.abs(new_design - design))
        grayness = jnp.mean(
            jnp.logical_and(phys > 0.1, phys < 0.9).astype(dtype))
        max_disp = jnp.max(jnp.abs(u))
        frac_neg, mean_abs, max_abs = sensitivity_health(fsens)
        return change, grayness, max_disp, frac_neg, mean_abs, max_abs

    def solve_only(design, pvecs, f_ext, free_mask, vsens):
        """Final analysis (Optimization.jl:494-539): re-filter + re-solve."""
        phys, sol, energy, _, _ = forward(design, jnp.zeros_like(u0_exact),
                                          pvecs, f_ext, free_mask)
        return phys, sol.u, energy

    def element_energy(phys, u):
        """0.5 * u_e^T K_e u_e element field (PostProcessing.jl:172-197)."""
        if material_model is None:
            return 0.5 * op.youngs_modulus(phys) * op.element_energies_unit(u)
        lam_f, mu_f = material_model(phys)
        wl, wm = op.element_energies_lame(u)
        return 0.5 * (lam_f * wl + mu_f * wm)

    crop_node = lambda a: a
    if mesh is not None:
        from ..parallel.sharding import node_padded_shape, node_sharding

        nnx, nny, nnz = grid.nnodes_per_axis
        pshape = node_padded_shape(mesh, grid.nnodes_per_axis)
        nsh = node_sharding(mesh)

        def _crop(a):
            return a[:nnx, :nny, :nnz]

        def _pad(a):
            out = jnp.pad(a, [(0, p - s) for p, s in
                              zip(pshape, (nnx, nny, nnz))] + [(0, 0)])
            # keep the at-rest layout distributed across iterations (the
            # constraint stops GSPMD from all-gathering the step outputs)
            return jax.lax.with_sharding_constraint(out, nsh)

        crop_node = _crop
        in_solve, in_update, in_step = step_solve, step_update, step
        in_metrics, in_solve_only, in_power = metrics, solve_only, power_init

        def step_solve(design, u_prev, pvecs, f_ext, free_mask,
                       recycle=None, rtol=None):
            # recycle rides in PADDED node shape (like u_prev); crop each
            # ring-buffer slot for the exact-shape inner solve.
            if recycle is not None:
                recycle = jnp.stack([_crop(recycle[i])
                                     for i in range(recycle.shape[0])])
            o = in_solve(design, _crop(u_prev), pvecs, _crop(f_ext),
                         _crop(free_mask), recycle=recycle, rtol=rtol)
            return (o[0], _pad(o[1]), *o[2:])

        def step_update(design, phys, u, vsens):
            return in_update(design, phys, _crop(u), vsens)

        def step(design, u_prev, pvecs, f_ext, free_mask, vsens):
            o = in_step(design, _crop(u_prev), pvecs, _crop(f_ext),
                        _crop(free_mask), vsens)
            return (o[0], _pad(o[1]), *o[2:])

        def metrics(new_design, design, phys, u, fsens):
            return in_metrics(new_design, design, phys, _crop(u), fsens)

        def solve_only(design, pvecs, f_ext, free_mask, vsens):
            o = in_solve_only(design, pvecs, _crop(f_ext), _crop(free_mask),
                              vsens)
            return (o[0], _pad(o[1]), *o[2:])

        def power_init(design, free_mask):
            return in_power(design, _crop(free_mask))

    return VoxelStep(
        grid=grid, op=op, filt=filt, step=step, step_solve=step_solve,
        step_update=step_update, metrics=metrics,
        solve=solve_only, design0=design0, u0=u0,
        step_args=(f_ext, free_mask, vol_sens), elem_vol=elem_vol,
        total_volume=total_volume, dtype=dtype,
        use_density_filter=use_density_filter, pvecs0=pvecs0,
        power_init=power_init if mg_power_init is not None else None,
        crop_node=crop_node, element_energy=element_energy,
        power_init_split=(power_init_split
                          if mg_obj is not None and mesh is None else None),
        step_precond=(step_precond
                      if mg_obj is not None and mesh is None else None),
        step_cg=step_cg if mg_obj is not None and mesh is None else None,
        step_precond_light=(step_precond_light
                            if mg_obj is not None and mesh is None
                            and mg_obj.supports_light_setup else None),
    )


def simp_optimize(grid, loads, boundary_conditions,
                  params: OptimizationParameters, acceleration_data=None,
                  mesh=None, resume_from=None) -> OptimizationResult:
    """Run SIMP topology optimization.

    Args:
      grid: VoxelGrid (structured path) or UnstructuredMesh.
      loads: list of PointLoad / SurfaceTractionLoad.
      boundary_conditions: list of DirichletBC.
      params: OptimizationParameters.
      acceleration_data: optional (acceleration_vector, base_density) for
        variable-density body forces (Optimization.jl:195-198, 301-311).
      mesh: optional jax.sharding.Mesh.  Voxel grids take an ("x","y","z")
        mesh (parallel.sharding.make_mesh) — spatial domain decomposition
        with XLA/GSPMD-inserted ICI halo exchanges and psum reductions,
        node fields stored padded + distributed.  UnstructuredMesh input
        takes a 1-axis ("e",) mesh (parallel.sharding.make_element_mesh) —
        element-parallel decomposition.  Axis names are validated up front.
      resume_from: optional checkpoint path (see opt/checkpoint.py) —
        restores design/displacements/iteration/histories and continues.
    """
    if not isinstance(grid, VoxelGrid):
        if mesh is not None and tuple(mesh.axis_names) != ("e",):
            raise ValueError(
                f"unstructured meshes need a 1-axis ('e',) element device "
                f"mesh (parallel.sharding.make_element_mesh), got axes "
                f"{tuple(mesh.axis_names)}")
        from .optimize_unstructured import simp_optimize_unstructured

        return simp_optimize_unstructured(
            grid, loads, boundary_conditions, params, acceleration_data,
            resume_from=resume_from, device_mesh=mesh,
        )
    if mesh is not None and tuple(mesh.axis_names) != ("x", "y", "z"):
        raise ValueError(
            f"voxel grids need an ('x','y','z') device mesh "
            f"(parallel.sharding.make_mesh), got axes "
            f"{tuple(mesh.axis_names)}")

    print_info("Starting SIMP topology optimization (voxel path)")

    logger = None
    if params.export_path:
        from .logger import OptimizationLogger

        logger = OptimizationLogger(params.export_path, params.task_name)

    if acceleration_data is not None:
        print_info(
            f"Variable density acceleration enabled: {acceleration_data[0]}")
    print_data(f"Total mesh volume: {grid.total_volume}")

    vs = build_voxel_step(grid, loads, boundary_conditions, params,
                          acceleration_data, mesh)
    # Coarse-to-fine continuation (params.continuation_levels): replace the
    # uniform initial design with the prolonged result of a half-resolution
    # run of the same problem (opt/continuation.py).  Resuming a checkpoint
    # supersedes it — the checkpointed state is already developed.
    continuation_state = None
    if params.continuation_levels > 0 and not resume_from:
        from .continuation import continuation_init

        continuation_state = continuation_init(
            grid, loads, boundary_conditions, params, acceleration_data)
    # Two programs per iteration (see VoxelStep docstring: the one-program
    # composition faults the TPU next to the fused Pallas kernels).
    solve_part_jit = jax.jit(vs.step_solve)
    update_part_jit = jax.jit(vs.step_update)
    # On the real TPU, split the solve further into precond-setup | MG-CG
    # when the builder provides it: the Galerkin stencil build compiled
    # into the SAME program as the Pallas MG-CG faults the tunnel TPU on
    # essentially every first execution, while each half runs clean solo
    # (round-3 isolation; memory/tpu-env-gotchas.md).  CPU keeps the
    # two-program form, whose equivalence to the split is tested
    # (tests/test_optimize.py::test_step_precond_cg_split_matches_step_solve).
    use_split3 = (vs.step_precond is not None
                  and (jax.default_backend() == "tpu"
                       or params.mg_setup_every > 1
                       or params.mg_full_setup_every > 1))
    if use_split3:
        precond_jit = jax.jit(vs.step_precond)
        cg_jit = jax.jit(vs.step_cg)
        precond_light_jit = (jax.jit(vs.step_precond_light)
                             if vs.step_precond_light is not None
                             and params.mg_full_setup_every > 1 else None)
        phys_jit = (jax.jit(vs.filt.density_filter)
                    if vs.use_density_filter else None)
        mg_state = None
        last_setup_it = 0
        last_full_it = 0
        cg_baseline = None        # CG count of the first post-FULL-setup solve
        cg_since_refresh = None   # CG count of the most recent solve
    metrics_jit = jax.jit(vs.metrics)
    solve_jit = jax.jit(vs.solve)
    op, total_volume, elem_vol = vs.op, vs.total_volume, vs.elem_vol

    design, u = vs.design0, vs.u0
    if continuation_state is not None:
        design, u = continuation_state
        design = jnp.asarray(design, dtype=vs.dtype)
        u = jnp.asarray(u, dtype=vs.dtype)
        if mesh is not None:
            from ..parallel.sharding import shard_voxel_state

            (design,), (u,) = shard_voxel_state(
                mesh, cell_fields=(design,), node_fields=(u,))
    pvecs = vs.pvecs0
    # Subspace-recycled CG (params.cg_recycle_k): ring buffer of the last k
    # solutions, whose deltas deflate the warm-start residual (ops/cg.py).
    # Under a device mesh the buffer rides in the PADDED node shape like u
    # (the step wrapper crops each slot); the deflation Gram matmuls become
    # sharded reductions under GSPMD.
    recycle_k = params.cg_recycle_k
    rhist = None
    push_jit = None
    recycle_dtype = (jnp.dtype(params.cg_recycle_dtype)
                     if params.cg_recycle_dtype else None)
    if recycle_k > 1:
        rhist = recycle_init(recycle_k, u, dtype=recycle_dtype)
        push_jit = jax.jit(recycle_push)
    # Adaptive CG forcing (inexact SIMP, params.cg_forcing): the solve only
    # feeds sensitivities into a move-limited OC update, so its tolerance is
    # tied to how fast the design still moves.  The rtol enters the compiled
    # step as a DEVICE SCALAR — values change per iteration, the program
    # does not.
    if params.cg_forcing not in ("fixed", "adaptive"):
        raise ValueError(f"cg_forcing must be 'fixed' or 'adaptive', "
                         f"got {params.cg_forcing!r}")
    adaptive_forcing = params.cg_forcing == "adaptive"

    def _forcing_rtol(change_prev):
        val = params.cg_rtol_max if change_prev is None else min(
            params.cg_rtol_max,
            max(params.cg_rtol, params.cg_forcing_coeff * change_prev))
        return jnp.asarray(val, dtype=vs.dtype)

    rtol_now = _forcing_rtol(None) if adaptive_forcing else None
    energy_history: list[float] = []
    volume_history: list[float] = []
    change_history: list[float] = []
    cg_history: list[int] = []
    checkpoint_triggered = [False] * len(params.tolerance_checkpoints)
    start_iteration = 1
    resumed_pvecs = False
    if resume_from:
        from .checkpoint import load_checkpoint, restore_triggered

        state = load_checkpoint(resume_from)
        design = jnp.asarray(state["design"], dtype=vs.dtype)
        u = jnp.asarray(state["u"], dtype=vs.dtype)
        if mesh is not None:
            # checkpoints store exact node shapes; re-pad + re-shard
            from ..parallel.sharding import shard_voxel_state

            (design,), (u,) = shard_voxel_state(
                mesh, cell_fields=(design,), node_fields=(u,))
        start_iteration = state["iteration"] + 1
        energy_history = state["energy_history"]
        volume_history = state["volume_history"]
        change_history = state["change_history"]
        cg_history = state["cg_history"]
        checkpoint_triggered = restore_triggered(
            state["checkpoint_triggered"], params.tolerance_checkpoints)
        saved_pvecs = state.get("pvecs") or []
        if len(saved_pvecs) == len(pvecs) and all(
                v.shape == p.shape for v, p in zip(saved_pvecs, pvecs)):
            pvecs = tuple(jnp.asarray(v, dtype=vs.dtype)
                          for v in saved_pvecs)
            resumed_pvecs = True
        saved_rec = state.get("recycle")
        if rhist is not None:
            if saved_rec is not None and \
                    saved_rec.shape[0] == recycle_k:
                slots = [jnp.asarray(saved_rec[i], dtype=vs.dtype)
                         for i in range(recycle_k)]
                if mesh is not None:
                    from ..parallel.sharding import shard_voxel_state

                    _, slots = shard_voxel_state(
                        mesh, cell_fields=(), node_fields=tuple(slots))
                rhist = jnp.stack(list(slots)).astype(
                    recycle_dtype or vs.dtype)
            else:
                # checkpoint predates recycling (or different k): seed the
                # buffer with the restored warm start.
                rhist = recycle_init(recycle_k, u, dtype=recycle_dtype)
    if adaptive_forcing and change_history:
        # resumed runs restart the forcing schedule from the restored change
        rtol_now = _forcing_rtol(change_history[-1])
    if params.tolerance_checkpoints:
        print_info(
            f"Tolerance checkpoints enabled: {params.tolerance_checkpoints}")

    if vs.power_init is not None and not resumed_pvecs:
        # One-time cold lambda_max estimation (full power iteration); the
        # step then only REFRESHES the carried vectors (see ops/multigrid.py).
        # On the real TPU the estimation runs as per-level programs — the
        # all-levels one-shot is the most fault-prone program class on the
        # tunnel (memory/tpu-env-gotchas.md).
        if vs.power_init_split is not None and \
                jax.default_backend() == "tpu":
            pvecs = vs.power_init_split(design, vs.step_args[1])
        else:
            pvecs = jax.jit(vs.power_init)(design, vs.step_args[1])
        jax.block_until_ready(pvecs)  # drain before loading the next program

    converged = False
    iteration = start_iteration - 1
    warned_health = False
    warned_bisection = False

    def _maybe_save_checkpoint(it, design, u, pvecs):
        if params.checkpoint_interval > 0 and params.checkpoint_path and \
                it % params.checkpoint_interval == 0:
            from .checkpoint import save_checkpoint

            save_checkpoint(
                params.checkpoint_path,
                design=np.asarray(design), u=np.asarray(vs.crop_node(u)),
                iteration=it,
                energy_history=energy_history, volume_history=volume_history,
                change_history=change_history, cg_history=cg_history,
                checkpoint_triggered=checkpoint_triggered,
                pvecs=[np.asarray(v) for v in pvecs],
                recycle=(np.stack([np.asarray(vs.crop_node(rhist[i]))
                                   for i in range(recycle_k)])
                         if rhist is not None else None),
            )

    profile_ctx = None
    for it in range(start_iteration, params.max_iterations + 1):
        iteration = it
        if params.profile_dir and it == 2:
            import jax.profiler as _profiler

            profile_ctx = _profiler.trace(params.profile_dir)
            profile_ctx.__enter__()
        f_ext_arg, free_mask_arg, vsens_arg = vs.step_args
        if use_split3:
            # Refresh the preconditioner state every mg_setup_every
            # iterations; between refreshes the (stale) M is reused while
            # CG still applies the CURRENT operator (see params.py).
            # Adaptive guard: early iterations move the design at the full
            # move limit, where even a 3-iteration-stale M costs multiples
            # in CG (measured 21 -> 191 on a small cantilever) — refresh
            # immediately whenever the last solve degraded >1.5x from its
            # post-refresh baseline, so the cadence only skips work while
            # the design (hence K) is actually quasi-static.
            stale_steps = it - last_setup_it if mg_state is not None else 0
            # additive slack matters at adaptive-forcing CG counts of ~2,
            # where 1.5x alone would refresh on a single extra iteration
            degraded = (cg_since_refresh is not None and cg_baseline
                        and cg_since_refresh > max(1.5 * cg_baseline,
                                                   cg_baseline + 3))
            if mg_state is None or stale_steps >= params.mg_setup_every \
                    or degraded:
                # Partial-refresh cadence (mg_full_setup_every): between
                # full setups, refresh only the fine half and reuse the
                # deep levels + coarsest Cholesky; any degradation (or
                # the cadence expiring) forces a FULL rebuild.  The
                # watchdog baseline is pinned to the last FULL setup —
                # a light refresh changes M too, but against the stale
                # deep levels, which is exactly the drift to watch.
                use_light = (precond_light_jit is not None
                             and mg_state is not None and not degraded
                             and (it - last_full_it)
                             < params.mg_full_setup_every)
                if use_light:
                    phys, mg_state, pvecs = precond_light_jit(
                        design, pvecs, free_mask_arg, mg_state)
                else:
                    phys, mg_state, pvecs = precond_jit(design, pvecs,
                                                        free_mask_arg)
                    last_full_it = it
                    cg_baseline = None
                last_setup_it = it
            else:
                phys = phys_jit(design) if phys_jit is not None else design
            if it == start_iteration:
                jax.block_until_ready(pvecs)
            solve_kw = {}
            if rhist is not None:
                solve_kw["recycle"] = rhist
            if adaptive_forcing:
                solve_kw["rtol"] = rtol_now
            (u_new, energy, volume, cg_iters, cg_res) = cg_jit(
                design, phys, mg_state, u, f_ext_arg, free_mask_arg,
                **solve_kw)
            # cg_since_refresh / cg_baseline for the stale-M guard are read
            # at the END of the iteration (with the mandatory logging syncs)
            # instead of here: an int(cg_iters) at this point would stall
            # the update-program dispatch on the full CG solve — the only
            # avoidable mid-iteration host round-trip (VERDICT r3 item 9).
        else:
            solve_kw = {}
            if rhist is not None:
                solve_kw["recycle"] = rhist
            if adaptive_forcing:
                solve_kw["rtol"] = rtol_now
            (phys, u_new, energy, volume, cg_iters, cg_res, pvecs) = \
                solve_part_jit(design, u, pvecs, f_ext_arg, free_mask_arg,
                               **solve_kw)
        if rhist is not None:
            rhist = push_jit(rhist, u_new)
        if it == start_iteration:
            # First iteration: drain the solve program before compiling/
            # loading the update program — program load overlapping a long
            # first execution is the suspected trigger of the per-process
            # "TPU device error" flake (see CLAUDE.md lore).
            jax.block_until_ready(u_new)
        (new_design, lam, bisect_iters, bisect_verr, fsens) = \
            update_part_jit(design, phys, u_new, vsens_arg)
        (change, grayness, max_disp, frac_neg, mean_abs, max_abs) = \
            metrics_jit(new_design, design, phys, u_new, fsens)
        u = u_new
        if profile_ctx is not None and it >= 4:
            jax.block_until_ready(u)
            profile_ctx.__exit__(None, None, None)
            profile_ctx = None
            print_info(f"Profiler trace written to {params.profile_dir}")

        energy = float(energy)
        volume = float(volume)
        change = float(change)
        if adaptive_forcing:
            rtol_now = _forcing_rtol(change)
        vol_frac = volume / total_volume
        energy_history.append(energy)
        volume_history.append(volume)
        change_history.append(change)
        cg_history.append(int(cg_iters))
        if use_split3:
            cg_since_refresh = cg_history[-1]
            if cg_baseline is None:
                cg_baseline = cg_since_refresh

        # Sensitivity health warnings (check_sensitivity_health semantics,
        # OptimalityCriteria.jl:19-40) — warn once, not every iteration.
        # The range check is median-centered like the reference: the median
        # comes from a host-side subsample every few iterations (device-side
        # sorts fault the TPU next to the fused kernel, see ops/oc.py).
        if not warned_health and (it == start_iteration or it % 10 == 0):
            warned_health = _warn_sensitivity_health(
                float(frac_neg), float(max_abs), fsens)

        # OC bisection non-convergence warning, gated EXACTLY like the
        # reference: only when all 200 bisection iterations exhaust without
        # meeting the tolerance (OptimalityCriteria.jl:139-142).  Interval
        # collapse before 200 — the usual fp32 exit at multi-million-cell
        # grids, where the 1e-6 ABSOLUTE tolerance sits below the rounding
        # of the volume reduction itself — produces the same densities the
        # reference would after idling to 200, and stays silent like the
        # tolerance-met exit.  (Still warn-once, deviation 4.)
        if not warned_bisection and int(bisect_iters) >= MAX_BISECTION \
                and abs(float(bisect_verr)) >= 1e-6:
            print_warning(
                f"OC bisection did not converge after {int(bisect_iters)} "
                f"iterations (|volume error| = {abs(float(bisect_verr)):.3e})"
            )
            warned_bisection = True

        if logger is not None:
            logger.log_iteration(
                it, energy, vol_frac, change, float(lam), float(grayness),
                float(max_disp),
            )

        print(
            f"Iter {it:4d} | Energy: {energy:.4e} | Vol.Frac: {vol_frac:.4f} "
            f"| Change: {change:.4e} | CG: {int(cg_iters):4d}"
        )

        # Tolerance checkpoints (Optimization.jl:407-445)
        if params.tolerance_checkpoints and params.export_path:
            for idx, cp in enumerate(params.tolerance_checkpoints):
                if not checkpoint_triggered[idx] and change < cp:
                    checkpoint_triggered[idx] = True
                    print_info(
                        f"Tolerance checkpoint {cp} reached at iteration {it}")
                    _export_intermediate(
                        vs, params, phys, vs.crop_node(u), energy,
                        volume, it, energy_history, volume_history,
                        name=f"final_results_{int(round(cp * 100)):02d}tol",
                    )

        # Periodic interval export (Optimization.jl:448-477)
        if (params.export_interval > 0
                and it % params.export_interval == 0
                and params.export_path):
            _export_intermediate(
                vs, params, phys, vs.crop_node(u), energy, volume, it,
                energy_history, volume_history, name=f"iter_{it:04d}",
            )

        design = new_design
        _maybe_save_checkpoint(it, design, u, pvecs)
        if change < params.tolerance:
            print_success(f"Converged after {it} iterations")
            converged = True
            break

    if profile_ctx is not None:  # max_iterations < 4
        profile_ctx.__exit__(None, None, None)

    # ----- final analysis (Optimization.jl:494-539) -----------------------------
    phys, u, final_energy = solve_jit(design, pvecs, *vs.step_args)
    u = vs.crop_node(u)
    final_energy = float(final_energy)
    final_volume = float(jnp.sum(phys)) * elem_vol

    from ..stress import voxel_stresses

    stresses = voxel_stresses(
        grid, u, phys, params.E0, params.Emin, params.nu, params.p,
        material_model=params.material_model,
    )
    print_data(
        f"Maximum von Mises stress: {stresses.max_von_mises} "
        f"at cell {stresses.max_vm_cell}"
    )
    # 0.5 * integral(sigma:eps) per cell == 0.5 * u_e^T K_e u_e
    # (PostProcessing.jl:172-197)
    elem_energies = grid.cells_flat(
        np.asarray(vs.element_energy(phys, u), dtype=np.float64))

    if logger is not None:
        logger.write_summary(final_energy, final_volume, converged)
        logger.close()

    print_success("Optimization completed")
    print_data(f"Final energy: {final_energy}")
    print_data(f"Final volume fraction: {final_volume / total_volume}")

    phys_np = np.asarray(phys, dtype=np.float64)
    return OptimizationResult(
        densities=grid.cells_flat(phys_np),
        displacements=grid.dofs_flat(np.asarray(u, dtype=np.float64)),
        stresses=stresses,
        energy=final_energy,
        volume=final_volume,
        iterations=iteration,
        converged=converged,
        energy_history=energy_history,
        volume_history=volume_history,
        densities_3d=phys_np,
        cg_iterations_history=cg_history,
        change_history=change_history,
        element_energies=elem_energies,
    )


def _export_intermediate(vs, params, phys, u, energy, volume, iteration,
                         energy_history, volume_history, name):
    """Stress recovery + VTU export for checkpoints/interval dumps."""
    import os

    from ..post.vtu import create_results_data, export_main_results
    from ..stress import voxel_stresses

    grid = vs.grid
    stresses = voxel_stresses(
        grid, u, phys, params.E0, params.Emin, params.nu, params.p,
        material_model=params.material_model,
    )
    elem_energies = grid.cells_flat(
        np.asarray(vs.element_energy(phys, u), dtype=np.float64))
    phys_np = np.asarray(phys, dtype=np.float64)
    interim = OptimizationResult(
        densities=grid.cells_flat(phys_np),
        displacements=grid.dofs_flat(np.asarray(u, dtype=np.float64)),
        stresses=stresses,
        energy=float(energy),
        volume=float(volume),
        iterations=iteration,
        converged=False,
        energy_history=list(energy_history),
        volume_history=list(volume_history),
        densities_3d=phys_np,
        element_energies=elem_energies,
    )
    data = create_results_data(grid, interim)
    export_main_results(data, os.path.join(params.export_path, name))
    print_success(f"Exported: {name}.vtu")
