"""Optimization parameters and result containers.

Field-for-field parity with the reference's `OptimizationParameters` and
`OptimizationResult` (src/Optimization/Optimization.jl:53-155), plus the
TPU-specific solver knobs (dtype, CG tolerance, preconditioner choice) that
replace the implicit CHOLMOD configuration.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = ["OptimizationParameters", "OptimizationResult"]


@dataclass
class OptimizationParameters:
    """SIMP optimization parameters (defaults match Optimization.jl:86-103)."""

    # Material
    E0: float = 1.0
    Emin: float = 1e-9
    nu: float = 0.3
    p: float = 3.0

    # Optimization
    volume_fraction: float = 0.5
    max_iterations: int = 200
    tolerance: float = 0.01

    # Filter
    filter_radius: float = 1.5          # x characteristic element size
    filter_type: str = "sensitivity"    # "sensitivity" | "density"

    # OC
    move_limit: float = 0.2
    damping: float = 0.5

    # Performance (reference: element-cache toggle; here: solver config)
    use_cache: bool = True              # kept for API parity; always cached

    # Variable-material interpolation (the reference's use_cache=false /
    # `assemble_variable_material!` branch, FiniteElementAnalysis.jl:719-743):
    # a jnp-traceable ELEMENTWISE map rho -> (lam, mu) — e.g. the closure
    # from create_simp_material_model, or a RAMP/varying-nu law.  None (the
    # default) uses the SIMP power law with the unit-ke scaling fast path.
    # When set, the voxel operator contracts two constant Lamé-basis kes
    # against the (lam(rho), mu(rho)) fields, and sensitivities come from
    # the exact material derivative via jax.jvp (BETTER than the reference,
    # whose sensitivity analysis hardcodes the SIMP law even on this branch).
    material_model: object = None

    # Intermediate export
    export_interval: int = 0
    export_path: str = ""
    task_name: str = "SIMP_Optimization"
    tolerance_checkpoints: list[float] = field(default_factory=list)

    # --- TPU-native solver knobs (no reference analogue: CHOLMOD was exact) ---
    dtype: str = "auto"                 # "auto" | "float32" | "float64"
    cg_rtol: float = 1e-8               # relative residual for the CG solve
    cg_maxiter: int = 20000
    cg_recycle_k: int = 0               # subspace-recycled CG: keep the last
                                        # k solutions in a ring buffer and
                                        # Galerkin-project the warm-start
                                        # residual over their deltas before
                                        # iterating (ops/cg.py `deflate`).
                                        # Costs k-1 operator applies +
                                        # k node fields of memory per
                                        # iteration; deflates the low modes
                                        # the design evolution re-excites.
                                        # 0 = off (reference-equivalent)
    cg_recycle_dtype: str = ""          # STORAGE dtype of the recycle ring
                                        # ("bfloat16" halves its HBM: k
                                        # node fields, 4.7 GB fp32 at
                                        # 256^3 k=8).  Deflation math
                                        # upcasts; "" = operator dtype
    cg_forcing: str = "fixed"           # "fixed" | "adaptive" (inexact SIMP).
                                        # Adaptive ties the per-iteration CG
                                        # tolerance to how fast the design is
                                        # still moving:
                                        #   rtol_i = clip(coeff * change_{i-1},
                                        #                 cg_rtol, cg_rtol_max)
                                        # (first iteration uses cg_rtol_max).
                                        # The solve only feeds sensitivities
                                        # into an OC update clamped by the
                                        # move limit, so early/developing
                                        # iterations tolerate much looser
                                        # solves; the floor cg_rtol restores
                                        # the tight solve as the design
                                        # converges (change -> tolerance).
                                        # The rtol rides into the compiled
                                        # step as a device scalar — no
                                        # per-iteration recompiles.
    cg_rtol_max: float = 1e-3           # loosest adaptive tolerance
    cg_forcing_coeff: float = 0.05      # rtol_i = coeff * change_{i-1}
    preconditioner: str = "auto"        # auto|jacobi|block_jacobi|amg|multigrid|none
    amg_max_coarse_dofs: int = 6000     # unstructured AMG: recurse the
                                        # aggregation until the coarsest
                                        # (dense-factorized) level fits
                                        # this many dofs
    amg_smooth_prolongator: bool = False  # smoothed-aggregation transfers
                                        # P_s = (I - 4/3 B^-1 A) P_t,
                                        # rebuilt on device per iteration;
                                        # flatter CG growth with mesh size
                                        # on slender high-contrast fields
                                        # at ~K^2 setup-assembly cost
    mg_levels: int = 0                  # 0 = auto depth
    mg_smooth_iters: object = (1, 3)    # Chebyshev degree / Jacobi sweeps;
                                        # int, or a per-level sequence like
                                        # the default (1, 3) = degree 1 on
                                        # the fine level, 3 on coarse levels
                                        # (last entry repeats downward) —
                                        # W-cycle-like robustness at V-cycle
                                        # graph size
    mg_cycle_dtype: str = ""            # "" = operator dtype; "bfloat16" runs
                                        # the V-cycle interior in bf16
    mg_stencil_dtype: str = ""          # STORAGE dtype for the Galerkin
                                        # stencil coefficient fields (243
                                        # scalar fields, 267 MB fp32 at 128^3
                                        # level 1 — the dominant coarse-side
                                        # HBM traffic).  "bfloat16" halves
                                        # that read traffic while smoother
                                        # arithmetic stays in the cycle dtype
                                        # (in-register upcast); setup
                                        # (diagonals, power refresh, coarsest
                                        # Cholesky) always uses full precision
    mg_galerkin: bool = True            # variational P^T A P coarse stencils
                                        # (contrast-robust); False = round-1/2
                                        # rediscretized mean-modulus coarsening
    mg_coarsen: str = "arithmetic"      # modulus coarsening rule for the
                                        # REDISCRETIZED levels (galerkin=
                                        # False): "arithmetic" | "harmonic" |
                                        # "mixed" (mean of both).  Measured
                                        # (scripts/mg_contrast_study, 48x24x24
                                        # x50 iters): harmonic STALLS CG at
                                        # SIMP contrast (coarse moduli ~Emin
                                        # make the coarse correction vanish),
                                        # mixed is ~20% WORSE than arithmetic
                                        # — keep arithmetic; the real fix is
                                        # mg_galerkin=True (default)
    mg_refresh_iters: int = 2           # power-iteration refreshes of the
                                        # carried lambda_max state per SIMP
                                        # iteration (ops/multigrid.py setup);
                                        # 1 halves the refresh cost (~10 ms
                                        # at 128^3) against slightly staler
                                        # Chebyshev bounds (1.1 headroom
                                        # absorbs the drift)
    mg_setup_every: int = 1             # rebuild the multigrid preconditioner
                                        # state (Galerkin stencils, lambda_max
                                        # power refresh, coarsest Cholesky)
                                        # every N SIMP iterations instead of
                                        # every iteration.  The design moves
                                        # <= move_limit (0.2)/iteration, so a
                                        # few-iterations-stale M still
                                        # preconditions well; CG always
                                        # applies the CURRENT operator, so
                                        # results stay exact to cg_rtol —
                                        # staleness only changes CG iteration
                                        # counts (tests/test_optimize.py
                                        # pins trajectory agreement).  Takes
                                        # effect on the split-program path
                                        # (multigrid + single device)
    mg_full_setup_every: int = 1        # PARTIAL setup cadence: between full
                                        # setups, refresh only the fine half
                                        # (level-0 diag/lambda + the level-1
                                        # Galerkin stencil) and reuse deeper
                                        # stencils + the coarsest Cholesky
                                        # (ops/multigrid.py setup_light).
                                        # Unlike mg_setup_every (which lets
                                        # the FINE smoother go stale against
                                        # the fresh CG operator — measured
                                        # catastrophic), only the coarse
                                        # CORRECTION staleness is traded,
                                        # guarded by the same CG-degradation
                                        # watchdog.  1 = always full.  Takes
                                        # effect on the split-program path
    mg_cycle: str = "v"                 # "v" | "w".  Default V + the (1, 3)
                                        # per-level smoothing: a 50-iteration
                                        # 48x24x24 trajectory measured total
                                        # CG within 3.6% of the W-cycle (786
                                        # vs 759) while the W-cycle's inlined
                                        # coarse subtrees ~3.5x'd the 128^3
                                        # TPU compile (2043 s vs ~560 s)
    use_pallas_matvec: bool = True      # fused Pallas stencil matvec (5.9x
                                        # faster than the XLA chain at 128^3);
                                        # engaged on the TPU backend for grids
                                        # that tile, XLA fallback otherwise

    # --- coarse-to-fine continuation (opt/continuation.py; voxel path) ---
    continuation_levels: int = 0        # >0: run the problem at half
                                        # resolution per level first and
                                        # prolong design+u as the fine warm
                                        # start — the fine trajectory then
                                        # starts at developed contrast,
                                        # where warm starts, recycling, and
                                        # adaptive forcing are all effective
                                        # (the cold early window is ~2x
                                        # slower per iteration at 128^3)
    continuation_iters: int = 40        # SIMP iterations per coarse stage
                                        # (or params.tolerance, if first)

    # --- checkpoint/resume + profiling (capabilities the reference lacks,
    #     SURVEY.md §5.1/§5.4) ---
    checkpoint_interval: int = 0        # save state every N iterations
    checkpoint_path: str = ""           # .npz state file
    profile_dir: str = ""               # jax.profiler trace of iterations 2-4

    def __post_init__(self):
        if self.filter_type not in ("sensitivity", "density"):
            raise ValueError(
                f"filter_type must be 'sensitivity' or 'density', got "
                f"{self.filter_type!r}"
            )
        if self.preconditioner not in ("auto", "jacobi", "block_jacobi",
                                       "amg", "multigrid", "none"):
            raise ValueError(f"unknown preconditioner {self.preconditioner!r}")


@dataclass
class OptimizationResult:
    """Final design and history (parity: Optimization.jl:145-155)."""

    densities: np.ndarray          # final PHYSICAL densities (flat, x-fastest)
    displacements: np.ndarray      # final displacement dof vector (flat)
    stresses: dict                 # cell -> per-quadrature-point stress tensors
    energy: float
    volume: float
    iterations: int
    converged: bool
    energy_history: list[float]
    volume_history: list[float]

    # TPU extras (not in the reference result)
    densities_3d: np.ndarray | None = None   # (nx, ny, nz) for voxel grids
    cg_iterations_history: list[int] = field(default_factory=list)
    change_history: list[float] = field(default_factory=list)
    element_energies: np.ndarray | None = None  # 0.5*E(rho)*u_e^T ke u_e, flat
