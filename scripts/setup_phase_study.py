"""Attribute the per-SIMP-iteration multigrid setup cost (VERDICT r4 #3).

At late-trajectory CG ~2 the ~74 ms precond setup dominates the 128^3
iteration (~169 ms).  Standalone per-op timings are dispatch-inflated
through the TPU tunnel (CLAUDE.md), so this times NESTED ONE-PROGRAM
variants of the setup, each adding one phase:

  fields      coarsen_cells/coarsen_mask chains only
  + stencils  Galerkin per-level builds (direct through lvl 3, RAP deeper)
  + stencil1  (variant: ONLY the level-1 direct build)
  + diags     stencil/element diagonals
  + power     refresh_iters power refresh on every level
  + cho       coarsest fold + dense Cholesky  == full setup

The phase cost is the delta between consecutive rows; the candidate
partial-refresh scheme (rebuild level 1 every iteration, reuse deeper
levels) is bounded below by the `fields + stencil1 + diag1 + power(0,1)`
row.

Usage:  python scripts/setup_phase_study.py [N]   (default 128)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_comp_cache"))

import easysimp_tpu as et
from easysimp_tpu.ops.multigrid import MultigridPreconditioner
from easysimp_tpu.ops.operator import VoxelOperator
from easysimp_tpu.utils.terminal import set_quiet


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_program(fn, args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    set_quiet(True)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    nels = (n, n, n)
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                            tuple(float(v) for v in nels))
    op = VoxelOperator(grid, E0=1.0, Emin=1e-9, nu=0.3, p=3.0,
                       dtype=jnp.float32)
    mg = MultigridPreconditioner(op, smooth_iters=(1, 2),
                                 cycle_dtype=jnp.bfloat16)
    log(f"{nels}: {mg.n_levels} levels, direct stencils through "
        f"{sorted(mg._Gs)}")

    # a developed-contrast-like design: smoothed binary field at vf 0.3
    rng = np.random.default_rng(0)
    d = rng.uniform(size=nels)
    from scipy.ndimage import uniform_filter

    d = uniform_filter(d, 7)
    thresh = np.quantile(d, 0.7)
    design = jnp.asarray(np.where(d > thresh, 1.0, 1e-3), jnp.float32)
    scale = jax.jit(op.youngs_modulus)(design)
    mask = jnp.ones((*grid.nnodes_per_axis, 3), jnp.float32)
    mask = mask.at[0].set(0.0)
    pvecs = jax.jit(mg.power_init)(scale, mask)
    jax.block_until_ready(pvecs)

    def fields(scale, mask):
        return mg._coarsen_fields(scale, mask)

    def stencils_all(scale, mask):
        scales, masks = mg._coarsen_fields(scale, mask)
        return mg._build_stencils(scale, masks)

    def stencil1_only(scale, mask):
        from easysimp_tpu.ops.stencil import level_stencil_from_scale

        scales, masks = mg._coarsen_fields(scale, mask)
        return level_stencil_from_scale(scale, mg._Gs[1], 1)

    def plus_diags(scale, mask):
        scales, masks = mg._coarsen_fields(scale, mask)
        st = mg._build_stencils(scale, masks)
        return [mg._level_diag(l, scales, masks, st)
                for l in range(mg.n_levels)]

    def plus_power(scale, mask, pv):
        scales, masks = mg._coarsen_fields(scale, mask)
        st = mg._build_stencils(scale, masks)
        outs = []
        for l in range(mg.n_levels):
            diag = mg._level_diag(l, scales, masks, st)
            lam, v = mg._estimate_lambda_max(
                mg._level_apply(l, scales, masks, st), masks[l], diag,
                pv[l], mg.refresh_iters)
            outs.append((lam, v))
        return outs

    def light(scale, mask, pv):
        """Candidate partial refresh: fields + level-1 stencil + level-0/1
        diag + level-0/1 power only (deeper levels reused from a previous
        full setup)."""
        from easysimp_tpu.ops.stencil import level_stencil_from_scale

        scales, masks = mg._coarsen_fields(scale, mask)
        st1 = level_stencil_from_scale(scale, mg._Gs[1], 1)
        sts = [None, st1] + [None] * (mg.n_levels - 2)
        outs = []
        for l in (0, 1):
            diag = mg._level_diag(l, scales, masks, sts)
            lam, v = mg._estimate_lambda_max(
                mg._level_apply(l, scales, masks, sts), masks[l], diag,
                pv[l], mg.refresh_iters)
            outs.append((lam, v, diag))
        return outs

    def full(scale, mask, pv):
        return mg.setup(scale, mask, pv)

    rows = [
        ("fields only", time_program(jax.jit(fields), (scale, mask))),
        ("+ all stencils", time_program(jax.jit(stencils_all),
                                        (scale, mask))),
        ("level-1 stencil only", time_program(jax.jit(stencil1_only),
                                              (scale, mask))),
        ("+ diags", time_program(jax.jit(plus_diags), (scale, mask))),
        ("+ power refresh", time_program(jax.jit(plus_power),
                                         (scale, mask, pvecs))),
        ("LIGHT (lvl-1 rebuild only)", time_program(jax.jit(light),
                                                    (scale, mask, pvecs))),
        ("FULL setup (+cho, casts)", time_program(jax.jit(full),
                                                  (scale, mask, pvecs))),
    ]
    log("--- one-program setup-variant timings (ms) ---")
    for name, ms in rows:
        log(f"  {name:>28s}: {ms:8.2f}")
    print("{" + ", ".join(f'"{k}": {v:.2f}' for k, v in rows) + "}")


if __name__ == "__main__":
    main()
