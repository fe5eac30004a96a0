"""Trajectory-level multigrid A/B study: CG iteration counts over a FULL
SIMP optimization as the void/solid contrast develops.

The round-2 weakness this quantifies: with rediscretized (arithmetic-mean
modulus) coarse operators, CG grew 10 -> 34 iterations within 12 SIMP
iterations at 128^3, and the bench's early-trajectory it/s overstated the
sustained rate.  The Galerkin (P^T A P) coarse stencils (ops/stencil.py)
are supposed to keep counts flat to convergence — this script measures it.

Runs on CPU (fp64, deterministic) by default; pass --tpu to run fp32 on the
real chip.  Typical CPU invocation:

    python scripts/mg_contrast_study.py --nels 48,24,24 --iters 50 \
        --config galerkin_v13 --config arithmetic_v1

Reports per-iteration CG counts and the total fine-level matvec-equivalent
work  sum_i (cg_i * (2*d0 + 1) + refresh)  with d0 the fine Chebyshev
degree (2*d0 - 1 smoothing applies — the pre-smooth starts from x0 = 0 so
its first residual is free — plus 1 restriction residual + 1 CG matvec
per CG iteration).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # name: (mg_galerkin, mg_cycle, mg_smooth_iters[, mg_coarsen])
    # Round-3 measurements @ 48x24x24 x 50 iters (total CG / max cg):
    #   arithmetic_v1 1305/34, galerkin_v1 981/24, galerkin_v13 786/20
    #   (default), galerkin_w13 621/15 (W-cycle: fewer CG but ~2x coarse
    #   work/cycle — not a wall-clock win on TPU), harmonic_v1 STALLS
    #   (22862, hits cg_maxiter: coarse moduli ~Emin kill the correction),
    #   mixed_v1 1602/41, mixed_v13 1152/29.  Conclusion: rediscretized
    #   coarsening rules cannot fix the contrast problem; Galerkin does.
    "arithmetic_v1": (False, "v", 1),
    "arithmetic_v22": (False, "v", 2),
    "harmonic_v1": (False, "v", 1, "harmonic"),
    "mixed_v1": (False, "v", 1, "mixed"),
    "harmonic_v13": (False, "v", (1, 3), "harmonic"),
    "mixed_v13": (False, "v", (1, 3), "mixed"),
    "mixed_v12": (False, "v", (1, 2), "mixed"),
    "galerkin_v1": (True, "v", 1),
    "galerkin_v12": (True, "v", (1, 2)),
    "galerkin_v13": (True, "v", (1, 3)),
    "galerkin_v14": (True, "v", (1, 4)),
    "galerkin_v15": (True, "v", (1, 5)),
    "galerkin_v23": (True, "v", (2, 3)),
    "galerkin_w1": (True, "w", 1),
    "galerkin_w13": (True, "w", (1, 3)),
}


def run(nels, n_iters, name, dtype, forcing="fixed", cycle_dtype=None):
    import jax
    import jax.numpy as jnp

    import easysimp_tpu as et
    from easysimp_tpu.opt.optimize import build_voxel_step
    from easysimp_tpu.utils.terminal import set_quiet

    set_quiet(True)
    cfg = CONFIGS[name]
    galerkin, cycle, smooth = cfg[:3]
    coarsen = cfg[3] if len(cfg) > 3 else "arithmetic"
    nx, ny, nz = nels
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                            tuple(float(n) for n in nels))
    bc = et.apply_fixed_boundary(
        grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
    load = et.PointLoad(
        et.select_nodes_by_box(grid, [nx, 0, 0], [nx, 0, nz]),
        [0.0, -1.0, 0.0])
    params = et.OptimizationParameters(
        E0=1.0, Emin=1e-9, nu=0.3, p=3.0, volume_fraction=0.3,
        filter_radius=1.5, dtype=dtype, cg_rtol=1e-5, cg_maxiter=500,
        preconditioner="multigrid", mg_galerkin=galerkin, mg_cycle=cycle,
        mg_smooth_iters=smooth, mg_coarsen=coarsen, cg_forcing=forcing,
        mg_cycle_dtype=cycle_dtype or "",
        use_pallas_matvec=jax.default_backend() == "tpu")
    vs = build_voxel_step(grid, [load], [bc], params)
    solve_part = jax.jit(vs.step_solve)
    update_part = jax.jit(vs.step_update)
    f_ext, free_mask, vsens = vs.step_args
    design, u, pvecs = vs.design0, vs.u0, vs.pvecs0
    if vs.power_init is not None:
        pvecs = jax.jit(vs.power_init)(design, free_mask)

    d0 = smooth[0] if isinstance(smooth, tuple) else smooth
    rtol = jnp.asarray(params.cg_rtol_max, vs.dtype)  # adaptive schedule
    cg_hist, t0 = [], time.time()
    for it in range(n_iters):
        kw = {"rtol": rtol} if forcing == "adaptive" else {}
        phys, u, energy, volume, cg_iters, cg_res, pvecs = solve_part(
            design, u, pvecs, f_ext, free_mask, **kw)
        new_design, lam, bi, bv, fsens = update_part(design, phys, u, vsens)
        if forcing == "adaptive":
            change = float(jnp.max(jnp.abs(new_design - design)))
            rtol = jnp.asarray(
                min(params.cg_rtol_max,
                    max(params.cg_rtol, params.cg_forcing_coeff * change)),
                vs.dtype)
        design = new_design
        cg_hist.append(int(cg_iters))
        if not (float(energy) == float(energy)):
            print(f"  [{name}] NON-FINITE at iter {it + 1}", file=sys.stderr)
            break
    wall = time.time() - t0
    total_cg = sum(cg_hist)
    fine_work = total_cg * (2 * d0 + 1) + len(cg_hist) * 2
    return {
        "config": name, "forcing": forcing, "nels": list(nels),
        "iters": len(cg_hist),
        "cg_per_iter": cg_hist, "total_cg": total_cg,
        "fine_matvec_work": fine_work, "wall_s": round(wall, 1),
        "final_energy": float(energy),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nels", default="48,24,24")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--config", action="append", default=[],
                    choices=sorted(CONFIGS), help="repeatable")
    ap.add_argument("--forcing", action="append", default=[],
                    choices=["fixed", "adaptive"],
                    help="repeatable; each config runs once per mode "
                         "(default: fixed only)")
    ap.add_argument("--cycle-dtype", default=None,
                    help="mg_cycle_dtype override (e.g. bfloat16) — the "
                         "bench runs the cycle interior in bf16, so A/Bs "
                         "of cycle structure should too")
    ap.add_argument("--fp32", action="store_true",
                    help="run the study in fp32 (the TPU operating dtype) "
                         "instead of the default fp64 CPU oracle dtype")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    nels = tuple(int(v) for v in args.nels.split(","))
    configs = args.config or ["arithmetic_v1", "galerkin_v13"]

    import jax

    if args.tpu:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        dtype = "float32"
    else:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        dtype = "float32" if args.fp32 else "float64"

    results = []
    for name in configs:
        for forcing in (args.forcing or ["fixed"]):
            print(f"--- {name} ({forcing}) @ {nels}, {args.iters} iters ---",
                  file=sys.stderr)
            r = run(nels, args.iters, name, dtype, forcing=forcing,
                    cycle_dtype=args.cycle_dtype)
            cg = r["cg_per_iter"]
            print(f"  cg first/last/max: {cg[0]}/{cg[-1]}/{max(cg)}  "
                  f"total {r['total_cg']}  fine-work "
                  f"{r['fine_matvec_work']}  wall {r['wall_s']}s  "
                  f"energy {r['final_energy']:.6e}", file=sys.stderr)
            results.append(r)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
