"""Benchmark: full SIMP iterations/sec on a 128^3 voxel cantilever.

Driver contract: prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the BASELINE.json target of >= 5 full SIMP
iterations/sec at 128^3 (matrix-free multigrid-CG).  All diagnostics go to
stderr.

Runs on whatever accelerator jax selects (the real TPU under the driver;
set BENCH_NELS/BENCH_DTYPE to override locally).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Persistent compilation cache: the 128^3 MG-CG step graph takes minutes to
# compile; cache across driver invocations.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    nels_env = os.environ.get("BENCH_NELS", "128,128,128")
    nels = tuple(int(v) for v in nels_env.split(","))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    n_timed = int(os.environ.get("BENCH_ITERS", "10"))

    import jax

    log(f"devices: {jax.devices()}")

    import easysimp_tpu as et
    from easysimp_tpu.opt.optimize import build_voxel_step
    from easysimp_tpu.utils.terminal import set_quiet

    set_quiet(True)  # keep stdout JSON-only

    nx, ny, nz = nels
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                            tuple(float(n) for n in nels))
    fixed = et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6)
    bc = et.apply_fixed_boundary(grid, fixed)
    load = et.PointLoad(
        et.select_nodes_by_box(grid, [nx, 0, 0], [nx, 0, nz]),
        [0.0, -1.0, 0.0],
    )
    log(f"grid {nels} = {grid.n_cells} cells, {grid.n_dofs} dofs, dtype {dtype}")

    def build_and_warm(use_pallas):
        params = et.OptimizationParameters(
            E0=1.0, Emin=1e-9, nu=0.3, p=3.0, volume_fraction=0.3,
            filter_radius=1.5, dtype=dtype, cg_rtol=1e-5, cg_maxiter=500,
            preconditioner="multigrid", use_pallas_matvec=use_pallas,
        )
        t0 = time.time()
        vs = build_voxel_step(grid, [load], [bc], params)
        step = jax.jit(vs.step, donate_argnums=(0, 1))
        design, u = vs.design0, vs.u0
        # Warmup: compile + 2 real iterations (also warms the CG trajectory).
        outs = step(design, u)
        jax.block_until_ready(outs)
        log(f"[pallas={use_pallas}] compile+first step: "
            f"{time.time() - t0:.1f}s; energy {float(outs[3]):.6e} "
            f"cg {int(outs[9])}")
        design, u = outs[0], outs[1]
        outs = step(design, u)
        jax.block_until_ready(outs)
        log(f"warm step 2: energy {float(outs[3]):.6e} cg {int(outs[9])}")
        return step, outs[0], outs[1]

    try:
        step, design, u = build_and_warm(True)
    except Exception as e:  # kernel/device fault -> proven XLA path
        log(f"pallas path failed ({type(e).__name__}: {str(e)[:150]}); "
            "falling back to XLA matvec")
        step, design, u = build_and_warm(False)

    # Timed run: n_timed full SIMP iterations (solve + sens + filter + OC).
    cg_counts = []
    t0 = time.time()
    for _ in range(n_timed):
        outs = step(design, u)
        design, u = outs[0], outs[1]
    jax.block_until_ready(outs)
    elapsed = time.time() - t0

    energy = float(outs[3])
    cg_iters = int(outs[9])
    iters_per_sec = n_timed / elapsed
    log(
        f"{n_timed} SIMP iters in {elapsed:.2f}s -> {iters_per_sec:.2f} it/s; "
        f"last solve: {cg_iters} CG iters; energy {energy:.6e}"
    )

    print(json.dumps({
        "metric": f"simp_iterations_per_sec_{nx}x{ny}x{nz}",
        "value": round(iters_per_sec, 3),
        "unit": "iters/sec",
        "vs_baseline": round(iters_per_sec / 5.0, 3),
    }))


if __name__ == "__main__":
    main()
