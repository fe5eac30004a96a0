"""Single-chip production tuning: the measured-best 128^3 TPU configuration.

No reference analogue (the reference's CHOLMOD solve has no solver knobs);
this example shows the round-4 measured-optimal configuration for large
voxel problems on one TPU chip — 5.91 SIMP iterations/sec late-trajectory
at 128^3 on a single v5e-lite (bench.py defaults to the same settings;
see docs/performance_tuning.md and PHASES_r04.json for the measurements):

  * Galerkin multigrid (default) with per-level Chebyshev smoothing (1, 2);
  * bfloat16 V-cycle interior (`mg_cycle_dtype`): the stencil cycle is
    HBM-traffic-bound, so halving its field traffic measured 25 -> 12.9 ms
    per CG iteration at 128^3 for only +2 CG iterations — CG itself stays
    fp32 and still converges to `cg_rtol`;
  * subspace-recycled CG (`cg_recycle_k`): deltas of the last k solutions
    deflate the warm-start residual (TPU-measured late CG 14 -> 11 alone);
  * adaptive CG forcing (`cg_forcing="adaptive"`, inexact SIMP): loosen
    the solve tolerance to what the OC design decision needs
    (rtol_i = 0.05 * change_{i-1}, clipped to [cg_rtol, cg_rtol_max]) —
    with recycling, TPU-measured late CG 11 -> 2 (3.29 -> 5.91 it/s);
  * checkpointing every 10 iterations — on shared/tunneled TPUs a faulted
    device wedges its process, and `resume_from` continues bit-identically.

Run:  python examples/11_performance_tuned.py [nx ny nz]
"""
import sys

from easysimp_tpu import OptimizationParameters, simp_optimize
from easysimp_tpu.models import cantilever


def main(nx=128, ny=128, nz=128):
    nels = (int(nx), int(ny), int(nz))
    grid, loads, bcs, params, accel = cantilever.build_basic(
        nels=nels, max_iterations=50, tolerance=0.01)
    tuned = OptimizationParameters(**{
        **params.__dict__,
        "dtype": "float32",
        "cg_rtol": 1e-5,
        "cg_maxiter": 500,
        "cg_recycle_k": 8,
        "cg_forcing": "adaptive",
        "preconditioner": "multigrid",
        "mg_smooth_iters": (1, 2),
        "mg_cycle_dtype": "bfloat16",
        "checkpoint_interval": 10,
        "checkpoint_path": "/tmp/simp_ckpt.npz",
    })
    return simp_optimize(grid, loads, bcs, tuned, accel)


if __name__ == "__main__":
    main(*sys.argv[1:])
