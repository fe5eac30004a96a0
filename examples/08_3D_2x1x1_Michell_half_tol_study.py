"""Michell-half (Z-symmetry) batch tolerance study (analogue of 08_..._tol_study.jl)."""
import sys
from easysimp_tpu.models.beam_2x1x1 import build_michell_half
from easysimp_tpu.models.tol_study import DEFAULT_TOLERANCES, run_tolerance_study

def main(results_dir="./results/08_michell_half_tol_study"):
    return run_tolerance_study(build_michell_half, tolerances=DEFAULT_TOLERANCES,
                               results_root=results_dir, task_name="08_michell_half",
                               max_iterations=3000)

if __name__ == "__main__":
    main(*sys.argv[1:])
