"""MBB-beam batch tolerance study (analogue of 06_3D_2x1x1_MBB_tol_study.jl)."""
import sys
from easysimp_tpu.models.beam_2x1x1 import build_mbb
from easysimp_tpu.models.tol_study import DEFAULT_TOLERANCES, run_tolerance_study

def main(results_dir="./results/06_mbb_tol_study"):
    return run_tolerance_study(build_mbb, tolerances=DEFAULT_TOLERANCES,
                               results_root=results_dir, task_name="06_mbb",
                               max_iterations=3000)

if __name__ == "__main__":
    main(*sys.argv[1:])
