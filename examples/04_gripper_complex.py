"""Gripper compliant mount (analogue of test/Examples/04_gripper_complex.jl).

Imported hex mesh (stul14.vtu), circular fixed support, X-symmetry plane,
leg + camera point loads, 6 m/s^2 body force.
Run:  python examples/04_gripper_complex.py [results_dir]
"""
import sys
from easysimp_tpu.models import gripper
from easysimp_tpu import simp_optimize

def main(results_dir="./results/04_gripper"):
    mesh, loads, bcs, params, accel = gripper.build()
    params.export_path = results_dir
    params.task_name = "04_gripper"
    return simp_optimize(mesh, loads, bcs, params, accel)

if __name__ == "__main__":
    main(*sys.argv[1:])
