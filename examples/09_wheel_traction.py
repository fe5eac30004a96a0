"""Wheel under rim torque (tet import + surface traction + body force).

The BASELINE Wheel_3d config: data/Wheel_3d_coarse.msh, hub fixed, tangential
rim traction, gravity body force.
Run:  python examples/09_wheel_traction.py [results_dir]
"""
import sys
from easysimp_tpu.models import wheel
from easysimp_tpu import simp_optimize

def main(results_dir="./results/09_wheel"):
    mesh, loads, bcs, params, accel = wheel.build()
    params.export_path = results_dir
    params.task_name = "09_wheel"
    return simp_optimize(mesh, loads, bcs, params, accel)

if __name__ == "__main__":
    main(*sys.argv[1:])
