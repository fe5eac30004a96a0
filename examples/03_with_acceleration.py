"""Cantilever with body force (analogue of test/Examples/03_with_acceleration.jl).

Polymer beam, 1 kN tip load plus a 6 m/s^2 acceleration body force.
Run:  python examples/03_with_acceleration.py [results_dir]
"""
import sys
from easysimp_tpu.models import cantilever
from easysimp_tpu import simp_optimize

def main(results_dir="./results/03_with_acceleration"):
    grid, loads, bcs, params, accel = cantilever.build_acceleration()
    params.export_path = results_dir
    params.task_name = "03_with_acceleration"
    return simp_optimize(grid, loads, bcs, params, accel)

if __name__ == "__main__":
    main(*sys.argv[1:])
