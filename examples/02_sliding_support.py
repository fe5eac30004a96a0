"""Sliding-support cantilever (analogue of test/Examples/02_sliding_support.jl).

X-sliding wall + Y-roller support, load on the far top edge.
Run:  python examples/02_sliding_support.py [results_dir]
"""
import sys
from easysimp_tpu.models import cantilever
from easysimp_tpu import simp_optimize

def main(results_dir="./results/02_sliding_support"):
    grid, loads, bcs, params, accel = cantilever.build_sliding()
    params.export_path = results_dir
    params.task_name = "02_sliding_support"
    return simp_optimize(grid, loads, bcs, params, accel)

if __name__ == "__main__":
    main(*sys.argv[1:])
