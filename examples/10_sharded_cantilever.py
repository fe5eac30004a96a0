"""Multi-chip cantilever: domain decomposition over a TPU device mesh.

No reference analogue (the reference is single-threaded); this is the
TPU-native scaling path (SURVEY.md §5.8): shard the voxel grid over all
available devices and run the identical jitted pipeline.
Run:  python examples/10_sharded_cantilever.py [nx ny nz]
"""
import sys
import jax
from easysimp_tpu.models import cantilever
from easysimp_tpu.parallel.sharding import best_mesh_shape, make_mesh
from easysimp_tpu import simp_optimize

def main(nx=64, ny=32, nz=16):
    nels = (int(nx), int(ny), int(nz))
    grid, loads, bcs, params, accel = cantilever.build_basic(
        nels=nels, max_iterations=30, tolerance=0.01)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, shape=best_mesh_shape(n_dev, nels))
    print(f"Running on {n_dev} devices, mesh {mesh.shape}")
    return simp_optimize(grid, loads, bcs, params, accel, mesh=mesh)

if __name__ == "__main__":
    main(*sys.argv[1:])
