"""Device-mesh sharding: SPMD domain decomposition of the voxel grid.

The reference is single-threaded (SURVEY.md §2.9: no MPI/NCCL, no parallel
loops); scaling here is TPU-native instead of ported: the voxel grid is
domain-decomposed over a `jax.sharding.Mesh` with `NamedSharding`s on the
spatial axes.  The matrix-free stencil (static slices + pad-adds), the filter
convolutions, and the CG reductions are all GSPMD-partitionable as written —
XLA inserts the halo exchanges (collective-permutes over ICI) and the psum
reductions automatically, so the SAME jitted SIMP step runs on 1 chip or a
pod slice without code changes.

Axis mapping:
  mesh axes ("x", "y", "z")  <->  voxel grid axes 0, 1, 2
  cell fields  (nx, ny, nz)         -> P("x", "y", "z")
  node fields  (nnx, nny, nnz, 3)   -> P("x", "y", "z", None)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_element_mesh",
    "element_sharding",
    "replicated_sharding",
    "cell_sharding",
    "node_sharding",
    "node_padded_shape",
    "pad_node_field",
    "shard_voxel_state",
    "best_mesh_shape",
]

_AXES = ("x", "y", "z")


def best_mesh_shape(n_devices: int, nels, max_axes: int = 3):
    """Factor n_devices over the largest grid axes.

    Prefers slab (1-D) then pencil (2-D) decompositions — fewer halo
    surfaces per device ride ICI better than small cubes at moderate device
    counts.  Axes are assigned in decreasing element count.
    """
    order = np.argsort(nels)[::-1]
    shape = [1, 1, 1]
    remaining = n_devices
    for k, ax in enumerate(order[:max_axes]):
        if remaining == 1:
            break
        # largest divisor of `remaining` that divides nels[ax]
        d = 1
        for cand in range(min(remaining, nels[ax]), 0, -1):
            if remaining % cand == 0 and nels[ax] % cand == 0:
                d = cand
                break
        shape[ax] = d
        remaining //= d
    if remaining != 1:
        raise ValueError(
            f"cannot factor {n_devices} devices over grid {tuple(nels)}"
        )
    return tuple(shape)


def make_mesh(n_devices: int | None = None, shape=None, devices=None) -> Mesh:
    """Create a ("x", "y", "z") device mesh.

    Args:
      n_devices: number of devices (default: all available).
      shape: explicit (dx, dy, dz) factorization; default (n, 1, 1).
      devices: explicit device list (default jax.devices()).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices, 1, 1)
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, _AXES)


def cell_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (nx, ny, nz) element fields (densities, moduli, sens)."""
    return NamedSharding(mesh, P(*_AXES))


def node_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for PADDED (pnx, pny, pnz, 3) node fields (u, f, masks).

    Node grids have nels+1 entries per axis — never divisible by the mesh —
    and explicit uneven input shardings are rejected by jit/device_put.
    Distributed node storage therefore pads each spatial axis up to the next
    multiple of its mesh-axis size (`node_padded_shape`; pad rows are zeros
    and stay zero — the step functions slice back to the exact node shape at
    entry and re-pad outputs).  Each device then holds ~1/n of every
    persistent node field, and GSPMD starts from already-sharded operands
    instead of all-gathering replicated inputs each step.
    """
    return NamedSharding(mesh, P(*_AXES, None))


def node_padded_shape(mesh: Mesh, nnodes_per_axis):
    """Smallest per-axis node counts divisible by the mesh axis sizes."""
    out = []
    for ax, n in zip(_AXES, nnodes_per_axis):
        d = mesh.shape[ax]
        out.append(((n + d - 1) // d) * d)
    return tuple(out)


def pad_node_field(a, padded_shape):
    """Zero-pad an exact (nnx, nny, nnz, C) node field to `padded_shape`."""
    import jax.numpy as jnp

    pads = [(0, p - s) for p, s in zip(padded_shape, a.shape[:3])]
    return jnp.pad(a, pads + [(0, 0)])


def shard_voxel_state(mesh: Mesh, *, cell_fields=(), node_fields=()):
    """device_put the given fields with the canonical shardings.

    Node fields are zero-PADDED to `node_padded_shape` so their storage is
    truly distributed (see `node_sharding`).  Returns
    (sharded_cell_fields, sharded_node_fields) tuples in input order.
    """
    cs, ns = cell_sharding(mesh), node_sharding(mesh)
    cells = tuple(jax.device_put(a, cs) for a in cell_fields)
    nodes = []
    for a in node_fields:
        pshape = node_padded_shape(mesh, a.shape[:3])
        nodes.append(jax.device_put(pad_node_field(a, pshape), ns))
    return cells, tuple(nodes)


# ---------------------------------------------------------------------------
# Unstructured (imported-mesh) path: element-parallel decomposition
# ---------------------------------------------------------------------------

def make_element_mesh(n_elements: int, n_devices=None, devices=None) -> Mesh:
    """1-D device mesh over the ELEMENT axis for the unstructured path.

    Uses the largest device count that DIVIDES n_elements (GSPMD rejects
    uneven input shardings, and padding fake elements would contaminate the
    OC volume constraint) — e.g. the gripper's 16490 hex8 run on 5 of 8
    devices, the wheel's 36552 tet4 on all 8.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    while n_devices > 1 and n_elements % n_devices:
        n_devices -= 1
    return Mesh(np.asarray(devices[:n_devices]), ("e",))


def element_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for element-axis arrays (ke batch, dofmap, densities,
    volumes, padded filter tables): first dim split over "e".

    The matvec's gather -> batched-matmul is then element-parallel and the
    scatter-add into the replicated dof vector compiles to per-shard
    partials + one all-reduce; the filter's padded neighbor tables shard
    row-wise the same way."""
    return NamedSharding(mesh, P("e"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Placement for node/dof vectors (u, f, masks): mesh-replicated —
    n_dofs is never divisible by the device count, and the per-CG-iteration
    vectors are small next to the element batch."""
    return NamedSharding(mesh, P())
