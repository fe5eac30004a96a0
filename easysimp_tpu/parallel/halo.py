"""Explicit halo-exchange matvec under shard_map.

The GSPMD path (sharding.py) lets XLA infer collectives from slice/pad
patterns; this module is the hand-scheduled alternative: the voxel grid is
block-decomposed along the x-axis, each device owns an interior slab of
NODES, and the stiffness action exchanges one node plane with each neighbor
per application via `lax.ppermute` (compiled to ICI sends on TPU) — the
"sequence-parallel-like" halo exchange called for by SURVEY.md §5.7/§5.8.

Layout per device (axis "x" of the mesh, size P):
  * cells:  local slab (nx/P, ny, nz) — same as the GSPMD cell sharding.
  * nodes:  OWNED planes only, (nx/P, ny+1, nz+1, 3); plane x = P*k is owned
    by device k; the global grid has nx+1 planes, so the LAST device also
    owns the final plane, carried in a separate (1, ny+1, nz+1, 3) tail that
    lives replicated (tiny) and is updated by the last shard.

For simplicity and zero special-casing at the tail, this implementation
stores per-device node slabs of shape (nx/P + 1, nny, nnz, 3) where the last
plane DUPLICATES the first plane of the right neighbor (a one-plane overlap).
Vector semantics:
  * `halo_sync(u)` makes the overlap consistent (pull from right neighbor).
  * reductions must not double-count the overlap: `masked_vdot` weights the
    last local plane by 0 except on the last device.

The matvec computes per-slab element contributions (all elements whose cells
live on the device, using the overlapped node plane) and then accumulates the
boundary-plane contributions that neighboring devices computed for shared
nodes via one ppermute per direction.

STATUS — reference scaffolding, not wired into the driver.  The production
path is GSPMD (sharding.py): on the virtual-device mesh both compile to the
same collective pattern (one collective-permute pair per axis per matvec —
asserted for GSPMD in tests/test_sharding.py), and GSPMD additionally
partitions the filters, reductions, and multigrid transfers with zero extra
code.  This module is kept as the hand-scheduled baseline to benchmark
GSPMD's halo exchanges against when real multi-chip hardware is available;
if it wins there, wire it in via VoxelOperator.set_fused_matvec.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.operator import gather_element_dofs, scatter_element_dofs

__all__ = ["HaloVoxelOperator"]


def _pshift_from_right(x, axis_name):
    """Receive from right neighbor (i+1 -> i); last device receives zeros."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, i - 1) for i in range(1, n)]
    return jax.lax.ppermute(x, axis_name, perm)


def _pshift_from_left(x, axis_name):
    """Receive from left neighbor (i-1 -> i); first device receives zeros."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


class HaloVoxelOperator:
    """x-slab decomposed stiffness action with explicit ICI halo exchange.

    Wraps a single-device VoxelOperator's ke; all methods are written for use
    INSIDE shard_map over mesh axis "x".  Node slabs carry a one-plane right
    overlap (see module docstring).
    """

    def __init__(self, op, mesh: Mesh, axis: str = "x"):
        self.ke = op.ke
        self.grid = op.grid
        self.mesh = mesh
        self.axis = axis
        nx = op.grid.nels[0]
        self.n_shards = mesh.shape[axis]
        if nx % self.n_shards != 0:
            raise ValueError(
                f"nx={nx} not divisible by {self.n_shards} shards")
        self.local_nx = nx // self.n_shards

    # -- inside-shard_map building blocks ---------------------------------
    def halo_sync(self, u_local):
        """Make the right-overlap plane consistent: overlap = neighbor's
        first owned plane.  One ppermute."""
        first_plane = u_local[0:1]
        from_right = _pshift_from_right(first_plane, self.axis)
        idx = jax.lax.axis_index(self.axis)
        is_last = idx == self.n_shards - 1
        # Last device keeps its own final plane (the true global boundary).
        tail = jnp.where(is_last, u_local[-1:], from_right)
        return jnp.concatenate([u_local[:-1], tail], axis=0)

    def overlap_weight(self, shape_like):
        """Per-plane weights that count each global node exactly once in
        reductions: 0 on the overlap plane except on the last device."""
        idx = jax.lax.axis_index(self.axis)
        w = jnp.ones((shape_like.shape[0],), dtype=shape_like.dtype)
        is_last = (idx == self.n_shards - 1).astype(shape_like.dtype)
        w = w.at[-1].set(is_last)
        return w.reshape(-1, *([1] * (shape_like.ndim - 1)))

    def pvdot(self, a, b):
        """Global <a, b> without double-counting overlap planes."""
        w = self.overlap_weight(a)
        return jax.lax.psum(jnp.vdot(a * w, b), self.axis)

    def apply_K_local(self, u_local, scale_local):
        """Local element contributions + cross-boundary accumulation.

        u_local: (local_nx + 1, nny, nnz, 3) with a synced right overlap.
        scale_local: (local_nx, ny, nz).
        Returns a node slab in the same overlapped layout whose planes hold
        the COMPLETE global K u rows for every owned node (and a consistent
        overlap plane).
        """
        ue = gather_element_dofs(u_local)
        q = jnp.einsum("...j,ij->...i", ue, self.ke,
                       precision=jax.lax.Precision.HIGHEST)
        fe = q * scale_local[..., None]
        out = scatter_element_dofs(fe)   # (local_nx+1, nny, nnz, 3), partial
        # Plane local_nx (the overlap) holds contributions from OUR elements
        # to the neighbor's first plane; our plane 0 is missing the left
        # neighbor's contributions.  One exchange completes both.
        from_left = _pshift_from_left(out[-1:], self.axis)
        out = out.at[0:1].add(from_left)
        # refresh overlap plane so the output is in consistent layout
        return self.halo_sync(out)

    def apply_masked(self, u_local, scale_local, mask_local):
        """BC-masked SPD action M K (M u) in slab layout — the halo
        counterpart of `VoxelOperator.apply` (ops/operator.py), certified
        equal to the GSPMD path in tests/test_halo.py."""
        return mask_local * self.apply_K_local(
            self.halo_sync(mask_local * u_local), scale_local)

    # -- host-side helpers --------------------------------------------------
    def shard_spec_nodes(self):
        return P(self.axis, None, None, None)

    def shard_spec_cells(self):
        return P(self.axis, None, None)

    def to_local_layout(self, u_global):
        """(nnx, nny, nnz, 3) global node field -> overlapped slab stack
        (P * (local_nx+1), nny, nnz, 3) ready for shard_map sharding."""
        import numpy as np

        u = np.asarray(u_global)
        slabs = []
        for k in range(self.n_shards):
            s = k * self.local_nx
            slabs.append(u[s : s + self.local_nx + 1])
        return jnp.asarray(np.concatenate(slabs, axis=0))

    def from_local_layout(self, stacked):
        """Inverse of `to_local_layout` (drops duplicate overlap planes)."""
        import numpy as np

        a = np.asarray(stacked)
        L = self.local_nx + 1
        slabs = [a[k * L : (k + 1) * L] for k in range(self.n_shards)]
        parts = [s[:-1] for s in slabs[:-1]] + [slabs[-1]]
        return np.concatenate(parts, axis=0)

    # -- full solver building block -----------------------------------------
    def make_sharded_matvec(self):
        """Returns jitted global-layout matvec using shard_map internally."""
        from jax.sharding import NamedSharding

        mesh = self.mesh

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(self.shard_spec_nodes(), self.shard_spec_cells()),
            out_specs=self.shard_spec_nodes(),
        )
        def mv(u_stacked, scale):
            u_synced = self.halo_sync(u_stacked)
            return self.apply_K_local(u_synced, scale)

        return jax.jit(mv)

    def make_sharded_masked_matvec(self):
        """Jitted global-layout BC-masked matvec (the CG operator action)."""

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(self.shard_spec_nodes(), self.shard_spec_cells(),
                      self.shard_spec_nodes()),
            out_specs=self.shard_spec_nodes(),
        )
        def mv(u_stacked, scale, mask_stacked):
            return self.apply_masked(u_stacked, scale, mask_stacked)

        return jax.jit(mv)
