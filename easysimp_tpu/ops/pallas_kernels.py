"""Pallas TPU kernel: fused voxel stiffness matvec.

The XLA path (ops/operator.py) materializes the gathered (N, 24) element-dof
array, the matmul result, and eight scatter intermediates — several hundred
MB of HBM round-trips per application at 128^3.  This kernel fuses
gather -> ke-contraction -> SIMP scaling -> scatter into ONE pass:

  * structure-of-arrays layout inside the kernel: displacement components are
    separate (BX+1, BY+1, nnz) VMEM planes whose minor dimension is the full
    z extent (lane-aligned), sidestepping the hostile minor-dim-3/24 layouts;
  * the ke contraction unrolls into 24x24 scalar-coefficient fused
    multiply-adds on (BX, BY, nz) vectors — pure VPU work with zero layout
    changes (the MXU would need a 24-minor operand, which pads 5x);
  * each (bx, by) grid step DMAs its element block's node slab (one-plane
    halo in x and y) from HBM and writes a DISJOINT partial-output block;
    the <=4-way overlap between neighboring blocks' node planes is summed by
    four cheap strided adds in XLA afterwards — no atomics, no revisits.

Falls back to the XLA path when the grid doesn't tile (see
`pallas_matvec_available`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .elements import HEX_CORNERS

__all__ = ["pallas_matvec_available", "make_pallas_matvec"]


def pallas_matvec_available(grid, block=(8, 8)) -> bool:
    nx, ny, nz = grid.nels
    return nx % block[0] == 0 and ny % block[1] == 0


def _kernel(scale_ref, u_hbm, out_ref, u_blk, sem, *, ke, BX, BY, nz):
    """One (bx, by) block: DMA node slab, compute, write partial block."""
    bx = pl.program_id(0)
    by = pl.program_id(1)

    # Halo DMA: node slab (3, BX+1, BY+1, nnz) for this element block.
    dma = pltpu.make_async_copy(
        u_hbm.at[:, pl.ds(bx * BX, BX + 1), pl.ds(by * BY, BY + 1), :],
        u_blk,
        sem,
    )
    dma.start()
    # Output blocks are uninitialized; zero before accumulating.
    out_ref[...] = jnp.zeros_like(out_ref)
    dma.wait()

    scale = scale_ref[0, 0]                      # (BX, BY, nz)

    # Corner displacement windows (SoA): u_c[j][b] = (BX, BY, nz)
    uw = [
        [u_blk[j, dx : dx + BX, dy : dy + BY, dz : dz + nz]
         for (dx, dy, dz) in HEX_CORNERS]
        for j in range(3)
    ]

    # fe[c][i] = scale * sum_{b,j} ke[3c+i, 3b+j] * uw[j][b]
    for c, (dx, dy, dz) in enumerate(HEX_CORNERS):
        for i in range(3):
            acc = None
            for b in range(8):
                for j in range(3):
                    coeff = ke[3 * c + i, 3 * b + j]
                    if coeff == 0.0:
                        continue
                    term = coeff * uw[j][b]
                    acc = term if acc is None else acc + term
            fe = scale * acc
            # scatter into the partial output block (node-indexed)
            cur = out_ref[0, 0, i, dx : dx + BX, dy : dy + BY,
                          dz : dz + nz]
            out_ref[0, 0, i, dx : dx + BX, dy : dy + BY, dz : dz + nz] = (
                cur + fe
            )


def make_pallas_matvec(op, block=(8, 8), interpret=False):
    """Build a fused matvec for `op` (a VoxelOperator).

    Returns fn(u, scale) -> K u with u, out as (nnx, nny, nnz, 3) fields
    (the framework's public node layout; SoA transposes happen at the
    boundary).  Use `interpret=True` to run on CPU for testing.
    """
    grid = op.grid
    nx, ny, nz = grid.nels
    BX, BY = block
    if not pallas_matvec_available(grid, block):
        raise ValueError(f"grid {grid.nels} does not tile into {block}")
    nbx, nby = nx // BX, ny // BY
    nnx, nny, nnz = grid.nnodes_per_axis
    dtype = op.dtype
    ke = np.asarray(op.ke, dtype=np.float64)

    kernel = functools.partial(_kernel, ke=ke, BX=BX, BY=BY, nz=nz)

    call = pl.pallas_call(
        kernel,
        grid=(nbx, nby),
        in_specs=[
            # scale block (leading singleton dims make the block rank match)
            pl.BlockSpec((1, 1, BX, BY, nz),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # full u stays in HBM/ANY; the kernel DMAs its halo slab
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 3, BX + 1, BY + 1, nnz),
            lambda i, j: (i, j, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nbx, nby, 3, BX + 1, BY + 1, nnz), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, BX + 1, BY + 1, nnz), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    def matvec(u, scale):
        # public layout -> SoA
        u_soa = jnp.transpose(u, (3, 0, 1, 2))
        scale_b = scale.reshape(nbx, BX, nby, BY, nz).transpose(0, 2, 1, 3, 4)
        partial = call(scale_b, u_soa)           # (nbx,nby,3,BX+1,BY+1,nnz)

        out = jnp.zeros((3, nnx, nny, nnz), dtype)
        # interior: a<BX, b<BY
        interior = partial[:, :, :, :BX, :BY, :].transpose(2, 0, 3, 1, 4, 5)
        out = out.at[:, : nbx * BX, : nby * BY, :].add(
            interior.reshape(3, nbx * BX, nby * BY, nnz))
        # x-edge: a=BX -> global rows BX, 2BX, ..., nx
        xedge = partial[:, :, :, BX, :BY, :].transpose(2, 0, 1, 3, 4)
        out = out.at[:, BX::BX, : nby * BY, :].add(
            xedge.reshape(3, nbx, nby * BY, nnz))
        # y-edge: b=BY
        yedge = partial[:, :, :, :BX, BY, :].transpose(2, 0, 3, 1, 4)
        out = out.at[:, : nbx * BX, BY::BY, :].add(
            yedge.reshape(3, nbx * BX, nby, nnz))
        # corner: a=BX, b=BY
        corner = partial[:, :, :, BX, BY, :].transpose(2, 0, 1, 3)
        out = out.at[:, BX::BX, BY::BY, :].add(corner)
        return jnp.transpose(out, (1, 2, 3, 0))

    return matvec
