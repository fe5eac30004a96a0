"""Pallas TPU kernel: fused voxel stiffness matvec.

The XLA path (ops/operator.py) materializes the gathered (N, 24) element-dof
array, the matmul result, and eight scatter intermediates — several hundred
MB of HBM round-trips per application at 128^3.  This kernel fuses
gather -> ke-contraction -> SIMP scaling -> scatter into ONE pass over
x-slabs.

TPU-shape constraints drive the design:
  * VMEM arrays keep (y, z) as the tiled (sublane, lane) dims, padded to
    (8, 128) multiples; x and the displacement component are leading
    (freely sliceable) dims;
  * the +/-1 neighbor offsets in y and z CANNOT be expressed as slices
    (Mosaic requires tile-aligned minor-dim slices) — they become
    `pltpu.roll` rotates.  Circular wrap-around is harmless because the
    SIMP modulus field is ZERO-padded: every wrapped-in product is
    multiplied by scale == 0;
  * the ke contraction unrolls into scalar-coefficient FMAs on
    (BX, NYP, NZP) vectors — pure VPU work, no layout changes (an MXU
    matmul would need a 24-minor operand, which pads 5x);
  * each x-slab writes a DISJOINT (BX+1)-plane partial block; the one-plane
    overlap between neighboring slabs is summed by one strided XLA add.

Falls back to the XLA path when nx doesn't tile (see
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

__all__ = ["pallas_matvec_available", "make_pallas_matvec",
           "install_fused_matvec"]

# Engage the kernel only where its (8,128)-tile padding is amortized; on
# small (coarse multigrid) grids the z padding dominates and XLA wins.
_MIN_DIM_FOR_KERNEL = 64


def _scoped_vmem_estimate(block, nny, nnz):
    """Empirical Mosaic scoped-stack estimate for this kernel (bytes).

    Measured: 30.93MB at block=4, (NYP,NZP)=(136,256) -> ~44 equivalent
    (BX+1, NYP, NZP) fp32 buffers live at peak."""
    NYP = _round_up(nny, 8)
    NZP = _round_up(nnz, 128)
    return 44 * (block + 1) * NYP * NZP * 4


_VMEM_BUDGET = 34 * 1024 * 1024  # margin under the 48MB scoped limit


def install_fused_matvec(op, min_dim=_MIN_DIM_FOR_KERNEL) -> bool:
    """Install the fused kernel on a VoxelOperator when profitable.

    Returns True if installed.  Criteria: every grid dimension >= min_dim
    (padding overhead bounded), the x extent tiles into blocks, and the
    kernel's scoped-VMEM footprint fits (grids ~>=192 in y/z need the
    y-blocked kernel variant — future work — and fall back to XLA).
    """
    nels = op.grid.nels
    if min(nels) < min_dim:
        return False
    nny, nnz = nels[1] + 1, nels[2] + 1
    for block in (4, 2):
        if nels[0] % block == 0 and \
                _scoped_vmem_estimate(block, nny, nnz) <= _VMEM_BUDGET:
            op.set_fused_matvec(make_pallas_matvec(op, block=block))
            return True
    return False


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def pallas_matvec_available(grid, block=8) -> bool:
    if isinstance(block, tuple):  # backwards compat with (BX, BY) blocks
        block = block[0]
    return grid.nels[0] % block == 0


def _roll2(x, dy, dz):
    """roll in (y, z) = axes (1, 2) of a (X, Y, Z) array; no-op for 0.

    pltpu.roll requires non-negative shifts: -1 becomes size-1 (circular)."""
    if dy:
        x = pltpu.roll(x, dy % x.shape[1], 1)
    if dz:
        x = pltpu.roll(x, dz % x.shape[2], 2)
    return x


def _kernel(scale_ref, u_hbm, out_ref, u_blk, sem, *, ke, BX, NYP, NZP):
    """One x-slab: out[i, X, Y, Z] = sum_c E[X-dxc, Y-dyc, Z-dzc] *
    sum_{b,j} ke[3c+i, 3b+j] * u[j, X-dxc+dxb, Y-dyc+dyb, Z-dzc+dzb].

    Node-centric accumulation; element quantities live on the (BX, NYP, NZP)
    padded element grid of this slab.
    """
    bx = pl.program_id(0)
    dma = pltpu.make_async_copy(
        u_hbm.at[:, pl.ds(bx * BX, BX + 1), :, :], u_blk, sem)
    dma.start()

    # Two pure accumulators per component (x-corner offset dxc in {0, 1});
    # Mosaic has no in-kernel scatter-add, so dynamic-slice .at[].add on
    # VALUES is out — plain adds here, static ref stores at the end.
    acc = [[jnp.zeros((BX, NYP, NZP), u_blk.dtype) for _ in range(2)]
           for _ in range(3)]
    dma.wait()

    scale = scale_ref[0]                               # (BX, NYP, NZP)
    # E_c = scale shifted so that index Y holds E at element (Y - dyc):
    # 4 (dyc, dzc) variants; the x shift is a free leading-dim slice.
    E = {(dy, dz): _roll2(scale, dy, dz) for dy in (0, 1) for dz in (0, 1)}
    u = [u_blk[j] for j in range(3)]                   # (BX+1, NYP, NZP)

    # Group corner pairs by their relative (y, z) roll so each rolled
    # displacement variant is built once.
    for dy_r in (-1, 0, 1):
        for dz_r in (-1, 0, 1):
            u_r = [_roll2(u[j], dy_r, dz_r) for j in range(3)]
            for c, (dxc, dyc, dzc) in enumerate(HEX_CORNERS):
                for b, (dxb, dyb, dzb) in enumerate(HEX_CORNERS):
                    if dyc - dyb != dy_r or dzc - dzb != dz_r:
                        continue
                    Ec = E[(dyc, dzc)]
                    for i in range(3):
                        term = None
                        for j in range(3):
                            coeff = float(ke[3 * c + i, 3 * b + j])
                            if coeff == 0.0:
                                continue
                            t = coeff * u_r[j][dxb : dxb + BX]
                            term = t if term is None else term + t
                        if term is None:
                            continue
                        acc[i][dxc] = acc[i][dxc] + Ec * term

    # Combine the two x-offset accumulators in VALUES and store each
    # component once (no read-modify-write on the pipelined output buffer).
    zplane = jnp.zeros((1, NYP, NZP), u_blk.dtype)
    for i in range(3):
        lo = jnp.concatenate([acc[i][0], zplane], axis=0)   # (BX+1, ...)
        hi = jnp.concatenate([zplane, acc[i][1]], axis=0)
        out_ref[0, i] = lo + hi


def make_pallas_matvec(op, block=8, interpret=False):
    """Build a fused matvec for `op` (a VoxelOperator).

    Returns fn(u, scale) -> K u with u, out as (nnx, nny, nnz, 3) fields
    (the framework's public node layout; the SoA transposes and (8,128)
    padding happen at the boundary and fuse into neighboring XLA ops).
    """
    if isinstance(block, tuple):
        block = block[0]
    grid = op.grid
    nx, ny, nz = grid.nels
    BX = block
    if not pallas_matvec_available(grid, BX):
        raise ValueError(f"nx={nx} does not tile into blocks of {BX}")
    nbx = nx // BX
    nnx, nny, nnz = grid.nnodes_per_axis
    NYP = _round_up(nny, 8)
    NZP = _round_up(nnz, 128)
    dtype = op.dtype
    ke = np.asarray(op.ke, dtype=np.float64)

    kernel = functools.partial(_kernel, ke=ke, BX=BX, NYP=NYP, NZP=NZP)

    call = pl.pallas_call(
        kernel,
        grid=(nbx,),
        in_specs=[
            pl.BlockSpec((1, BX, NYP, NZP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # u stays in HBM (the kernel DMAs halo slabs itself); ANY let the
            # compiler attempt a VMEM placement for the in-graph intermediate,
            # which faulted at 128^3.
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 3, BX + 1, NYP, NZP),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbx, 3, BX + 1, NYP, NZP), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, BX + 1, NYP, NZP), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # large grids need > the 16MB default scoped-vmem budget for the
            # halo slab + accumulators; v5e/v5p have far more physical VMEM
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def matvec(u, scale):
        # public layout -> padded SoA
        u_soa = jnp.zeros((3, nnx, NYP, NZP), dtype)
        u_soa = u_soa.at[:, :, :nny, :nnz].set(jnp.transpose(u, (3, 0, 1, 2)))
        scale_p = jnp.zeros((nbx, BX, NYP, NZP), dtype)
        scale_p = scale_p.at[:, :, :ny, :nz].set(
            scale.reshape(nbx, BX, ny, nz))

        partial = call(scale_p, u_soa)        # (nbx, 3, BX+1, NYP, NZP)

        out = jnp.zeros((3, nnx, NYP, NZP), dtype)
        interior = partial[:, :, :BX].transpose(1, 0, 2, 3, 4)
        out = out.at[:, : nbx * BX].add(
            interior.reshape(3, nbx * BX, NYP, NZP))
        # overlap plane: block i's plane BX lands on global plane (i+1)*BX
        edge = partial[:, :, BX].transpose(1, 0, 2, 3)
        out = out.at[:, BX::BX].add(edge)
        return jnp.transpose(out[:, :, :nny, :nnz], (1, 2, 3, 0))

    return matvec
