"""Pallas TPU kernels: fused voxel stiffness matvec + element energies.

The XLA path (ops/operator.py) materializes the gathered (N, 24) element-dof
array, the matmul result, and eight scatter intermediates — several hundred
MB of HBM round-trips per application at 128^3.  These kernels fuse
gather -> ke-contraction -> SIMP scaling -> scatter into ONE pass over
(x, y)-tiles.

TPU-shape constraints drive the design:
  * VMEM arrays keep (y, z) as the tiled (sublane, lane) dims, padded to
    (8, 128) multiples; x and the displacement component are leading
    (freely sliceable) dims;
  * the +/-1 neighbor offsets in y and z CANNOT be expressed as slices
    (Mosaic requires tile-aligned minor-dim slices) — they become
    `pltpu.roll` rotates.  Circular wrap-around is harmless because the
    SIMP modulus field is ZERO-padded per tile: every wrapped-in product
    is multiplied by scale == 0;
  * the ke contraction unrolls into scalar-coefficient FMAs on
    (BX, BYP, NZP) vectors — pure VPU work, no layout changes (an MXU
    matmul would need a 24-minor operand, which pads 5x);
  * each (x, y) element tile touches ONLY its own (BX+1, BY+1) node block
    (no halo needed): every tile writes a disjoint partial block, and the
    one-plane overlaps between neighboring tiles in x and in y are summed
    by strided XLA adds afterwards.

y-blocking keeps the scoped-VMEM footprint bounded as grids grow: at 256^3
an unblocked-y tile needs 46-89 MB; (BX=4, BY=64) fits in 25 MB.

The element-energies kernel computes w_e = u_e^T ke u_e on the element grid
(the compliance-sensitivity quadratic, SensitivityAnalysis.jl:74-78).  It is
a SEPARATE kernel from the matvec on purpose: the matvec runs inside every
CG iteration, the energies once per SIMP iteration — fusing them would
compute the quadratic hundreds of times per solve.

Falls back to the XLA path when no (BX, BY) tiling fits (see
`install_fused_matvec`).
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
           "make_pallas_energies", "install_fused_matvec", "select_blocks"]

# Engage the kernels only where their (8,128)-tile padding is amortized; on
# small (coarse multigrid) grids the z padding dominates and XLA wins.
_MIN_DIM_FOR_KERNEL = 64


def _vmem_limit_bytes():
    """Scoped-VMEM limit requested from Mosaic (EASYSIMP_PALLAS_VMEM_MB).

    Default 48MB (v5e/v5p have 128MB physical VMEM per core).  Knob exists
    because the scoped allocation appears SESSION-dependent on shared/
    tunneled chips — identical programs pass or die with 'TPU device error'
    per process — and a smaller request shrinks the exposure."""
    import os

    return int(os.environ.get("EASYSIMP_PALLAS_VMEM_MB", "48")) * 1024 * 1024


def _vmem_budget():
    """Tile-selection budget: leave margin under the scoped limit
    (34MB at the default 48MB — the validated round-1/round-2 margin)."""
    return int(0.72 * _vmem_limit_bytes())


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _compute_dtype(storage_dtype):
    """fp32 for sub-32-bit storage (Mosaic roll needs 32-bit lanes), native
    otherwise."""
    return jnp.float32 if jnp.dtype(storage_dtype).itemsize < 4 \
        else storage_dtype


def _matvec_vmem_estimate(BX, BYP, NZP):
    """Empirical Mosaic scoped-stack estimate for the matvec kernel (bytes).

    Measured: 30.93MB at BX=4, (BYP,NZP)=(136,256) -> ~44 equivalent
    (BX+1, BYP, NZP) fp32 buffers live at peak."""
    return 44 * (BX + 1) * BYP * NZP * 4


def select_blocks(nels, budget=None):
    """Pick an (BX, BY) element tile whose kernel footprint fits `budget`.

    BX must divide nx; BY must divide ny and be a multiple of 8 (aligned
    sublane DMA starts).  Iterates largest-first so the chosen tile has the
    smallest u over-read ((BX+1)/BX * BYP/BY).  Returns None if nothing
    fits.
    """
    if budget is None:
        budget = _vmem_budget()
    nx, ny, nz = nels
    NZP = _round_up(nz + 1, 128)
    y_candidates = [ny]
    by = ny // 2
    while by >= 32 and ny % by == 0 and by % 8 == 0:
        y_candidates.append(by)
        by //= 2
    for BX in (4, 2):
        if nx % BX:
            continue
        for BY in y_candidates:
            if BY < ny and BY % 8:
                continue
            BYP = _round_up(BY + 1, 8)
            if _matvec_vmem_estimate(BX, BYP, NZP) <= budget:
                return BX, BY
    return None


def install_fused_matvec(op, min_dim=None) -> bool:
    """Install the fused matvec + energies kernels on a VoxelOperator when
    profitable.

    Returns True if installed.  Criteria: every grid dimension >= min_dim
    (padding overhead bounded) and some (BX, BY) element tile fits the
    scoped-VMEM budget (y-blocking keeps this satisfiable at 256^3+).

    min_dim defaults to EASYSIMP_PALLAS_MIN_DIM (else 64).  Lowering it to 8
    puts the kernel on EVERY multigrid level — z-padding waste at the small
    levels, but it removes the XLA gather-stencil path from the solve/power
    programs entirely (under evaluation for the TPU mixed-program flake;
    parity covered by test_pallas_matvec_small_cubes).
    """
    if min_dim is None:
        import os

        min_dim = int(os.environ.get("EASYSIMP_PALLAS_MIN_DIM",
                                     _MIN_DIM_FOR_KERNEL))
    nels = op.grid.nels
    if min(nels) < min_dim:
        return False
    blocks = select_blocks(nels)
    if blocks is None:
        return False
    op.set_fused_matvec(make_pallas_matvec(op, block=blocks))
    op.set_fused_energies(make_pallas_energies(op, block=blocks))
    return True


def _normalize_block(grid, block):
    """Accept block as int (x-only) or (BX, BY); default BY = full ny."""
    if isinstance(block, tuple):
        BX, BY = block
    else:
        BX, BY = block, grid.nels[1]
    return int(BX), int(BY)


def pallas_matvec_available(grid, block=8) -> bool:
    BX, BY = _normalize_block(grid, block)
    nx, ny, _ = grid.nels
    if nx % BX or ny % BY:
        return False
    return BY == ny or BY % 8 == 0


def _roll2(x, dy, dz):
    """roll in (y, z) = axes (1, 2) of a (X, Y, Z) array; no-op for 0.

    pltpu.roll requires non-negative shifts: -1 becomes size-1 (circular)."""
    if dy:
        x = pltpu.roll(x, dy % x.shape[1], 1)
    if dz:
        x = pltpu.roll(x, dz % x.shape[2], 2)
    return x


def _kernel(scale_ref, u_hbm, out_ref, u_blk, sem, *, ke, BX, BY, BYP, NZP):
    """One (x, y) tile: out[i, X, Y, Z] = sum_c E[X-dxc, Y-dyc, Z-dzc] *
    sum_{b,j} ke[3c+i, 3b+j] * u[j, X-dxc+dxb, Y-dyc+dyb, Z-dzc+dzb].

    Node-centric accumulation; element quantities live on the (BX, BYP, NZP)
    zero-padded element tile.  Tile-local roll wrap-around and the u rows
    beyond BY+1 (which hold the NEXT tile's data) are all killed by the
    zero rows/cols of the padded scale tile.
    """
    bx = pl.program_id(0)
    by = pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[:, pl.ds(bx * BX, BX + 1), pl.ds(by * BY, BYP), :],
        u_blk, sem)
    dma.start()

    # Sub-32-bit storage (mg_cycle_dtype="bfloat16") upcasts to fp32 for the
    # in-kernel compute: Mosaic's roll is "not implemented" for non-32-bit
    # data, and fp32 VPU FMAs cost the same — the HBM traffic (u, scale,
    # out) stays bf16, which is the whole win.  32/64-bit storage computes
    # natively (the fp64 interpret-mode parity tests depend on it).
    cdt = _compute_dtype(u_blk.dtype)
    # Two pure accumulators per component (x-corner offset dxc in {0, 1});
    # Mosaic has no in-kernel scatter-add, so dynamic-slice .at[].add on
    # VALUES is out — plain adds here, static ref stores at the end.
    acc = [[jnp.zeros((BX, BYP, NZP), cdt) for _ in range(2)]
           for _ in range(3)]
    dma.wait()

    scale = scale_ref[0, 0].astype(cdt)                # (BX, BYP, NZP)
    # E_c = scale shifted so that index Y holds E at element (Y - dyc):
    # 4 (dyc, dzc) variants; the x shift is a free leading-dim slice.
    E = {(dy, dz): _roll2(scale, dy, dz) for dy in (0, 1) for dz in (0, 1)}
    u = [u_blk[j].astype(cdt) for j in range(3)]       # (BX+1, BYP, NZP)

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
    zplane = jnp.zeros((1, BYP, NZP), cdt)
    for i in range(3):
        lo = jnp.concatenate([acc[i][0], zplane], axis=0)   # (BX+1, ...)
        hi = jnp.concatenate([zplane, acc[i][1]], axis=0)
        out_ref[0, 0, i] = (lo + hi).astype(u_blk.dtype)


def _tile_geometry(grid, block):
    BX, BY = block
    nx, ny, nz = grid.nels
    if nx % BX or ny % BY:
        raise ValueError(f"grid {grid.nels} does not tile into ({BX},{BY})")
    if BY < ny and BY % 8:
        raise ValueError(f"BY={BY} must be a multiple of 8 when blocking y")
    nbx, nby = nx // BX, ny // BY
    BYP = _round_up(BY + 1, 8)
    NYG = (nby - 1) * BY + BYP          # u rows incl. per-tile DMA padding
    NZP = _round_up(nz + 1, 128)
    return nbx, nby, BYP, NYG, NZP


def _pad_u_soa(u, nnx, NYG, NZP, nny, nnz, dtype):
    u_soa = jnp.zeros((3, nnx, NYG, NZP), dtype)
    return u_soa.at[:, :, :nny, :nnz].set(jnp.transpose(u, (3, 0, 1, 2)))


def make_pallas_matvec(op, block=8, interpret=False):
    """Build a fused matvec for `op` (a VoxelOperator).

    Returns fn(u, scale) -> K u with u, out as (nnx, nny, nnz, 3) fields
    (the framework's public node layout; the SoA transposes and (8,128)
    padding happen at the boundary and fuse into neighboring XLA ops).
    """
    grid = op.grid
    block = _normalize_block(grid, block)
    BX, BY = block
    nx, ny, nz = grid.nels
    nbx, nby, BYP, NYG, NZP = _tile_geometry(grid, block)
    nnx, nny, nnz = grid.nnodes_per_axis
    dtype = op.dtype
    ke = np.asarray(op.ke, dtype=np.float64)

    kernel = functools.partial(_kernel, ke=ke, BX=BX, BY=BY, BYP=BYP,
                               NZP=NZP)

    call = pl.pallas_call(
        kernel,
        grid=(nbx, nby),
        in_specs=[
            pl.BlockSpec((1, 1, BX, BYP, NZP), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # u stays in HBM (the kernel DMAs halo slabs itself); ANY let the
            # compiler attempt a VMEM placement for the in-graph intermediate,
            # which faulted at 128^3.
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, 3, BX + 1, BYP, NZP),
                               lambda i, j: (i, j, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbx, nby, 3, BX + 1, BYP, NZP),
                                       dtype),
        scratch_shapes=[
            pltpu.VMEM((3, BX + 1, BYP, NZP), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # large grids need > the 16MB default scoped-vmem budget for the
            # halo slab + accumulators; v5e/v5p have far more physical VMEM
            vmem_limit_bytes=_vmem_limit_bytes(),
        ),
        interpret=interpret,
    )

    def matvec(u, scale):
        # public layout -> padded SoA
        u_soa = _pad_u_soa(u, nnx, NYG, NZP, nny, nnz, dtype)
        scale_p = jnp.zeros((nbx, nby, BX, BYP, NZP), dtype)
        scale_p = scale_p.at[:, :, :, :BY, :nz].set(
            scale.reshape(nbx, BX, nby, BY, nz).transpose(0, 2, 1, 3, 4))

        partial = call(scale_p, u_soa)   # (nbx, nby, 3, BX+1, BYP, NZP)

        # Reassemble: interior block + one-plane overlaps in x, in y, and
        # the (x, y) corner line, each a strided add.
        NYO = nby * BY + 1
        out = jnp.zeros((3, nnx, NYO, NZP), dtype)
        ii = partial[:, :, :, :BX, :BY]
        out = out.at[:, : nbx * BX, : nby * BY].add(
            ii.transpose(2, 0, 3, 1, 4, 5).reshape(3, nbx * BX, nby * BY,
                                                   NZP))
        ei = partial[:, :, :, BX, :BY]   # x edge plane -> global (i+1)*BX
        out = out.at[:, BX::BX, : nby * BY].add(
            ei.transpose(2, 0, 1, 3, 4).reshape(3, nbx, nby * BY, NZP))
        ie = partial[:, :, :, :BX, BY]   # y edge row -> global (j+1)*BY
        out = out.at[:, : nbx * BX, BY::BY].add(
            ie.transpose(2, 0, 3, 1, 4).reshape(3, nbx * BX, nby, NZP))
        ee = partial[:, :, :, BX, BY]    # (x, y) corner line
        out = out.at[:, BX::BX, BY::BY].add(ee.transpose(2, 0, 1, 3))
        return jnp.transpose(out[:, :, :nny, :nnz], (1, 2, 3, 0))

    return matvec


def _energies_kernel(u_hbm, out_ref, u_blk, sem, *, ke, BX, BY, BYP, NZP):
    """One (x, y) tile of w[X, Y, Z] = u_e^T ke u_e =
    sum_{c,b,i,j} ke[3c+i, 3b+j] * u[i, X+dxc, Y+dyc, Z+dzc]
                                 * u[j, X+dxb, Y+dyb, Z+dzb].

    Element-centric: only forward (+0/+1) corner shifts, expressed as
    negative rolls; ke symmetry halves the FMA count (c<=b with factor 2
    off the block diagonal).  Rows >= BY compute garbage from roll wraps /
    next-tile u rows and are sliced away by the caller.
    """
    bx = pl.program_id(0)
    by = pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[:, pl.ds(bx * BX, BX + 1), pl.ds(by * BY, BYP), :],
        u_blk, sem)
    dma.start()
    cdt = _compute_dtype(u_blk.dtype)  # see _kernel: roll needs >=32-bit
    acc = jnp.zeros((BX, BYP, NZP), cdt)
    dma.wait()

    u = [u_blk[j].astype(cdt) for j in range(3)]
    # V[(dy, dz)][j]: row Y holds u_j[Y + dy], col Z holds col Z + dz.
    V = {(dy, dz): [_roll2(u[j], -dy, -dz) for j in range(3)]
         for dy in (0, 1) for dz in (0, 1)}

    for c, (dxc, dyc, dzc) in enumerate(HEX_CORNERS):
        uc = V[(dyc, dzc)]
        for b in range(c, 8):
            dxb, dyb, dzb = HEX_CORNERS[b]
            ub = V[(dyb, dzb)]
            for i in range(3):
                for j in range(3):
                    if b == c and j < i:
                        continue
                    coeff = float(ke[3 * c + i, 3 * b + j])
                    if coeff == 0.0:
                        continue
                    if not (b == c and i == j):
                        coeff = 2.0 * coeff
                    acc = acc + coeff * (uc[i][dxc : dxc + BX]
                                         * ub[j][dxb : dxb + BX])
    out_ref[0, 0] = acc.astype(u_blk.dtype)


def make_pallas_energies(op, block, interpret=False):
    """Build fn(u) -> u_e^T ke u_e per element, shape (nx, ny, nz) — the
    fused replacement for VoxelOperator.element_energies_unit's
    gather + (N,24)@(24,24) matmul + reduce (~19 ms of HBM traffic at
    128^3)."""
    grid = op.grid
    block = _normalize_block(grid, block)
    BX, BY = block
    nx, ny, nz = grid.nels
    nbx, nby, BYP, NYG, NZP = _tile_geometry(grid, block)
    nnx, nny, nnz = grid.nnodes_per_axis
    dtype = op.dtype
    ke = np.asarray(op.ke, dtype=np.float64)

    kernel = functools.partial(_energies_kernel, ke=ke, BX=BX, BY=BY,
                               BYP=BYP, NZP=NZP)

    call = pl.pallas_call(
        kernel,
        grid=(nbx, nby),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 1, BX, BYP, NZP),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbx, nby, BX, BYP, NZP), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, BX + 1, BYP, NZP), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(),
        ),
        interpret=interpret,
    )

    def energies(u):
        u_soa = _pad_u_soa(u, nnx, NYG, NZP, nny, nnz, dtype)
        partial = call(u_soa)            # (nbx, nby, BX, BYP, NZP)
        w = partial[:, :, :, :BY, :nz]
        return w.transpose(0, 2, 1, 3, 4).reshape(nx, ny, nz)

    return energies
