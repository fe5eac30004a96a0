"""27-point block node stencils and Galerkin (RAP) coarsening.

The assembled voxel stiffness K couples each node to its 27 neighbors
(including itself) through 3x3 blocks; as an array this is a field of
coefficients C_o(n) in R^{3x3}, one per offset o in {-1,0,1}^3:

    (K u)(n) = sum_o C_o(n) @ u(n + o),
    C_o(n)   = sum_{a, a+o in corners} E(n - a) * KE[a, a+o]

with KE[a, b] the 3x3 block of the unit-modulus element stiffness for local
corners a, b (ops/elements.py HEX_CORNERS order).

Storage layout (TPU-critical): C is (3, 3, 3, 3, 3, nnx, nny, nnz) =
[ox+1, oy+1, oz+1, i, j, x, y, z] — 243 SCALAR coefficient fields with the
SPATIAL dims minor.  The apply is then 243 elementwise multiply-adds over
spatial-minor fields, which tiles perfectly onto the VPU's (8, 128) lanes.
The round-3 first cut stored blocks minor — (..., nnx, nny, nnz, 3, 3) with
einsum('...ij,...j->...i') applies — and measured 27 ms per level-1 apply at
128^3 on the TPU (the (3, 3)-minor layout defeats tiling entirely); this
layout exists to fix that.

Why this module exists: the multigrid coarse operators.  Rediscretizing
coarse levels with arithmetically-averaged moduli (ops/multigrid.py round
1-2) loses the fine void/solid interfaces, and CG grows 10 -> 34+ iterations
as the SIMP contrast develops (the reference's CHOLMOD direct solve at
src/Optimization/Optimization.jl:317 has no such growth — this is the gap
that closes it).  The variational (Galerkin) coarse operator A_c = P^T A P
with the trilinear prolongation P is again a 27-point block stencil on the
coarse node grid, computable field-wise:

  * levels 1-3 come straight from the FINE element modulus field, each
    through one stride-2^k kernel-(2^{k+1})^3 im2col + MXU matmul
    (`level_stencil_from_scale`, weights host-composed by
    `compose_level_weights`) — the fine stencil (243 fields at fine
    resolution, ~2 GB at 128^3) is never materialized, and neither is the
    on-device RAP chain over the 267 MB level-1 tensor (which measured
    255 ms/SIMP iteration at 128^3 before the direct builds);
  * deeper (tiny) levels coarsen stencil -> stencil by the axis-separable
    RAP (`coarsen_stencil_axis`), exact because the trilinear P factors
    per axis.

Everything here is jit-safe: offsets/weights are static Python, fields are
jnp arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .elements import HEX_CORNERS

__all__ = [
    "ke_corner_blocks",
    "assemble_node_stencil",
    "fold_bc_into_stencil",
    "apply_stencil",
    "stencil_diagonal",
    "stencil_row_abs_sums",
    "coarsen_stencil_axis",
    "coarsen_stencil",
    "level1_weights",
    "level1_stencil_from_scale",
    "stencil_to_dense",
]

_CORNER_INDEX = {c: i for i, c in enumerate(HEX_CORNERS)}
_OFF = (-1, 0, 1)


def _p1(d: int) -> float:
    """1-D trilinear prolongation weight at node distance d (in fine nodes):
    fine node 2N+d receives weight p1(d) from coarse node N."""
    return 1.0 if d == 0 else 0.5


def ke_corner_blocks(ke) -> np.ndarray:
    """(8, 8, 3, 3) corner-pair blocks of the 24x24 element stiffness."""
    ke = np.asarray(ke, dtype=np.float64)
    return ke.reshape(8, 3, 8, 3).transpose(0, 2, 1, 3)


def _valid_corner_pairs(o):
    """Corner offsets a with both a and a+o in {0,1}^3 (per-axis)."""
    out = []
    for a in HEX_CORNERS:
        b = (a[0] + o[0], a[1] + o[1], a[2] + o[2])
        if b in _CORNER_INDEX:
            out.append((a, b))
    return out


def assemble_node_stencil(scale, ke):
    """Element modulus field (nx, ny, nz) -> node stencil
    (3, 3, 3, 3, 3, nnx, nny, nnz); C[ox+1, oy+1, oz+1, i, j] is the (i, j)
    entry of C_o as a spatial field.

    Boundary behavior: offsets pointing outside the grid get exactly-zero
    coefficients (the zero-padded scale kills them), so `apply_stencil`
    needs no boundary cases.  Matches the scipy-assembled K
    (tests/test_stencil.py).
    """
    KE = ke_corner_blocks(ke)
    nx, ny, nz = scale.shape
    sp = jnp.pad(scale, 1)
    rows = []
    for ox in _OFF:
        for oy in _OFF:
            for oz in _OFF:
                acc = None
                for a, b in _valid_corner_pairs((ox, oy, oz)):
                    blk = jnp.asarray(
                        KE[_CORNER_INDEX[a], _CORNER_INDEX[b]],
                        dtype=scale.dtype)
                    sl = sp[1 - a[0]: 2 - a[0] + nx,
                            1 - a[1]: 2 - a[1] + ny,
                            1 - a[2]: 2 - a[2] + nz]
                    term = blk[:, :, None, None, None] * sl[None, None]
                    acc = term if acc is None else acc + term
                rows.append(acc)
    C = jnp.stack(rows)
    return C.reshape(3, 3, 3, *C.shape[1:])


def _shifted_views(fp, shape3):
    """All 27 shifted views of a once-padded leading-batched field
    fp = pad(f, [(0,0), (1,1), (1,1), (1,1)]); returns the [o...]-stacked
    (3, 3, 3, B, nnx, nny, nnz) array of f(n + o)."""
    nnx, nny, nnz = shape3
    views = [
        fp[:, 1 + ox: 1 + ox + nnx, 1 + oy: 1 + oy + nny,
           1 + oz: 1 + oz + nnz]
        for ox in _OFF for oy in _OFF for oz in _OFF
    ]
    return jnp.stack(views).reshape(3, 3, 3, *views[0].shape)


def fold_bc_into_stencil(C, free_mask):
    """Fold homogeneous Dirichlet masking into the stencil:

        C_o(n)[i, j] *= m(n)[i] * m(n+o)[j];   C_0(n)[i, i] += 1 - m(n)[i]

    so `apply_stencil(C, u)` IS the masked SPD operator M K M + (I - M) —
    identical to VoxelOperator.apply (ops/operator.py:137-139) on the free
    subspace, with no separate mask multiplications in the hot path.
    """
    nnx, nny, nnz = free_mask.shape[:3]
    m = jnp.moveaxis(free_mask, -1, 0)                 # (3, nnx, nny, nnz)
    mp = jnp.pad(m, ((0, 0), (1, 1), (1, 1), (1, 1)))
    shifted = _shifted_views(mp, (nnx, nny, nnz))      # [o..., j, spatial]
    C = C * m[None, None, None, :, None] * shifted[:, :, :, None]
    eye = jnp.eye(3, dtype=C.dtype)
    C = C.at[1, 1, 1].add(eye[:, :, None, None, None]
                          * (1.0 - m)[:, None])
    return C


def apply_stencil(C, u):
    """(K u)(n) = sum_o C_o(n) @ u(n + o); u is (nnx, nny, nnz, 3).

    243 elementwise multiply-adds over spatial-minor fields — pure VPU work
    with no layout changes (the im2col/einsum alternatives relayout the
    (3, 3) block dims and measured 27 ms/apply at 128^3 level 1 on TPU vs
    the HBM-bandwidth cost of ~2 ms for this form)."""
    nnx, nny, nnz = u.shape[:3]
    uf = jnp.moveaxis(u, -1, 0)                        # (3, nnx, nny, nnz)
    up = jnp.pad(uf, ((0, 0), (1, 1), (1, 1), (1, 1)))
    comps = []
    for i in range(3):
        acc = None
        for ox in _OFF:
            for oy in _OFF:
                for oz in _OFF:
                    for j in range(3):
                        us = up[j, 1 + ox: 1 + ox + nnx,
                                1 + oy: 1 + oy + nny,
                                1 + oz: 1 + oz + nnz]
                        term = C[ox + 1, oy + 1, oz + 1, i, j] * us
                        acc = term if acc is None else acc + term
        comps.append(acc)
    return jnp.stack(comps, axis=-1)


def stencil_diagonal(C):
    """diag of the operator as a node field (nnx, nny, nnz, 3)."""
    return jnp.stack([C[1, 1, 1, i, i] for i in range(3)], axis=-1)


def stencil_row_abs_sums(C):
    """sum_j |K_ij| per row as a node field — Gershgorin data."""
    return jnp.moveaxis(jnp.sum(jnp.abs(C), axis=(0, 1, 2, 4)), 0, -1)


def coarsen_stencil_axis(C, axis: int):
    """1-D Galerkin coarsening along one spatial axis.

    The trilinear P factors as P = Px Py Pz, so RAP factors into three 1-D
    RAPs.  Along one axis with fine offsets o, coarse offsets O, and fine
    sampling positions 2N + d:

        C'[O](N) = sum_{d, o : |d + o - 2O| <= 1} p1(d) p1(d+o-2O) C[o](2N+d)

    The fine node count along `axis` must be odd (element count even —
    guaranteed by the multigrid `_can_coarsen` gate).
    """
    sdim = 5 + axis
    nf = C.shape[sdim]
    if nf % 2 != 1:
        raise ValueError(f"fine node count {nf} along axis {axis} must be odd")
    nc = (nf - 1) // 2 + 1
    # Move the strided spatial axis to the FRONT and stride on the leading
    # dim (the `_restrict_axis` pattern, ops/multigrid.py).  NOT slice_in_dim
    # on an interior dim of the rank-8 tensor: that form MISCOMPILES on TPU
    # when the input carries an in-program (transpose-fused) layout —
    # deterministically wrong coarse stencils, correct when the same slice
    # runs in its own program (round-3 root cause of the 128^3 NaN solves).
    Cm = jnp.moveaxis(C, sdim, 0)
    Cm = jnp.pad(Cm, [(1, 1)] + [(0, 0)] * (Cm.ndim - 1))
    odim = 1 + axis        # the `axis` offset dim, shifted by the moveaxis
    targets = []
    for O in _OFF:
        acc = None
        for d in _OFF:
            for o in _OFF:
                t = d + o - 2 * O
                if abs(t) > 1:
                    continue
                w = _p1(d) * _p1(t)
                piece = lax.index_in_dim(Cm, o + 1, axis=odim, keepdims=False)
                piece = piece[d + 1: d + 2 * nc: 2]     # leading-dim stride
                term = w * piece
                acc = term if acc is None else acc + term
        # spatial axis back home; one offset dim was dropped above, so its
        # target position is sdim - 1 in the rank-7 accumulator
        targets.append(jnp.moveaxis(acc, 0, sdim - 1))
    return jnp.stack(targets, axis=axis)


def coarsen_stencil(C):
    """Full factor-2 Galerkin coarsening: RAP along all three axes."""
    for axis in range(3):
        C = coarsen_stencil_axis(C, axis)
    return C


def level1_weights(ke) -> np.ndarray:
    """Host-side (numpy, float64) weights G for the fused fine-scale ->
    level-1 Galerkin stencil map:

        C1_O(N) = sum_{s in {-2..1}^3} G[O, s] * E_fine(2N + s)

    obtained by composing the assembly map (C0 from E) with the three-axis
    RAP and collecting terms by the element shift s = d - a:

        G[O, s] = sum_{d, o, a : d - a = s, a+o in corners, |d+o-2O| <= 1}
                    p(d) p(d + o - 2O) KE[a, a + o]

    Returns (3, 3, 3, 4, 4, 4, 3, 3): [O+1][s+2][i, j].
    """
    KE = ke_corner_blocks(ke)
    G = np.zeros((3, 3, 3, 4, 4, 4, 3, 3), dtype=np.float64)
    offs3 = [(x, y, z) for x in _OFF for y in _OFF for z in _OFF]
    for d in offs3:
        pd = _p1(d[0]) * _p1(d[1]) * _p1(d[2])
        for o in offs3:
            for a, b in _valid_corner_pairs(o):
                blk = KE[_CORNER_INDEX[a], _CORNER_INDEX[b]]
                s = (d[0] - a[0], d[1] - a[1], d[2] - a[2])
                for O in offs3:
                    t = (d[0] + o[0] - 2 * O[0],
                         d[1] + o[1] - 2 * O[1],
                         d[2] + o[2] - 2 * O[2])
                    if max(abs(t[0]), abs(t[1]), abs(t[2])) > 1:
                        continue
                    w = pd * _p1(t[0]) * _p1(t[1]) * _p1(t[2])
                    G[O[0] + 1, O[1] + 1, O[2] + 1,
                      s[0] + 2, s[1] + 2, s[2] + 2] += w * blk
    return G


def compose_level_weights(G, k):
    """Host-side (numpy, float64) composition: level-k Galerkin weights ->
    level-(k+1) weights, by pushing the three axis-separable 1-D RAPs
    through the linear map C_k = G_k * E_fine:

        C_{k+1}[O'](N') = sum_{d,o: |d+o-2O'|<=1} p(d) p(d+o-2O')
                          C_k[o](2N' + d)
        =>  G_{k+1}[O', s'] += p(d) p(d+o-2O') G_k[o, s' - 2^k d]

    per axis, with s' = 2^k d + s spanning [-2^{k+1}, 2^{k+1}-1] (kernel
    size doubles per level: 4, 8, 16, ...).  This is what makes the DIRECT
    per-level stencil build possible: every coarse level is one stride-2^k
    im2col matmul straight from the fine modulus field, replacing the
    on-device RAP chain whose full-tensor moveaxis/pad/slice passes over
    the 267 MB level-1 stencil measured 255 ms per SIMP iteration at 128^3
    (the RAP itself stays for levels past `direct` and for tests)."""
    half = 1 << k
    for axis in range(3):
        Kk = G.shape[3 + axis]
        shp = list(G.shape)
        shp[3 + axis] = 2 * Kk
        out = np.zeros(shp, G.dtype)
        for O in _OFF:
            for d in _OFF:
                for o in _OFF:
                    t = d + o - 2 * O
                    if abs(t) > 1:
                        continue
                    w = _p1(d) * _p1(t)
                    oi = [slice(None)] * 8
                    oi[axis] = O + 1
                    oi[3 + axis] = slice(half * (d + 1), half * (d + 1) + Kk)
                    gi = [slice(None)] * 8
                    gi[axis] = o + 1
                    out[tuple(oi)] += w * G[tuple(gi)]
        G = out
    return G


def level_stencil_from_scale(scale, G, level, precision=lax.Precision.HIGHEST,
                             out_dtype=None, x_chunks=1):
    """Direct fine element moduli (nx, ny, nz) -> level-`level` Galerkin
    stencil (3, 3, 3, 3, 3, ncx+1, ncy+1, ncz+1), one stride-2^level
    kernel-(2^{level+1})^3 im2col + ONE MXU matmul.

    The im2col is built by per-axis GROUPED RESHAPE + two-shift concat (not
    K^3 enumerated slices — at level 3 that would be 4096 slice ops in the
    graph): pad by 2^level per side, reshape each axis into (n_coarse+1,
    stride) groups, and concatenate the group with its successor to form
    the kernel windows.  G is level1_weights composed (level-1) times
    through compose_level_weights.

    out_dtype / x_chunks bound the HBM transient for narrow-storage
    hierarchies (params.mg_stencil_dtype): the matmul still runs at the
    scale dtype and `precision` (identical values), but each of x_chunks
    x-slabs is cast to out_dtype as it is produced, so the full-size
    fp32 coefficient tensor (2.1 GB at 256^3 level 1) never materializes
    — only one fp32 slab plus the narrow result.  Defaults reproduce the
    single full-precision matmul bit-for-bit."""
    stride = 1 << level
    K = 2 * stride
    nx, ny, nz = scale.shape
    if any(n % stride for n in (nx, ny, nz)):
        raise ValueError(f"fine element counts {scale.shape} must divide "
                         f"the level-{level} stride {stride}")
    dt = scale.dtype
    ncn = (nx // stride + 1, ny // stride + 1, nz // stride + 1)
    sp = jnp.pad(scale, stride)        # (nx + 2*stride, ...) = stride*(ncn+1)
    X = sp.reshape(ncn[0] + 1, stride, ncn[1] + 1, stride, ncn[2] + 1, stride)
    X = jnp.concatenate([X[:-1], X[1:]], axis=1)          # (ncnx, K, ...)
    X = jnp.concatenate([X[:, :, :-1], X[:, :, 1:]], axis=3)
    X = jnp.concatenate([X[:, :, :, :, :-1], X[:, :, :, :, 1:]], axis=5)
    Gm = jnp.asarray(
        G.transpose(0, 1, 2, 6, 7, 3, 4, 5).reshape(27 * 9, K ** 3),
        dtype=dt)
    if x_chunks <= 1:
        S = jnp.transpose(X, (1, 3, 5, 0, 2, 4)).reshape(K ** 3, -1)
        out = jnp.dot(Gm, S, precision=precision)         # (243, n_nodes)
        if out_dtype is not None:
            out = out.astype(out_dtype)
        return out.reshape(3, 3, 3, 3, 3, *ncn)
    S3 = jnp.transpose(X, (1, 3, 5, 0, 2, 4)).reshape(
        K ** 3, ncn[0], ncn[1] * ncn[2])
    slab = -(-ncn[0] // x_chunks)
    outs = []
    for s in range(0, ncn[0], slab):
        o = jnp.dot(Gm, S3[:, s:s + slab].reshape(K ** 3, -1),
                    precision=precision)
        outs.append(o if out_dtype is None else o.astype(out_dtype))
    out = jnp.concatenate(outs, axis=1)
    return out.reshape(3, 3, 3, 3, 3, *ncn)


def level1_stencil_from_scale(scale, G, precision=lax.Precision.HIGHEST):
    """Fine element moduli (nx, ny, nz) -> level-1 Galerkin stencil
    (3, 3, 3, 3, 3, ncx+1, ncy+1, ncz+1): stack the 64 stride-2 shifted
    views of the (zero-padded) scale field, then ONE (243, 64) @
    (64, n_coarse_nodes) MXU matmul against the precomputed weight matrix —
    the im2col form of a stride-2 4^3-kernel conv, oriented so the result
    lands DIRECTLY in the coefficient-major spatial-minor storage layout
    (no 267 MB post-transpose).

    NOT lax.conv on purpose: on TPU, the 243-channel conv fused into the
    same XLA program as the downstream strided-slice RAP ops miscompiled
    (deterministically wrong coarse diagonals, correct when split into two
    programs — root-caused round 3); dot_general + slices lower cleanly.

    G is `level1_weights(ke)`.  Fine element counts must be even.
    """
    nx, ny, nz = scale.shape
    if nx % 2 or ny % 2 or nz % 2:
        raise ValueError(f"fine element counts {scale.shape} must be even")
    dt = scale.dtype
    ncnx, ncny, ncnz = nx // 2 + 1, ny // 2 + 1, nz // 2 + 1
    sp = jnp.pad(scale, 2)                             # (nx+4, ny+4, nz+4)
    views = []
    for sx in range(4):
        for sy in range(4):
            for sz in range(4):
                views.append(sp[sx: sx + 2 * ncnx - 1: 2,
                                sy: sy + 2 * ncny - 1: 2,
                                sz: sz + 2 * ncnz - 1: 2])
    S = jnp.stack(views).reshape(64, -1)               # (64, n_coarse_nodes)
    # weights [oc, s] with oc = (O-major, i, j), s = (sx, sy, sz)
    Gm = jnp.asarray(
        G.transpose(0, 1, 2, 6, 7, 3, 4, 5).reshape(27 * 9, 4 * 4 * 4),
        dtype=dt)
    out = jnp.dot(Gm, S, precision=precision)          # (243, n_nodes)
    return out.reshape(3, 3, 3, 3, 3, ncnx, ncny, ncnz)


def level_stencil_diag_from_scale(scale, G, level,
                                  precision=lax.Precision.HIGHEST):
    """Exact FULL-PRECISION operator diagonal of the level-`level` Galerkin
    stencil as a node field (ncnx, ncny, ncnz, 3), without materializing
    the full coefficient tensor: the diagonal is the three (O=(1,1,1),
    i==i) rows of the same im2col matmul `level_stencil_from_scale` runs,
    so this is a (3, K^3) @ (K^3, n_nodes) mini-matmul whose im2col
    operand XLA CSEs with the main build's.  Used by narrow-storage
    hierarchies (params.mg_stencil_dtype): the SMOOTHER data (Chebyshev
    diagonal scaling, lambda estimation) keeps full precision while the
    243-coefficient storage is bfloat16 — measured CG 71 vs 45 at 16x8x4
    contrast when the diagonal was bf16-rounded too."""
    stride = 1 << level
    K = 2 * stride
    nx, ny, nz = scale.shape
    dt = scale.dtype
    ncn = (nx // stride + 1, ny // stride + 1, nz // stride + 1)
    sp = jnp.pad(scale, stride)
    X = sp.reshape(ncn[0] + 1, stride, ncn[1] + 1, stride, ncn[2] + 1, stride)
    X = jnp.concatenate([X[:-1], X[1:]], axis=1)
    X = jnp.concatenate([X[:, :, :-1], X[:, :, 1:]], axis=3)
    X = jnp.concatenate([X[:, :, :, :, :-1], X[:, :, :, :, 1:]], axis=5)
    S = jnp.transpose(X, (1, 3, 5, 0, 2, 4)).reshape(K ** 3, -1)
    Gm = jnp.asarray(
        G.transpose(0, 1, 2, 6, 7, 3, 4, 5).reshape(27 * 9, K ** 3),
        dtype=dt)
    rows = [((1 * 3 + 1) * 3 + 1) * 9 + i * 3 + i for i in range(3)]
    out = jnp.dot(Gm[jnp.asarray(rows)], S, precision=precision)  # (3, N)
    return jnp.moveaxis(out.reshape(3, *ncn), 0, -1)


def stencil_to_dense(C):
    """Stencil -> dense (3n, 3n) matrix, nodes flattened in C order
    (iz fastest) with dof = 3 * node + component.  For the multigrid
    coarsest-level Cholesky (a few thousand dofs).

    ONE flat 1-D scatter-add with STATIC (host-precomputed) indices — the
    same op shape as the proven rediscretized coarsest assembly
    (ops/multigrid.py _coarsest_factor).  The first cut's 27 separate
    block scatter-adds with 3-D advanced indexing were the op class that
    faulted the tunnel TPU (round-3 gal_cho isolation)."""
    nnx, nny, nnz = C.shape[5:8]
    n = nnx * nny * nnz
    ids = np.arange(n).reshape(nnx, nny, nnz)
    flat_idx, vals = [], []
    for ox in _OFF:
        for oy in _OFF:
            for oz in _OFF:
                rx = slice(max(0, -ox), nnx - max(0, ox))
                ry = slice(max(0, -oy), nny - max(0, oy))
                rz = slice(max(0, -oz), nnz - max(0, oz))
                cx = slice(max(0, ox), nnx - max(0, -ox))
                cy = slice(max(0, oy), nny - max(0, -oy))
                cz = slice(max(0, oz), nnz - max(0, -oz))
                rows = ids[rx, ry, rz].reshape(-1)
                cols = ids[cx, cy, cz].reshape(-1)
                for i in range(3):
                    for j in range(3):
                        flat_idx.append((3 * rows + i) * (3 * n)
                                        + (3 * cols + j))
                        vals.append(
                            C[ox + 1, oy + 1, oz + 1, i, j][rx, ry, rz]
                            .reshape(-1))
    flat_idx = jnp.asarray(np.concatenate(flat_idx))
    vals = jnp.concatenate(vals)
    K = jnp.zeros(9 * n * n, dtype=C.dtype).at[flat_idx].add(vals)
    return K.reshape(3 * n, 3 * n)
