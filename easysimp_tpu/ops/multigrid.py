"""Geometric multigrid preconditioner on the voxel hierarchy.

The reference refactorizes a sparse Cholesky every SIMP iteration
(src/Optimization/Optimization.jl:317) — O(n^2)-ish fill-in that caps problem
size and has no TPU mapping.  Here the voxel structure gives a natural
geometric hierarchy: factor-2 coarsening of the element grid, trilinear
prolongation with its exact adjoint as restriction, Chebyshev (or damped
Jacobi) smoothing, and an EXACT dense Cholesky at the coarsest level (a few
hundred to a few thousand dofs) so the V-cycle is a fixed symmetric positive
linear operator — safe as a CG preconditioner.

Coarse operators (galerkin=True, the default): variational Galerkin
P^T A P stencils (ops/stencil.py) — the level-1 27-point block stencil comes
straight from the FINE modulus field via one stride-2 conv, deeper levels by
stencil RAP.  This is what keeps CG iteration counts flat as the SIMP
void/solid contrast develops (up to ~1e9 with Emin=1e-9): the round-1/2
alternative — rediscretized coarse operators with arithmetically-averaged
moduli (galerkin=False, kept for A/B) — smears the interfaces and CG grew
10 -> 34 iterations within 12 SIMP iterations at 128^3.

Everything runs inside jit: per-SIMP-iteration data (coarse stencils or
moduli, level diagonals, the coarsest dense factor) is recomputed on device
from the fine density field; only shapes, kes, and connectivity indices are
static.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..grids import VoxelGrid
from .operator import VoxelOperator
from .stencil import (
    apply_stencil,
    coarsen_stencil,
    compose_level_weights,
    fold_bc_into_stencil,
    level1_weights,
    level_stencil_diag_from_scale,
    level_stencil_from_scale,
    stencil_diagonal,
    stencil_row_abs_sums,
    stencil_to_dense,
)

__all__ = ["MultigridPreconditioner"]

def _max_coarse_dofs() -> int:
    """Stop coarsening once a dense solve is this cheap.  Env-tunable
    (EASYSIMP_MAX_COARSE_DOFS): at 128^3 the default stops at a 2187-dof
    coarsest whose per-SIMP-iteration scatter+Cholesky measured ~16 ms on
    the tunnel TPU; ~500 descends one more level (375 dofs), shrinking
    that ~8x for one extra (tiny) V-cycle level."""
    import os

    return int(os.environ.get("EASYSIMP_MAX_COARSE_DOFS", "4100"))


def _coarsen_counts(nels):
    return tuple(n // 2 for n in nels)


def _can_coarsen(nels):
    return all(n % 2 == 0 and n >= 2 for n in nels) and any(n > 2 for n in nels)


def _refine_axis(c, axis):
    """Trilinear refinement along one axis: (n+1) nodes -> (2n+1) nodes."""
    c = jnp.moveaxis(c, axis, 0)
    odd = 0.5 * (c[:-1] + c[1:])
    inter = jnp.stack([c[:-1], odd], axis=1).reshape((-1,) + c.shape[1:])
    out = jnp.concatenate([inter, c[-1:]], axis=0)
    return jnp.moveaxis(out, 0, axis)


def _restrict_axis(f, axis):
    """Exact adjoint of `_refine_axis`: (2n+1) -> (n+1)."""
    f = jnp.moveaxis(f, axis, 0)
    even = f[0::2]
    odd = f[1::2]                      # shape (n,)
    zeros = jnp.zeros_like(even[:1])
    up = jnp.concatenate([odd, zeros], axis=0)    # odd neighbor above even i
    down = jnp.concatenate([zeros, odd], axis=0)  # odd neighbor below even i
    out = even + 0.5 * (up + down)
    return jnp.moveaxis(out, 0, axis)


def prolong(xc):
    """Coarse node field (ncx+1, ncy+1, ncz+1, 3) -> fine (2ncx+1, ...)."""
    for axis in range(3):
        xc = _refine_axis(xc, axis)
    return xc


def restrict(xf):
    """Adjoint of `prolong` (verified by the adjoint identity test)."""
    for axis in range(3):
        xf = _restrict_axis(xf, axis)
    return xf


def coarsen_cells(scale, rule: str = "arithmetic"):
    """Coarsen an element field over 2x2x2 children (modulus coarsening).

    rule: "arithmetic" (round-1/2 default), "harmonic" (reciprocal mean of
    reciprocals — resolves stiff/soft interfaces the arithmetic mean smears
    at high SIMP contrast), or "mixed" (mean of both — the classical
    compromise between the arithmetic upper and harmonic lower bounds on
    the effective modulus).  All stay elementwise (no log/exp: TPU fault
    lore, memory/tpu-env-gotchas.md) and preserve positivity for E >= Emin.
    """
    nx, ny, nz = scale.shape
    blocks = scale.reshape(nx // 2, 2, ny // 2, 2, nz // 2, 2)
    arith = blocks.mean(axis=(1, 3, 5))
    if rule == "arithmetic":
        return arith
    harm = 1.0 / (1.0 / blocks).mean(axis=(1, 3, 5))
    if rule == "harmonic":
        return harm
    if rule == "mixed":
        return 0.5 * (arith + harm)
    raise ValueError(f"unknown coarsening rule {rule!r}")


def coarsen_mask(mask):
    """Node-mask injection: coarse node constrained iff its fine image is."""
    return mask[::2, ::2, ::2]


class MultigridPreconditioner:
    """Symmetric V-cycle preconditioner for the masked voxel operator."""

    def __init__(self, fine_op: VoxelOperator, levels: int = 0,
                 smooth_iters: int = 1, power_iters: int = 10,
                 refresh_iters: int = 2, cycle_dtype=None,
                 smoother: str = "chebyshev", galerkin: bool = True,
                 cycle: str = "v", coarsen: str = "arithmetic",
                 direct_stencils: bool = True, stencil_dtype=None):
        # smooth_iters: int (same Chebyshev degree everywhere) or a sequence
        # of per-level degrees (last entry repeats for deeper levels) —
        # stronger coarse smoothing buys W-cycle-like robustness at V-cycle
        # graph size (coarse matvecs are cheap; compile stays linear).
        if isinstance(smooth_iters, (tuple, list)):
            self.smooth_iters = tuple(int(s) for s in smooth_iters)
        else:
            self.smooth_iters = int(smooth_iters)
        if smoother not in ("jacobi", "chebyshev"):
            raise ValueError(f"unknown smoother {smoother!r}")
        if cycle not in ("v", "w"):
            raise ValueError(f"unknown cycle type {cycle!r}")
        self.smoother = smoother
        self.cycle = cycle
        self.galerkin = bool(galerkin)
        self.coarsen = coarsen
        # power_iters>0: estimate lambda_max by power iteration (~power_iters
        # matvecs/level); 0 uses the free Gershgorin bound, whose ~1.5-2x
        # overestimate costs CG iterations.  Measured on a realistic
        # mid-optimization 64^3 field, Chebyshev V(1,1) with power-estimated
        # lambda is the cheapest total-matvec configuration (see commit
        # history) — hence these defaults.
        #
        # refresh_iters: with a CARRIED power vector (stateful_factory), each
        # SIMP iteration only refreshes the estimate.  lambda_max of D^-1 A
        # drifts slowly under the 0.2 move limit: measured at 32x16x16, a
        # converged vector re-estimates to 95% of lambda_max after ONE
        # iteration on the perturbed operator (vs 53% for a cold start after
        # two), so 2 warm iterations + the 1.1 headroom replace the 10-per-
        # iteration cold estimates — cutting MG setup from ~60ms to ~12ms
        # per SIMP iteration at 128^3.
        self.power_iters = int(power_iters)
        self.refresh_iters = int(refresh_iters)
        self.dtype = fine_op.dtype
        # cycle_dtype: run the V-cycle interior (smoothing matvecs, transfer
        # ops) in a lower precision than the CG iteration — e.g. bfloat16.
        # A preconditioner only steers the search direction, so its rounding
        # costs a few CG iterations, while halving the HBM traffic of ~5/6 of
        # the solve.  None = same dtype as the operator.
        #
        # Measured history (128^3, tunnel v5e-lite): with the round-2
        # ELEMENT-kernel cycle (VPU-compute-bound applies) bf16 bought only
        # 13%/apply for +4% CG — not worth it.  With the round-3 GALERKIN
        # stencil cycle the V-cycle is FIELD-traffic-bound (restrict/
        # prolong/Chebyshev passes + 267 MB of level-1 coefficients), and
        # bf16 measured 25 -> 12.9 ms per CG iteration at iter-60 contrast
        # for +2 CG iterations — bench.py defaults to it on TPU.
        self.cycle_dtype = cycle_dtype
        # stencil_dtype: STORAGE dtype for the Galerkin stencil coefficient
        # fields only (e.g. bfloat16).  The level-1 stencil is 243 scalar
        # fields — 267 MB fp32 at 128^3 — and its read traffic dominates the
        # coarse half of every V-cycle; storing it narrow halves that while
        # the smoother arithmetic stays in the cycle dtype (bf16 * fp32
        # promotes to fp32, so apply_stencil upcasts in-register).  Setup
        # (diagonals, power refresh, coarsest Cholesky) always reads the
        # full-precision build.  None = cycle/operator dtype.
        self.stencil_dtype = stencil_dtype

        # Build the grid/operator hierarchy (static).
        self.ops = [fine_op]
        grid = fine_op.grid
        while _can_coarsen(grid.nels):
            nels = _coarsen_counts(grid.nels)
            spacing = tuple(2.0 * s for s in grid.spacing)
            grid = VoxelGrid(nels=nels, origin=grid.origin, spacing=spacing)
            self.ops.append(
                VoxelOperator(grid, E0=fine_op.E0, Emin=fine_op.Emin,
                              nu=fine_op.nu, p=fine_op.p, dtype=self.dtype)
            )
            coarse_dofs = 3 * grid.n_nodes
            if coarse_dofs <= _max_coarse_dofs():
                break
            if levels and len(self.ops) >= levels:
                break
        self.n_levels = len(self.ops)
        # Galerkin levels apply 27-point block stencils, not the element
        # operator — the fused element kernel is only needed at level 0.
        if not self.galerkin and \
                getattr(fine_op, "_fused_matvec", None) is not None:
            from .pallas_kernels import install_fused_matvec

            for o in self.ops[1:]:
                install_fused_matvec(o)
        if self.galerkin and self.n_levels > 1:
            # Host-precomputed fine-scale -> level-k RAP conv weights
            # (float64; cast at use).  With direct_stencils (default), the
            # weights are composed through level min(n_levels-1, 3) so those
            # stencils build DIRECTLY from the fine scale as one im2col
            # matmul each — the on-device RAP chain over the 267 MB level-1
            # tensor measured 255 ms/SIMP-iteration at 128^3, vs ~ms for
            # the matmuls.  Kernel size doubles per level (4^3 -> 8^3 ->
            # 16^3), so deeper levels (tiny tensors) keep the RAP.
            self._G1 = level1_weights(np.asarray(fine_op.ke,
                                                 dtype=np.float64))
            self._Gs = {1: self._G1}
            if direct_stencils:
                G = self._G1
                for k in range(1, min(self.n_levels - 1, 3)):
                    G = compose_level_weights(G, k)
                    self._Gs[k + 1] = G
        if self.cycle_dtype is not None:
            self.cycle_ops = [
                VoxelOperator(o.grid, E0=fine_op.E0, Emin=fine_op.Emin,
                              nu=fine_op.nu, p=fine_op.p,
                              dtype=self.cycle_dtype)
                for o in self.ops
            ]
            # The low-precision cycle operators need their own fused-kernel
            # installs (they are new instances; the kernel is dtype-generic):
            # otherwise every V-cycle matvec — the bulk of the solve — falls
            # back to the ~5x slower XLA gather path.
            if getattr(fine_op, "_fused_matvec", None) is not None:
                from .pallas_kernels import install_fused_matvec

                lvls = [self.cycle_ops[0]] if self.galerkin else self.cycle_ops
                for o in lvls:
                    install_fused_matvec(o)
        else:
            self.cycle_ops = self.ops

        # Dense-assembly indices for the coarsest level (static; used by the
        # rediscretized galerkin=False path).
        cg = self.ops[-1].grid
        conn = cg.hex_connectivity                       # (E, 8)
        dof = (3 * conn[:, :, None] + np.arange(3)).reshape(conn.shape[0], 24)
        self._rows = jnp.asarray(np.repeat(dof, 24, axis=1).reshape(-1))
        self._cols = jnp.asarray(np.tile(dof, (1, 24)).reshape(-1))
        self._coarse_ndofs = 3 * cg.n_nodes

    # ------------------------------------------------------------------
    def _scaled_cholesky(self, K, mask_flat=None):
        """Diagonally-scaled shifted Cholesky of a dense SPD matrix.

        Symmetric diagonal scaling BEFORE factorizing: SIMP contrast (up to
        ~1e9 between void and solid moduli) lives almost entirely in the
        diagonal; factoring D^-1/2 K D^-1/2 (unit diagonal) keeps the fp32
        Cholesky finite where the raw factorization produced NaNs on TPU.
        A small RELATIVE shift keeps it finite when the problem is positive
        SEMI-definite (e.g. the reference's 02_sliding_support load case
        leaves the Z translation unconstrained; its own runtests disable that
        example).  For loads orthogonal to the nullspace — the only
        well-posed case — the shift only perturbs the preconditioner, not
        the CG solution.
        """
        n = K.shape[0]
        if mask_flat is not None:
            K = mask_flat[:, None] * K * mask_flat[None, :]
            K = K + jnp.diag(1.0 - mask_flat)
        dinv_sqrt = 1.0 / jnp.sqrt(jnp.diagonal(K))
        Ks = K * dinv_sqrt[:, None] * dinv_sqrt[None, :]
        shift = 100.0 * jnp.finfo(self.dtype).eps
        Ks = Ks + shift * jnp.eye(n, dtype=self.dtype)
        return jax.scipy.linalg.cho_factor(Ks), dinv_sqrt

    def _coarsest_factor(self, scale_flat, mask_flat):
        """Dense BC-masked stiffness at the coarsest level + its Cholesky
        (rediscretized path)."""
        op = self.ops[-1]
        vals = (scale_flat[:, None, None] * op.ke[None]).reshape(-1)
        n = self._coarse_ndofs
        K = jnp.zeros((n, n), dtype=self.dtype).at[self._rows, self._cols].add(vals)
        return self._scaled_cholesky(K, mask_flat)

    def _hash_vector(self, lvl):
        """Deterministic pseudo-random start with broad spectral content.
        Integer Knuth-hash instead of sin(large x): TPU transcendentals are
        not accurate/finite for arguments ~1e7, which poisoned the omega
        estimate (and the whole V-cycle) with NaNs."""
        shape = (*self.ops[lvl].grid.nnodes_per_axis, 3)
        n = int(np.prod(shape))
        h = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
        v = (h >> 8).astype(self.dtype) / jnp.asarray(2.0**24, self.dtype) - 0.5
        return v.reshape(shape)

    def init_power_vectors(self):
        """Per-level start vectors for the carried power-iteration state."""
        return tuple(self._hash_vector(lvl) for lvl in range(self.n_levels))

    def _estimate_lambda_max(self, apply_fn, mask, diag, v, iters):
        """Power iteration on D^{-1} A (same spectrum as the symmetrized
        operator), warm-started from v.  The estimate feeds a fixed per-setup
        omega, so the resulting smoother — and hence M — stays LINEAR in the
        residual.  Returns (lam, final_normalized_vector).

        The body runs under `lax.fori_loop`, NOT a Python unroll.  This is
        a TPU-correctness requirement, not style: on narrow-storage
        hierarchies (mg_stencil_dtype=bfloat16) the plainly-unrolled
        8-10-iteration chain over the level-1/2 stencil apply deterministically
        MISCOMPILES on the tunnel TPU — iterations 0-7 produce finite fields
        and iterations 8-9 come back all-NaN from a finite input, while the
        same unroll with extra per-iteration reductions, and the fori_loop
        form, are both healthy (round-5 probes; the trigger is XLA's fusion
        choice across the tail of the unrolled chain, not the math).  The
        while-loop HLO also compiles the body once, which matters through
        the tunnel's minutes-per-program remote_compile."""
        tiny = jnp.finfo(self.dtype).tiny
        v = v * mask
        lam0 = jnp.asarray(1.0, self.dtype)
        if iters <= 0:
            return lam0, v

        def body(_, carry):
            v, _lam = carry
            w = apply_fn(v) / diag
            lam = jnp.sqrt(jnp.vdot(w, w) / jnp.maximum(jnp.vdot(v, v), tiny))
            v = w / jnp.maximum(jnp.sqrt(jnp.vdot(w, w)), tiny)
            return (v, lam)

        v, lam = jax.lax.fori_loop(0, iters, body, (v, lam0))
        return lam, v

    def _coarsen_fields(self, scale, free_mask):
        scales, masks = [scale], [free_mask]
        for lvl in range(1, self.n_levels):
            scales.append(coarsen_cells(scales[-1], self.coarsen))
            masks.append(coarsen_mask(masks[-1]))
        return scales, masks

    def _build_stencils(self, scale, masks):
        """Galerkin stencil per level >= 1 (None at level 0: the fine level
        smooths with the element operator / fused Pallas kernel).

        Stencils are UNFOLDED (no Dirichlet fold): folding re-streams the
        full coefficient tensor (267 MB at 128^3 level 1) once per level
        per SIMP iteration, while masking the APPLY touches only node
        fields ~80x smaller (`_masked_stencil_apply`).  Every cycle/setup
        input at a stencil level is pre-masked (restricted residuals and
        power vectors), for which mask*C*(mask v) == the folded operator
        exactly (the fold's (1-mask) identity term vanishes on masked
        input).  NOTE the deliberate fold-order deviation from the pure
        RAP chain: RAP levels inherit the finer stencil, masking happens
        per level at apply time — both SPD preconditioners; measured
        equal-to-better CG on the 48^3 trajectory study."""
        stencils = [None] * self.n_levels
        fp_diags = [None] * self.n_levels
        if not self.galerkin or self.n_levels < 2:
            return stencils, fp_diags
        # Narrow-storage hierarchies (stencil_dtype set) emit the storage
        # dtype DIRECTLY from the builds, x-chunked at level 1, so the
        # full-precision coefficient tensor never materializes — the fp32
        # level-1 transient alone (2.1 GB at 256^3) RESOURCE_EXHAUSTs the
        # tunnel TPU's usable HBM inside the one-program setup.  Deeper
        # RAP recursion upcasts per level (tiny tensors) to keep the
        # triple product itself at full precision.  The operator DIAGONAL
        # stays full-precision throughout (fp_diags): bf16-rounding the
        # Chebyshev diagonal scaling measured CG 71 vs 45 on the 16x8x4
        # contrast study, while bf16 243-coefficient STORAGE alone is the
        # measured-cheap knob.
        sd = self.stencil_dtype
        for lvl in range(1, self.n_levels):
            # The COARSEST level stays full-precision regardless: its
            # stencil feeds the dense Cholesky, and factorizing the
            # bf16-ROUNDED operator costs real CG (measured 71 vs 45 on
            # the 16x8x4 contrast study).  It is also the one tiny level
            # where narrow storage saves nothing.
            sd_l = sd if lvl < self.n_levels - 1 else None
            if lvl in self._Gs:
                n_coarse = (scale.shape[0] >> lvl) + 1
                chunks = 8 if (sd_l is not None and lvl == 1
                               and scale.size >= 8 * 1024 ** 2) else 1
                stencils[lvl] = level_stencil_from_scale(
                    scale, self._Gs[lvl], lvl, out_dtype=sd_l,
                    x_chunks=min(chunks, n_coarse))
                if sd_l is not None:
                    fp_diags[lvl] = level_stencil_diag_from_scale(
                        scale, self._Gs[lvl], lvl)
            else:
                prev = stencils[lvl - 1]
                if prev.dtype != scale.dtype:
                    prev = prev.astype(scale.dtype)
                st = coarsen_stencil(prev)
                if sd_l is not None:
                    fp_diags[lvl] = stencil_diagonal(st)
                stencils[lvl] = st if sd_l is None else st.astype(sd_l)
        return stencils, fp_diags

    @staticmethod
    def _masked_stencil_apply(stencil, mask, v):
        """Masked action of an UNFOLDED stencil: M C (M v).  Equal to the
        BC-folded stencil's action on masked inputs (the only inputs the
        cycle produces); the two mask passes cost ~3 MB of node-field
        traffic vs the 267 MB coefficient re-stream a per-iteration fold
        would take.

        Mixed-dtype inputs (narrow-storage stencil, full-precision field —
        the SETUP-side power estimation on mg_stencil_dtype hierarchies)
        run the apply ENTIRELY in the stencil's dtype and upcast the
        result: the storage dtype defines the operator's precision, and
        the all-narrow form avoids XLA promoting the 243-coefficient
        tensor to fp32 inside the apply (which would double the dominant
        coefficient stream — 267 MB at 128^3 level 1).  It is also the
        exact composition the production bf16 cycle runs, proven on TPU.
        (The round-5 narrow-setup NaN was a separate unroll-depth
        miscompile — see _estimate_lambda_max.)"""
        if stencil.dtype != v.dtype:
            mv = (mask * v).astype(stencil.dtype)
            return mask * apply_stencil(stencil, mv).astype(v.dtype)
        return mask * apply_stencil(stencil, mask * v)

    def _level_apply(self, lvl, scales, masks, stencils):
        """The level-`lvl` operator action used during SETUP (power
        iteration); cycle-time applies read from `state` via _apply_level."""
        if stencils[lvl] is not None:
            return lambda v: self._masked_stencil_apply(
                stencils[lvl], masks[lvl], v)
        op = self.ops[lvl]
        return lambda v: op.apply(v, scales[lvl], masks[lvl])

    def power_init(self, scale, free_mask):
        """Full (cold) power estimation on all levels; returns the converged
        vectors for the drivers to carry through the SIMP iterations.  Run
        ONCE before the loop (one small jitted program)."""
        scales, masks = self._coarsen_fields(scale, free_mask)
        stencils, fp_diags = self._build_stencils(scale, masks)
        vecs = []
        for lvl in range(self.n_levels):
            diag = (fp_diags[lvl] if fp_diags[lvl] is not None
                    else self._level_diag(lvl, scales, masks, stencils))
            _, v = self._estimate_lambda_max(
                self._level_apply(lvl, scales, masks, stencils), masks[lvl],
                diag, self._hash_vector(lvl), self.power_iters)
            vecs.append(v)
        return tuple(vecs)

    def power_init_split(self, scale, free_mask):
        """`power_init` as SEPARATE small device programs (host loop): one
        prep program (level fields/stencils, XLA-only) + one per-level power
        iteration.  Numerically the same estimation; operationally far more
        robust on the tunnel TPU, where the all-levels one-shot program is
        the single most fault-prone program class ("UNAVAILABLE: TPU device
        error" on first execution — round-2/3 flake data: 5-level one-shot
        0/3, small per-kernel programs 8/8).  The drivers use this."""
        prep = jax.jit(lambda s, m: self._prep_levels(s, m))
        scales, masks, stencils, fp_diags = prep(scale, free_mask)
        jax.block_until_ready(masks)
        vecs = []
        for lvl in range(self.n_levels):
            if stencils[lvl] is not None:
                fn = jax.jit(
                    lambda st, m, v, d, lvl=lvl: self._power_one_stencil(
                        lvl, st, m, v, d))
                v = fn(stencils[lvl], masks[lvl], self._hash_vector(lvl),
                       fp_diags[lvl])
            else:
                fn = jax.jit(
                    lambda s, m, v, lvl=lvl: self._power_one_op(lvl, s, m, v))
                v = fn(scales[lvl], masks[lvl], self._hash_vector(lvl))
            jax.block_until_ready(v)
            vecs.append(v)
        return tuple(vecs)

    def _prep_levels(self, scale, free_mask):
        scales, masks = self._coarsen_fields(scale, free_mask)
        stencils, fp_diags = self._build_stencils(scale, masks)
        return scales, masks, stencils, fp_diags

    def _power_one_op(self, lvl, scale_l, mask_l, v0):
        diag = self.ops[lvl].diagonal(scale_l, mask_l)
        op = self.ops[lvl]
        _, v = self._estimate_lambda_max(
            lambda w: op.apply(w, scale_l, mask_l), mask_l, diag, v0,
            self.power_iters)
        return v

    def _power_one_stencil(self, lvl, stencil_l, mask_l, v0, fp_diag=None):
        diag = fp_diag if fp_diag is not None else stencil_diagonal(stencil_l)
        _, v = self._estimate_lambda_max(
            lambda w: self._masked_stencil_apply(stencil_l, mask_l, w),
            mask_l, diag, v0, self.power_iters)
        return v

    def _level_diag(self, lvl, scales, masks, stencils):
        if stencils[lvl] is not None:
            return stencil_diagonal(stencils[lvl])
        return self.ops[lvl].diagonal(scales[lvl], masks[lvl])

    def setup(self, scale, free_mask, power_vectors=None):
        """Per-SIMP-iteration setup (inside jit): level moduli/stencils,
        masks, diagonals, smoother weights, coarsest factorization.

        power_vectors: carried per-level power-iteration state (see
        stateful_factory) — refreshed with `refresh_iters` iterations and a
        1.1 staleness headroom.  None = cold start from the hash vectors with
        the full `power_iters` (and the measured 1.05 headroom).

        Returns (state, new_power_vectors).
        """
        cold = power_vectors is None
        if cold:
            power_vectors = self.init_power_vectors()
        iters = self.power_iters if cold else self.refresh_iters
        headroom = 1.05 if cold else 1.1
        scales, masks = self._coarsen_fields(scale, free_mask)
        stencils, fp_diags = self._build_stencils(scale, masks)
        diags, omegas, lams, new_vecs = [], [], [], []
        for lvl in range(self.n_levels):
            diag = (fp_diags[lvl] if fp_diags[lvl] is not None
                    else self._level_diag(lvl, scales, masks, stencils))
            diags.append(diag)
            apply_fn = self._level_apply(lvl, scales, masks, stencils)
            if self.power_iters > 0:
                lam, v = self._estimate_lambda_max(
                    apply_fn, masks[lvl], diag, power_vectors[lvl], iters)
                lam = headroom * lam
                new_vecs.append(v)
            else:
                # Gershgorin: lam_max(D^-1 A) <= max_i rowabs_i / diag_i.
                if stencils[lvl] is not None:
                    # Unfolded rowabs upper-bound the masked operator's
                    # (|mask C mask|_row <= |C|_row entrywise) — a safe,
                    # possibly looser Chebyshev bound on this rare path.
                    rowabs = stencil_row_abs_sums(stencils[lvl])
                else:
                    rowabs = self.ops[lvl].row_abs_sums(scales[lvl],
                                                        masks[lvl])
                lam = jnp.max(rowabs / diag)
                new_vecs.append(power_vectors[lvl])
            lams.append(lam)
            # omega = 4/(3 lam): contraction ~1/3 on the upper half-spectrum
            # at the true lam_max, |1 - w*lam| < 1 everywhere below the bound.
            omegas.append(4.0 / (3.0 * lam))

        if stencils[-1] is not None:
            # Galerkin coarsest: fold BCs HERE (the one tiny level where the
            # dense factorization needs the identity rows), then densify;
            # vectors flatten in natural C order (stencil_to_dense layout).
            # Narrow-storage hierarchies upcast first: a bfloat16 dense
            # Cholesky is exactly the fp32-on-TPU NaN class the
            # diagonally-scaled factorization exists to prevent.
            coarsest = stencils[-1]
            if coarsest.dtype != scale.dtype:
                coarsest = coarsest.astype(scale.dtype)
            folded = fold_bc_into_stencil(coarsest, masks[-1])
            cho = self._scaled_cholesky(stencil_to_dense(folded))
            mask_flat = None
        else:
            cg = self.ops[-1].grid
            # x-fastest flattening to match hex_connectivity numbering
            scale_flat = scales[-1].transpose(2, 1, 0).reshape(-1)
            mask_flat = masks[-1].transpose(2, 1, 0, 3).reshape(-1)
            cho = self._coarsest_factor(scale_flat, mask_flat)
        state = {"scales": scales, "masks": masks, "diags": diags,
                 "omegas": omegas, "lams": lams, "cho": cho,
                 "mask_flat": mask_flat, "stencils": stencils}
        if self.cycle_dtype is not None:
            lp = self.cycle_dtype
            state["scales"] = [s.astype(lp) for s in scales]
            state["masks"] = [m.astype(lp) for m in masks]
            state["diags"] = [d.astype(lp) for d in diags]
            state["omegas"] = [o.astype(lp) for o in omegas]
            state["lams"] = [l.astype(lp) for l in lams]
            state["stencils"] = [None if s is None else s.astype(lp)
                                 for s in stencils]
        if self.stencil_dtype is not None:
            sd = self.stencil_dtype
            state["stencils"] = [None if s is None else s.astype(sd)
                                 for s in state["stencils"]]
        return state, tuple(new_vecs)

    @property
    def supports_light_setup(self) -> bool:
        """setup_light needs a Galerkin hierarchy with a direct level-1
        build, deeper levels to actually reuse, and the power-iteration
        smoother bound (the Gershgorin path has no carried state)."""
        return (self.galerkin and self.n_levels >= 3
                and 1 in getattr(self, "_Gs", {}) and self.power_iters > 0)

    def setup_light(self, scale, free_mask, power_vectors, prev_state):
        """PARTIAL per-SIMP-iteration setup (params.mg_full_setup_every):
        rebuild only what tracks the moving design at full resolution —
        the fine-level diagonal/lambda and the level-1 Galerkin stencil —
        and REUSE the deeper stencils, their smoother data, and the
        coarsest Cholesky from the last full `setup`'s state.

        Why this is sound where mg_setup_every>1 (reuse EVERYTHING) was
        measured catastrophic: there the fine-level smoother data went
        stale against the fresh CG operator A, a mismatch at the level
        that does all the work.  Here levels 0-1 stay exactly fresh; only
        the coarse-grid CORRECTION uses slightly stale operators, and
        under the 0.2 OC move limit the deep Galerkin coefficients (each
        an 8x-coarsened average of the modulus field) drift slowly.  The
        BC masks are static, so the reused entries stay structurally
        valid.  The driver guards the cadence with the same
        CG-degradation watchdog as mg_setup_every.

        Returns (state, new_power_vectors) with the SAME pytree structure
        as `setup` (the compiled CG program accepts either).
        """
        assert self.supports_light_setup
        lp = self.cycle_dtype

        def cast(x):
            return x if lp is None else x.astype(lp)

        sd_build = self.stencil_dtype
        st1 = level_stencil_from_scale(
            scale, self._Gs[1], 1, out_dtype=sd_build,
            x_chunks=8 if (sd_build is not None
                           and scale.size >= 8 * 1024 ** 2) else 1)
        fp_diag1 = (level_stencil_diag_from_scale(scale, self._Gs[1], 1)
                    if sd_build is not None else None)
        mask1 = coarsen_mask(free_mask)
        headroom = 1.1
        # level 0: element operator (fused kernel where installed)
        diag0 = self.ops[0].diagonal(scale, free_mask)
        lam0, v0 = self._estimate_lambda_max(
            lambda v: self.ops[0].apply(v, scale, free_mask), free_mask,
            diag0, power_vectors[0], self.refresh_iters)
        lam0 = headroom * lam0
        # level 1: the fresh Galerkin stencil (full-precision diagonal on
        # narrow-storage hierarchies — see _build_stencils)
        diag1 = fp_diag1 if fp_diag1 is not None else stencil_diagonal(st1)
        lam1, v1 = self._estimate_lambda_max(
            lambda v: self._masked_stencil_apply(st1, mask1, v), mask1,
            diag1, power_vectors[1], self.refresh_iters)
        lam1 = headroom * lam1

        scales = list(prev_state["scales"])
        scales[0] = cast(scale)
        diags = list(prev_state["diags"])
        diags[0], diags[1] = cast(diag0), cast(diag1)
        lams = list(prev_state["lams"])
        lams[0], lams[1] = cast(lam0), cast(lam1)
        omegas = list(prev_state["omegas"])
        omegas[0] = cast(4.0 / (3.0 * lam0))
        omegas[1] = cast(4.0 / (3.0 * lam1))
        stencils = list(prev_state["stencils"])
        sd = self.stencil_dtype if self.stencil_dtype is not None else lp
        stencils[1] = st1 if sd is None else st1.astype(sd)
        state = dict(prev_state, scales=scales, diags=diags, lams=lams,
                     omegas=omegas, stencils=stencils)
        new_vecs = (v0, v1) + tuple(power_vectors[2:])
        return state, new_vecs

    # ------------------------------------------------------------------
    def _apply_level(self, lvl, state, v):
        """Cycle-time operator action at `lvl` (stencil or element-based)."""
        st = state["stencils"][lvl]
        if st is not None:
            return self._masked_stencil_apply(st, state["masks"][lvl], v)
        op = self.cycle_ops[lvl]
        return op.apply(v, state["scales"][lvl], state["masks"][lvl])

    def _smooth(self, lvl, state, r, x, iters):
        """Smoothing sweeps: damped Jacobi or a degree-`iters` Chebyshev
        polynomial in D^-1 A over [lam_max/6, lam_max].

        Chebyshev gets markedly better high-frequency damping per matvec and
        degrades gracefully when lam_max is the (over-estimating) Gershgorin
        bound; same matvec count per application as Jacobi.  Equal pre/post
        applications keep the V-cycle a symmetric preconditioner.

        x=None means "initial iterate is exactly zero" (the pre-smoothing
        call): the first residual is then r itself, skipping one A-apply —
        at the FINE level that is 1 of the 4 applies per CG iteration
        (2 smooth + 1 restriction residual + 1 CG matvec), a free 25% cut
        in the compute-bound fine-level matvec work.
        """
        diag = state["diags"][lvl]
        if self.smoother == "jacobi":
            omega = state["omegas"][lvl]
            if x is None:
                x = omega * r / diag
                iters = iters - 1
            for _ in range(iters):
                x = x + omega * (r - self._apply_level(lvl, state, x)) / diag
            return x

        # Chebyshev (standard three-term recurrence, e.g. Adams et al. 2003).
        # Smoothing interval [lam_max/6, lam_max]: a 64^3 12-iteration SIMP
        # trajectory study measured total CG iterations 321/313/307/306 for
        # ratios 3/4/6/8 — /6 takes the gain without stretching the
        # polynomial over the lowest modes the coarse grid should handle.
        lam_max = state["lams"][lvl]
        lam_min = lam_max * jnp.asarray(1.0 / 6.0, lam_max.dtype)
        theta = 0.5 * (lam_max + lam_min)
        delta = 0.5 * (lam_max - lam_min)
        sigma = theta / delta
        res = r if x is None else r - self._apply_level(lvl, state, x)
        d = (res / diag) / theta
        x = d if x is None else x + d
        rho_old = 1.0 / sigma
        for _ in range(1, iters):
            rho = 1.0 / (2.0 * sigma - rho_old)
            res = r - self._apply_level(lvl, state, x)
            d = (rho * rho_old) * d + (2.0 * rho / delta) * (res / diag)
            x = x + d
            rho_old = rho
        return x

    def _vcycle(self, lvl, state, r):
        if lvl == self.n_levels - 1:
            cho, dinv_sqrt = state["cho"]
            if state["stencils"][-1] is not None:
                # Galerkin coarsest: natural C-order flattening, BC folding
                # already inside the dense matrix.
                r_flat = r.astype(self.dtype).reshape(-1)
                x_flat = dinv_sqrt * jax.scipy.linalg.cho_solve(
                    cho, dinv_sqrt * r_flat)
                out = x_flat.reshape(r.shape) * state["masks"][-1]
                return out.astype(r.dtype)
            cgrid = self.ops[-1].grid
            r_flat = r.astype(self.dtype).transpose(2, 1, 0, 3).reshape(-1) \
                * state["mask_flat"]
            # Undo the symmetric diagonal scaling: K^-1 = D^-1/2 Ks^-1 D^-1/2
            x_flat = dinv_sqrt * jax.scipy.linalg.cho_solve(
                cho, dinv_sqrt * r_flat)
            x_flat = x_flat * state["mask_flat"]
            nnx, nny, nnz = cgrid.nnodes_per_axis
            out = x_flat.reshape(nnz, nny, nnx, 3).transpose(2, 1, 0, 3)
            return out.astype(r.dtype)

        mask = state["masks"][lvl]
        iters = self._level_smooth_iters(lvl)
        x = self._smooth(lvl, state, r, None, iters)  # x0 = 0: skips 1 apply
        res = r - self._apply_level(lvl, state, x)
        rc = state["masks"][lvl + 1] * restrict(res)
        xc = self._vcycle(lvl + 1, state, rc)
        if self.cycle == "w" and lvl + 1 < self.n_levels - 1:
            # W-cycle (gamma=2): a second coarse-grid visit on the updated
            # residual.  Extra work lands on levels >= 1 only (1/8 the nodes
            # each), where the Galerkin stencil applies are HBM-cheap next to
            # the fine-level matvecs.
            rc2 = rc - self._apply_level(lvl + 1, state, xc)
            xc = xc + self._vcycle(lvl + 1, state, rc2)
        x = x + mask * prolong(xc)
        x = self._smooth(lvl, state, r, x, iters)
        return x

    def _level_smooth_iters(self, lvl: int) -> int:
        if isinstance(self.smooth_iters, tuple):
            return self.smooth_iters[min(lvl, len(self.smooth_iters) - 1)]
        return self.smooth_iters

    def _make_M(self, state):
        lp = self.cycle_dtype

        def M(r):
            if lp is None:
                return self._vcycle(0, state, r)
            # low-precision cycle: cast in, compute, cast out
            return self._vcycle(0, state, r.astype(lp)).astype(r.dtype)

        return M

    def preconditioner_factory(self):
        """Cold factory: (scale, mask) -> M(r).  Full power estimation per
        call — for one-off solves and tests; the drivers use
        stateful_factory."""

        def factory(scale, free_mask):
            state, _ = self.setup(scale, free_mask)
            return self._make_M(state)

        return factory

    def stateful_factory(self):
        """Stateful factory: (scale, mask, power_vectors) ->
        (M(r), new_power_vectors).  The caller threads the per-level power
        vectors through the SIMP iterations (see setup)."""

        def factory(scale, free_mask, power_vectors):
            state, new_vecs = self.setup(scale, free_mask, power_vectors)
            return self._make_M(state), new_vecs

        return factory
