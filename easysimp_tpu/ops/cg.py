"""Matrix-free preconditioned conjugate gradients.

Replaces the reference's per-iteration CHOLMOD refactorization
(`u .= cholesky(Symmetric(K,:L)) \\ f`, src/Optimization/Optimization.jl:317):
a sparse direct solve has no efficient TPU mapping, while CG is matvecs and
reductions — exactly what the stencil operator and XLA collectives are good
at.  Warm-started from the previous SIMP iterate and preconditioned (Jacobi or
geometric multigrid), it reaches direct-solver-equivalent compliance at tight
tolerances (the fp64 parity tests hold rtol <= 1e-6 against a scipy direct
solve).

The whole solve is one `lax.while_loop` inside jit: no host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["CGResult", "cg_solve", "recycle_init", "recycle_push",
           "recycle_deflate"]


# --- subspace-recycling ring buffer (shared by the voxel/unstructured
# drivers and bench.py so the three call sites cannot diverge) ----------
def recycle_init(k, u, dtype=None):
    """(k, *u.shape) ring buffer seeded with the current warm start in
    slot 0 (zeros elsewhere — rank-deficiency is handled by the ridge in
    `cg_solve`'s deflation).

    dtype: optional narrow STORAGE dtype for the ring (e.g. bfloat16).
    The ring is k node fields — 4.7 GB fp32 at 256^3 with k=8, which
    RESOURCE_EXHAUSTs the 16 GB HBM next to the Galerkin hierarchy
    (PHASES_r04).  The basis only selects a deflation subspace (the
    Galerkin projection in `cg_solve` uses the exact operator, with a
    ridge), so storage rounding degrades deflation quality gracefully,
    never correctness."""
    return jnp.zeros((k, *u.shape), dtype or u.dtype).at[0].set(
        u.astype(dtype) if dtype else u)


def recycle_push(H, u_new):
    """Shift the ring: newest solution first, oldest dropped (cast to the
    ring's storage dtype)."""
    return jnp.concatenate([u_new.astype(H.dtype)[None], H[:-1]])


def recycle_deflate(free_mask, recycle):
    """Deflation basis from the ring buffer: deltas of recent solutions
    against the newest one (== the warm start) — the directions the
    design evolution keeps re-exciting.  Upcast to the mask dtype so the
    Gram/projection math runs full precision even off a narrow ring."""
    if recycle is None:
        return None
    return (recycle[1:].astype(free_mask.dtype)
            - recycle[:1].astype(free_mask.dtype)) * free_mask


class CGResult(NamedTuple):
    u: jax.Array          # solution
    iterations: jax.Array # scalar int32
    residual_norm: jax.Array
    u_dot_r: jax.Array    # <u, r> at exit — lets callers form 0.5*u^T K u
                          # as 0.5*(u.f - u.r) without an extra matvec


def _vdot(a, b):
    return jnp.vdot(a, b)


def cg_solve(
    A: Callable,
    b,
    x0=None,
    M: Callable | None = None,
    rtol: float = 1e-10,
    atol: float = 0.0,
    maxiter: int = 10000,
    deflate=None,
) -> CGResult:
    """Solve A x = b with preconditioned CG.

    Args:
      A: SPD linear operator (pytree/array -> same structure). Must already
         encode Dirichlet masking (identity on constrained dofs).
      b: right-hand side (masked).
      x0: warm start (masked); zeros if None.
      M: preconditioner applying M^{-1} r (e.g. Jacobi or a multigrid V-cycle).
      rtol/atol: stop when ||r|| <= max(rtol*||b||, atol).
      maxiter: iteration cap (static).
      deflate: optional (m, *b.shape) stack of subspace-recycling basis
         vectors (masked; zero rows allowed).  Before iterating, the
         warm-start residual is Galerkin-projected over span(deflate):
         solve (W^T A W) y = W^T r0, set x0 += W y, r0 -= (A W) y.  In a
         SIMP loop with W spanning recent solution DELTAS this deflates
         exactly the slowly-converging modes the design evolution keeps
         re-exciting (the reference sidesteps this with a fresh CHOLMOD
         factorization per iteration, Optimization.jl:317).  Costs m
         operator applies + a tiny dense solve; the projected residual is
         reused, so CG itself starts no worse than without it.

    Stops on the residual 2-norm. All state stays on device.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r

    bnorm = jnp.sqrt(_vdot(b, b))
    tol = jnp.maximum(rtol * bnorm, atol)

    r0 = b - A(x0)
    if deflate is not None and deflate.shape[0] > 0:
        m = deflate.shape[0]
        AW = jnp.stack([A(deflate[i]) for i in range(m)])   # static unroll
        # Gram matrix and projection as FLAT matmuls (one MXU pass over
        # W/AW), not m^2 pairwise vdots (m^2 full-field read pairs).
        Wf = deflate.reshape(m, -1)
        AWf = AW.reshape(m, -1)
        # HIGHEST: the Gram entries reduce ~10^7 fp32 products; the default
        # TPU matmul precision (bf16 passes) is too coarse for a matrix
        # that feeds a linear solve.
        G = jnp.dot(Wf, AWf.T, precision=jax.lax.Precision.HIGHEST)
        g = jnp.dot(Wf, r0.reshape(-1),
                    precision=jax.lax.Precision.HIGHEST)
        # Relative ridge keeps the solve finite for rank-deficient W
        # (duplicate/zero rows from an unfilled ring buffer): a zero row
        # contributes g_i = 0, so its y_i is driven to ~0 and adds nothing.
        # Scaled to the working precision so the projection itself does not
        # cap the attainable residual (10 eps_mach relative).
        eps = 10.0 * jnp.finfo(G.dtype).eps \
            * jnp.max(jnp.abs(jnp.diagonal(G))) + 1e-30
        y = jnp.linalg.solve(G + eps * jnp.eye(m, dtype=G.dtype), g)
        x0_p = x0 + jnp.tensordot(y, deflate, axes=1)
        r0_p = r0 - jnp.tensordot(y, AW, axes=1)
        # Monotonicity guard: late-trajectory solution deltas become nearly
        # parallel, and an ill-conditioned G solved in working precision can
        # amplify roundoff past the projection's exact-arithmetic optimality.
        # Accept the projected start only if it actually shrank the residual
        # (two reductions — negligible next to the m operator applies).
        better = _vdot(r0_p, r0_p) < _vdot(r0, r0)
        x0 = jnp.where(better, x0_p, x0)
        r0 = jnp.where(better, r0_p, r0)
    z0 = M(r0)
    rz0 = _vdot(r0, z0)

    def cond(state):
        x, r, z, p, rz, k = state
        rnorm = jnp.sqrt(_vdot(r, r))
        return jnp.logical_and(k < maxiter, rnorm > tol)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        pAp = _vdot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _vdot(r, z)
        beta = jnp.where(rz > 0, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, rz0, jnp.int32(0))
    )
    return CGResult(
        u=x,
        iterations=k,
        residual_norm=jnp.sqrt(_vdot(r, r)),
        u_dot_r=_vdot(x, r),
    )
