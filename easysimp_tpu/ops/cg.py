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

__all__ = ["CGResult", "cg_solve"]


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

    Stops on the residual 2-norm. All state stays on device.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r

    bnorm = jnp.sqrt(_vdot(b, b))
    tol = jnp.maximum(rtol * bnorm, atol)

    r0 = b - A(x0)
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
