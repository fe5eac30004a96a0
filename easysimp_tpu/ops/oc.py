"""Optimality Criteria update with Lagrange-multiplier bisection.

Port-of-semantics (not of code) of src/Optimization/OptimalityCriteria.jl:69-146
— Sigmund's OC formula with move limits and damping, bisecting lambda in
[1e-9, 1e9] until the volume constraint is met to ABSOLUTE tolerance 1e-6 —
restructured as a single `lax.while_loop` so the whole update (including the
density filter re-applied inside every bisection step when filter_type is
:density, OptimalityCriteria.jl:119-125) compiles into the jitted SIMP step.

One extra exit condition vs the reference: the loop also stops when the
bisection interval collapses to machine precision, after which lambda_mid (and
therefore the candidate densities) cannot change — the reference would idle
through the remaining iterations producing the identical result.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["oc_update", "sensitivity_health"]

X_MIN = 1e-3          # density lower bound (OptimalityCriteria.jl:86)
LAMBDA_LO = 1e-9      # bisection bounds (OptimalityCriteria.jl:89-90)
LAMBDA_HI = 1e9
VOLUME_TOL = 1e-6     # ABSOLUTE volume tolerance (OptimalityCriteria.jl:91)
MAX_BISECTION = 200   # (OptimalityCriteria.jl:92)


def oc_update(
    densities,
    sensitivities,
    volume_sensitivities,
    target_volume_fraction: float,
    total_volume,
    element_volumes,
    move_limit: float = 0.2,
    damping: float = 0.5,
    apply_physical: Callable | None = None,
):
    """One OC design update.

    Args:
      densities: current DESIGN densities (any shape).
      sensitivities: filtered objective sensitivities (same shape).
      volume_sensitivities: dV/drho in design space (chain-ruled once for the
        density filter, raw V_i/V_total otherwise — Optimization.jl:241-248).
      target_volume_fraction, total_volume, element_volumes: volume constraint
        data; element_volumes may be a scalar (uniform voxels) or an array.
      move_limit, damping: OC parameters.
      apply_physical: design->physical map evaluated on every candidate inside
        the bisection (density filter), or None for identity.

    Returns:
      (new_design_densities, lambda_mid, bisection_iterations)
    """
    dtype = densities.dtype
    if apply_physical is None:
        apply_physical = lambda x: x

    target_volume = jnp.asarray(target_volume_fraction, dtype) * jnp.asarray(
        total_volume, dtype
    )
    move = jnp.asarray(move_limit, dtype)
    x_min = jnp.asarray(X_MIN, dtype)
    eps = jnp.finfo(dtype).eps

    # Per-element invariants hoisted out of the bisection (the loop runs
    # O(50-200) passes over multi-million-element fields):
    #   ratio(lam) = rho * (|s| / (lam v))^d = [rho * (|s|/v)^d] * lam^-d
    # and the reference's nested clamp (OptimalityCriteria.jl:110-116)
    # max(xmin, max(rho-m, min(1, min(rho+m, ratio)))) equals
    # clip(ratio, max(xmin, rho-m), min(1, rho+m)) exactly (max/min
    # reassociation is exact in fp).  Each pass is then one scalar power,
    # one multiply, two clamps, and the volume reduction.
    d_exp = jnp.asarray(damping, dtype)
    q = densities * (jnp.abs(sensitivities) / volume_sensitivities) ** d_exp
    lo = jnp.maximum(x_min, densities - move)
    hi = jnp.minimum(jnp.asarray(1.0, dtype), densities + move)

    def candidate(lmid):
        return jnp.clip(q * lmid**(-d_exp), lo, hi)

    def volume_error(new):
        phys = apply_physical(new)
        return jnp.sum(phys * element_volumes) - target_volume

    def cond(state):
        lo, hi, new, lmid, verr, it = state
        not_converged = jnp.abs(verr) >= VOLUME_TOL
        interval_open = (hi - lo) > eps * hi
        return jnp.logical_or(
            it == 0,
            jnp.logical_and(
                it < MAX_BISECTION, jnp.logical_and(not_converged, interval_open)
            ),
        )

    def body(state):
        lo, hi, new, lmid, verr, it = state
        lmid = 0.5 * (lo + hi)
        new = candidate(lmid)
        verr = volume_error(new)
        # Too much material -> raise lambda; too little -> lower it.
        lo = jnp.where(verr > 0, lmid, lo)
        hi = jnp.where(verr > 0, hi, lmid)
        return (lo, hi, new, lmid, verr, it + 1)

    lo0 = jnp.asarray(LAMBDA_LO, dtype)
    hi0 = jnp.asarray(LAMBDA_HI, dtype)
    init = (
        lo0,
        hi0,
        densities,
        jnp.asarray(0.0, dtype),
        jnp.asarray(jnp.inf, dtype),
        jnp.int32(0),
    )
    lo, hi, new, lmid, verr, it = jax.lax.while_loop(cond, body, init)
    return new, lmid, it


def sensitivity_health(sensitivities):
    """Diagnostics in the spirit of `check_sensitivity_health`
    (OptimalityCriteria.jl:19-40); returns (frac_negative, center_abs,
    range_ratio) for the driver to warn on host-side.

    Deviation (documented): the reference centers its range check on the
    MEDIAN; a median is a full 2M-element sort per SIMP iteration at 128^3.
    Both the sort and a log/exp geometric-mean variant deterministically
    faulted the TPU when compiled next to the fused Pallas kernel, so the
    center here is the plain mean of |s| — cruder, but it only gates a
    console WARNING and costs two reductions.
    """
    flat = sensitivities.reshape(-1)
    dtype = flat.dtype
    frac_neg = jnp.mean((flat < 0).astype(dtype))
    abs_s = jnp.abs(flat)
    center = jnp.mean(abs_s)
    eps = jnp.finfo(dtype).eps
    range_ratio = jnp.max(abs_s) / jnp.maximum(center, eps)
    return frac_neg, center, range_ratio
