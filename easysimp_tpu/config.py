"""Global numeric configuration helpers.

The framework is dtype-polymorphic: every entry point takes a `dtype` argument.
Parity runs (matching the Julia reference's CHOLMOD double-precision trajectory,
compliance rtol <= 1e-6) use float64 — enable it with `enable_x64()` *before*
creating arrays.  TPU production/benchmark runs use float32: TPUs have no native
fp64, and the MXU path (the big (N,24)@(24,24) element matmul) wants fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["enable_x64", "default_dtype", "is_x64_enabled"]


def enable_x64(enabled: bool = True) -> None:
    """Enable (or disable) 64-bit JAX mode. Call before building any arrays."""
    jax.config.update("jax_enable_x64", bool(enabled))


def is_x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_dtype():
    """float64 when x64 is on (CPU parity runs), float32 otherwise (TPU runs)."""
    return jnp.float64 if is_x64_enabled() else jnp.float32
