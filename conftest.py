"""Test-session configuration.

Must run before `jax` is imported anywhere: force the CPU backend with 8 virtual
devices (the TPU analogue of a fake multi-chip backend, per SURVEY.md §4) and
enable float64 so parity tests against the direct-solver reference implementation
can hold compliance to rtol <= 1e-6.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the real TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import tempfile  # noqa: E402

import jax  # noqa: E402

# A site hook pins jax_platforms to "axon,cpu" regardless of the env var;
# override it so tests run on the 8 virtual CPU devices, never the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache (the env var is a no-op in this jaxlib — must be
# the explicit config update, same as bench.py).  Within one suite run this
# dedupes identical programs compiled by different per-test jit instances
# (parametrized tests rebuild the same-shape step objects); across runs it
# skips recompilation entirely.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("EASYSIMP_TEST_CACHE",
                   os.path.join(tempfile.gettempdir(), "easysimp_test_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
