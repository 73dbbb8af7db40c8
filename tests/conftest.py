"""Test configuration: CPU backend with 8 virtual devices, float64 on.

Multi-chip hardware is not available in CI; sharding tests run on a virtual
8-device CPU mesh per the standard JAX testing recipe.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (one real TPU
# chip) via a sitecustomize hook that overrides the env var, so the only
# reliable override is jax.config.update after import. XLA_FLAGS must still
# be set before backend init for the virtual 8-device CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the NUTS/scan graphs dominate CI wall time
# and are identical across runs
# NOTE: separate dir from bench.py — axon-process compiles route through a
# remote compiler whose CPU artifacts carry different machine features
# (observed "could lead to SIGILL" loader warnings when shared)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.magi_jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
