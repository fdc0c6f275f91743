"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Tests run on the CPU platform (fast startup, deterministic) with an 8-device
virtual mesh so the multi-chip sharding tier is exercised without TPU
hardware.  Numerical oracles (Madelung constants, analytic FTs) need float64.
"""

import os

# Select the CPU backend *before* any JAX backend is initialized.  The axon
# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon, so
# the env var is already frozen into jax.config — override through the config
# API (backends are created lazily, so this wins as long as no jnp op ran).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
