"""Test configuration: CPU backend with 8 virtual devices, float64.

Parity tests compare against the reference's f64 math at 1e-6, so x64 is
enabled. Multi-device sharding tests use a virtual CPU mesh
(``xla_force_host_platform_device_count=8``) exactly as recommended for
testing ``shard_map`` code without a pod.
"""

import os

# Must be set before jax initializes any backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
