"""Test harness config: force CPU backend with 8 virtual devices and f64.

Multi-chip sharding is validated on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8); the f64 oracle path
needs jax_enable_x64. Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
