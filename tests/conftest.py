"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding tests run against `xla_force_host_platform_device_count`
CPU devices; numerics tests use the same platform for speed and determinism.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
