"""Test configuration: run on a virtual 8-device CPU mesh.

The image's sitecustomize imports jax at interpreter startup with the axon
(TPU) platform pinned, so the JAX_PLATFORMS env var is already consumed by
the time pytest code runs. `jax.config.update` still works as long as no
backend has been initialised — do it first thing here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, (
    "tests expect 8 virtual CPU devices, got: " + str(jax.devices())
)
