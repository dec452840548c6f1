"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests need more than the single real TPU chip, so
tests force the CPU backend with 8 virtual devices
(xla_force_host_platform_device_count), per the multi-device testing
recipe. Pallas kernels run in interpret mode on CPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
