"""Test configuration: run on CPU with 8 virtual devices.

The driver benches on the real TPU; tests must be hermetic and fast, and the
multi-chip sharding tests need several devices, so we force the host platform
with 8 virtual CPU devices before JAX initialises.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
