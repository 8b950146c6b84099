"""Test environment: force JAX onto 8 virtual CPU devices.

This is the TPU-world answer to multi-device testing without a pod slice —
shardings/collectives compile and execute exactly as on a real mesh.  The
XLA flag must be set before the CPU backend initializes; the platform choice
goes through jax.config because the hosting environment pins JAX_PLATFORMS.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
