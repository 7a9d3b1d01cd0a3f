"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
paths are exercised quickly and without TPU hardware.

Note: this environment pre-sets jax_platforms to "axon,cpu" (TPU tunnel), and
that setting overrides the JAX_PLATFORMS env var — so we must override via
jax.config before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
