"""Test configuration: force the CPU backend with a virtual 8-device mesh so
sharding/collective tests run without TPU hardware (the driver separately
dry-runs the multi-chip path on real infrastructure).

Note: the environment pre-imports jax with JAX_PLATFORMS=axon via
sitecustomize, so we must override through jax.config (env vars are already
captured) — XLA_FLAGS is still read at CPU-client creation time.
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
