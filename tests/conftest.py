"""Test configuration: force the CPU backend with a virtual 8-device mesh so
sharding/collective tests run without TPU hardware (the driver separately
dry-runs the multi-chip path on real infrastructure).

Note: the environment pre-imports jax with JAX_PLATFORMS=axon via
sitecustomize, so we must override through jax.config (env vars are already
captured) — XLA_FLAGS is still read at CPU-client creation time.

Set DF_TPU_TESTS=1 to SKIP the CPU forcing and run the suite on the real
chip (tools/tpu_numerics_check.py uses this to validate Mosaic lowering of
every Pallas kernel on hardware — interpret-mode tests do not catch
hardware-only miscompiles, see CLAUDE.md).
"""
import os

if os.environ.get("DF_TPU_TESTS", "") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
else:
    import jax  # noqa: E402

    from deepfactors_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
