"""Test environment: force CPU with 8 virtual devices.

Tests run on a simulated 8-device CPU mesh so sharding/collective paths are
exercised without TPU hardware (SURVEY.md §4.4); bench.py runs on the real
chip and does not import this.

This environment pre-sets JAX_PLATFORMS=axon (a TPU tunnel plugin) and the
plugin wins over the env var, so the override must go through jax.config
*before* any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
