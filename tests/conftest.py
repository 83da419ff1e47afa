"""Test configuration: force CPU backend with 8 virtual devices.

The environment registers an experimental remote-TPU platform ('axon') that
overrides JAX_PLATFORMS, so the CPU override must go through jax.config.
Multi-chip sharding logic is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
the multi-chip path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
