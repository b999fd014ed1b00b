"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
the multi-chip path.

Note: this environment preloads jax at interpreter startup (sitecustomize
registers a TPU PJRT plugin and pins JAX_PLATFORMS), so plain env-var
setdefault is too late — we must update jax.config before any backend is
instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
