"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a CPU mesh (`xla_force_host_platform_device_count=8`), matching
the reference's strategy of single-node multi-process DTensor tests
(SURVEY.md §4).

Note: the environment's sitecustomize imports jax with JAX_PLATFORMS=axon
before pytest starts, so the platform must be forced via jax.config, not the
env var.
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
