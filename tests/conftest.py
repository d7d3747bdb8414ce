"""Test config: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh/shard_map) are exercised without TPU hardware.

Note: this environment preimports jax with JAX_PLATFORMS=axon (TPU tunnel)
via a sitecustomize hook, so env vars alone are too late — we must flip the
platform through jax.config before any backend is initialized. Eager
dispatch over the axon tunnel is also far too slow for unit tests.
"""

import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
jax.config.update("jax_platforms", "cpu")
