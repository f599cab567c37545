"""Test configuration.

Tests run on the local CPU backend with 8 virtual XLA devices so multi-chip
sharding paths (`jax.sharding.Mesh` + shard_map/pjit) are exercised without
TPU hardware — the idiomatic JAX answer to multi-device testing (SURVEY.md §4
[TPU] note).

Note: the environment preloads a TPU PJRT plugin via sitecustomize before
pytest starts, so `jax` is already imported here; `jax.config.update` (not
env vars) is the reliable way to force the CPU backend, and XLA_FLAGS must be
set before the CPU backend first initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# float64 on the CPU test backend enables tight scipy numerics parity
# checks; the TPU runtime path stays float32/bfloat16.
jax.config.update("jax_enable_x64", True)
