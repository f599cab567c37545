"""Tests for the hardware-PRNG sampling kernels (TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu.ops.random import tpu_normal, tpu_uniform

# The hardware PRNG primitives (pltpu.prng_seed / prng_random_bits) have no
# CPU interpreter lowering in this JAX version; these tests require a TPU.
# (Statistical correctness was additionally verified on a real v5e chip:
# mean 0.0001 / std 1.0000 over 33M draws — see PERF.md.)
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware PRNG requires a TPU backend",
)


def test_tpu_uniform_stats():
    u = tpu_uniform(jax.random.PRNGKey(0), (256, 128))
    u = np.asarray(u)
    assert u.shape == (256, 128)
    assert 0.0 <= u.min() and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1 / 12) < 0.005


def test_tpu_normal_stats():
    x = np.asarray(
        tpu_normal(jax.random.PRNGKey(1), (512, 128))
    )
    assert abs(x.mean()) < 0.02
    assert abs(x.std() - 1.0) < 0.02
    # Normality sanity: ~68% within 1 sigma.
    frac = np.mean(np.abs(x) < 1.0)
    assert abs(frac - 0.6827) < 0.02


def test_distinct_keys_distinct_streams():
    a = np.asarray(tpu_normal(jax.random.PRNGKey(0), (64, 128)))
    b = np.asarray(tpu_normal(jax.random.PRNGKey(1), (64, 128)))
    assert not np.allclose(a, b)
