"""bfloat16 support: the TPU-native low-precision dtype must flow through
sampling and densities (the reference was float32-only; TPU deployments mix
bf16 activations with f32 accumulation)."""

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu import distributions as zd

KEY = jax.random.PRNGKey(0)


def test_normal_bf16():
    dist = zd.Normal(
        jnp.zeros(8, jnp.bfloat16), std=jnp.ones(8, jnp.bfloat16)
    )
    s = dist.sample(KEY, 16)
    assert s.dtype == jnp.bfloat16
    lp = dist.log_prob(s)
    assert lp.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(lp.astype(jnp.float32))))


def test_bernoulli_bf16_params():
    dist = zd.Bernoulli(jnp.zeros(8, jnp.bfloat16))
    s = dist.sample(KEY, 16)
    assert s.dtype == jnp.int32
    lp = dist.log_prob(s)
    assert lp.dtype == jnp.bfloat16


def test_mvn_bf16():
    d = 4
    dist = zd.MultivariateNormalCholesky(
        jnp.zeros(d, jnp.bfloat16), jnp.eye(d, dtype=jnp.bfloat16)
    )
    s = dist.sample(KEY, 8)
    assert s.dtype == jnp.bfloat16
    lp = dist.log_prob(s)
    assert bool(jnp.all(jnp.isfinite(lp.astype(jnp.float32))))
