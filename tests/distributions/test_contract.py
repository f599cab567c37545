"""Systematic shape/dtype contract sweep over the ENTIRE distribution zoo.

This is the unified version of the reference's parameterized property
harness (``tests/distributions/utils.py``): every distribution must satisfy

- sample shape ``([n_samples]+) batch_shape + value_shape``
- ``log_prob`` shape ``(...)+batch_shape[:-group_ndims]``
- sample dtype == ``dist.dtype``; log_prob dtype == ``param_dtype``
- broadcastable extra leading axes on ``given``
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu import distributions as zd

KEY = jax.random.PRNGKey(99)


def _f(x):
    return jnp.asarray(x, jnp.float32)


# (name, constructor, batch_shape, value_shape, given_fn)
def _cases():
    eye3 = jnp.eye(3, dtype=jnp.float32)
    cases = [
        ("Normal", lambda: zd.Normal(_f(np.zeros((4, 3))), std=_f(1.0)),
         (4, 3), (), lambda d, s: jnp.zeros(s, jnp.float32)),
        ("FoldNormal",
         lambda: zd.FoldNormal(_f(np.zeros((2, 3))), logstd=_f(0.0)),
         (2, 3), (), lambda d, s: jnp.ones(s, jnp.float32)),
        ("Bernoulli", lambda: zd.Bernoulli(_f(np.zeros((5,)))),
         (5,), (), lambda d, s: jnp.zeros(s, jnp.int32)),
        ("Categorical", lambda: zd.Categorical(_f(np.zeros((4, 6)))),
         (4,), (), lambda d, s: jnp.zeros(s, jnp.int32)),
        ("Uniform", lambda: zd.Uniform(_f(np.zeros((3, 2))), _f(1.0)),
         (3, 2), (), lambda d, s: 0.5 * jnp.ones(s, jnp.float32)),
        ("Gamma", lambda: zd.Gamma(_f(np.ones((4,))), _f(2.0)),
         (4,), (), lambda d, s: jnp.ones(s, jnp.float32)),
        ("Beta", lambda: zd.Beta(_f(np.ones((4,))), _f(2.0)),
         (4,), (), lambda d, s: 0.3 * jnp.ones(s, jnp.float32)),
        ("Poisson", lambda: zd.Poisson(_f(np.ones((2, 2)) * 3)),
         (2, 2), (), lambda d, s: jnp.ones(s, jnp.int32)),
        ("Binomial", lambda: zd.Binomial(_f(np.zeros((3,))), 5),
         (3,), (), lambda d, s: 2 * jnp.ones(s, jnp.int32)),
        ("InverseGamma", lambda: zd.InverseGamma(_f(np.ones((3,)) * 2),
                                                 _f(1.0)),
         (3,), (), lambda d, s: jnp.ones(s, jnp.float32)),
        ("Laplace", lambda: zd.Laplace(_f(np.zeros((4,))), _f(1.0)),
         (4,), (), lambda d, s: jnp.zeros(s, jnp.float32)),
        ("BinConcrete", lambda: zd.BinConcrete(_f(0.5), _f(np.zeros((4,)))),
         (4,), (), lambda d, s: 0.4 * jnp.ones(s, jnp.float32)),
        ("MVNCholesky",
         lambda: zd.MultivariateNormalCholesky(
             _f(np.zeros((5, 3))), jnp.broadcast_to(eye3, (5, 3, 3))),
         (5,), (3,), lambda d, s: jnp.zeros(s, jnp.float32)),
        ("Multinomial", lambda: zd.Multinomial(_f(np.zeros((2, 4))), 6),
         (2,), (4,),
         lambda d, s: jnp.broadcast_to(
             jnp.asarray([1, 2, 2, 1], jnp.int32), s)),
        ("UnnormalizedMultinomial",
         lambda: zd.UnnormalizedMultinomial(_f(np.zeros((2, 4)))),
         (2,), (4,),
         lambda d, s: jnp.broadcast_to(
             jnp.asarray([1, 0, 2, 1], jnp.int32), s)),
        ("OnehotCategorical",
         lambda: zd.OnehotCategorical(_f(np.zeros((3, 4)))),
         (3,), (4,),
         lambda d, s: jnp.broadcast_to(
             jax.nn.one_hot(1, 4).astype(jnp.int32), s)),
        ("Dirichlet", lambda: zd.Dirichlet(_f(np.ones((3, 4)))),
         (3,), (4,),
         lambda d, s: jnp.broadcast_to(
             jnp.full((4,), 0.25, jnp.float32), s)),
        ("ExpConcrete", lambda: zd.ExpConcrete(_f(0.5), _f(np.zeros((2, 3)))),
         (2,), (3,),
         lambda d, s: jnp.broadcast_to(
             jnp.log(jnp.full((3,), 1 / 3, jnp.float32)), s)),
        ("Concrete", lambda: zd.Concrete(_f(0.5), _f(np.zeros((2, 3)))),
         (2,), (3,),
         lambda d, s: jnp.broadcast_to(jnp.full((3,), 1 / 3, jnp.float32),
                                       s)),
        ("MatrixVariateNormalCholesky",
         lambda: zd.MatrixVariateNormalCholesky(
             _f(np.zeros((2, 3, 2))), jnp.broadcast_to(eye3, (2, 3, 3)),
             jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (2, 2, 2))),
         (2,), (3, 2), lambda d, s: jnp.zeros(s, jnp.float32)),
    ]
    return cases


@pytest.mark.parametrize(
    "name,make,batch,value,given_fn", _cases(),
    ids=[c[0] for c in _cases()],
)
class TestContract:
    def test_shapes_and_dtypes(self, name, make, batch, value, given_fn):
        dist = make()
        assert tuple(dist.batch_shape) == batch
        assert tuple(dist.value_shape) == value

        samplable = name not in ("UnnormalizedMultinomial",)
        if samplable:
            s0 = dist.sample(KEY)
            assert s0.shape == batch + value
            assert np.dtype(s0.dtype) == dist.dtype
            s7 = dist.sample(KEY, n_samples=7)
            assert s7.shape == (7,) + batch + value

        given = given_fn(dist, batch + value)
        lp = dist.log_prob(given)
        assert lp.shape == batch
        assert np.dtype(lp.dtype) == dist.param_dtype
        p = dist.prob(given)
        assert p.shape == batch

        # Extra leading axes broadcast through.
        given2 = given_fn(dist, (5,) + batch + value)
        assert dist.log_prob(given2).shape == (5,) + batch

    def test_log_prob_at_samples_finite(self, name, make, batch, value,
                                        given_fn):
        dist = make()
        if name in ("UnnormalizedMultinomial",):
            return
        s = dist.sample(KEY, n_samples=3)
        lp = dist.log_prob(s)
        assert bool(jnp.all(jnp.isfinite(lp))), name
