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
        ("LKJCholesky", lambda: zd.LKJCholesky(3, _f(1.0)),
         (), (3, 3),
         lambda d, s: jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), s)),
        ("Wishart", lambda: zd.Wishart(4.0, jnp.eye(3, dtype=jnp.float32)),
         (), (3, 3),
         lambda d, s: jnp.broadcast_to(
             2.0 * jnp.eye(3, dtype=jnp.float32), s)),
        ("StudentT", lambda: zd.StudentT(_f(np.ones((3, 2)) * 4),
                                         _f(0.0), _f(1.0)),
         (3, 2), (), lambda d, s: jnp.zeros(s, jnp.float32)),
        ("Exponential", lambda: zd.Exponential(_f(np.ones((4,)) * 2)),
         (4,), (), lambda d, s: jnp.ones(s, jnp.float32)),
        ("Cauchy", lambda: zd.Cauchy(_f(np.zeros((2, 3))), _f(1.0)),
         (2, 3), (), lambda d, s: jnp.zeros(s, jnp.float32)),
        ("HalfCauchy", lambda: zd.HalfCauchy(_f(np.ones((5,)))),
         (5,), (), lambda d, s: jnp.ones(s, jnp.float32)),
        ("LogNormal", lambda: zd.LogNormal(_f(np.zeros((4,))), _f(1.0)),
         (4,), (), lambda d, s: jnp.ones(s, jnp.float32)),
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
        ("NegativeBinomial",
         lambda: zd.NegativeBinomial(_f(np.zeros((3, 2))), _f(4.0)),
         (3, 2), (), lambda d, s: 2 * jnp.ones(s, jnp.int32)),
        ("TruncatedNormal",
         lambda: zd.TruncatedNormal(_f(np.zeros((4,))), _f(1.0),
                                    _f(-2.0), _f(2.0)),
         (4,), (), lambda d, s: jnp.zeros(s, jnp.float32)),
        ("Mixture",
         lambda: zd.Mixture(
             _f(np.zeros((4, 3))),
             zd.Normal(_f(np.zeros((4, 3))), std=_f(np.ones((4, 3))))),
         (4,), (), lambda d, s: jnp.zeros(s, jnp.float32)),
        ("MixtureMVN",
         lambda: zd.Mixture(
             _f(np.zeros((2,))),
             zd.MultivariateNormalCholesky(
                 _f(np.zeros((5, 2, 3))),
                 jnp.broadcast_to(eye3, (5, 2, 3, 3)))),
         (5,), (3,), lambda d, s: jnp.zeros(s, jnp.float32)),
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


# --------------------------------------------------------------------- #
# Parameter-broadcast matrix (reference tests/distributions/utils.py:
# test_batch_shape_2parameter_univariate, :186-230)
# --------------------------------------------------------------------- #

TWO_PARAM = [
    ("Normal_std", lambda a, b: zd.Normal(mean=a, std=jnp.abs(b) + 0.5)),
    ("Normal_logstd", lambda a, b: zd.Normal(mean=a, logstd=b)),
    ("FoldNormal", lambda a, b: zd.FoldNormal(mean=a, std=jnp.abs(b) + 0.5)),
    ("Uniform", lambda a, b: zd.Uniform(minval=a, maxval=a + jnp.abs(b) + 1.0)),
    ("Gamma", lambda a, b: zd.Gamma(alpha=jnp.abs(a) + 1.0,
                                    beta=jnp.abs(b) + 1.0)),
    ("Beta", lambda a, b: zd.Beta(alpha=jnp.abs(a) + 1.0,
                                  beta=jnp.abs(b) + 1.0)),
    ("InverseGamma", lambda a, b: zd.InverseGamma(alpha=jnp.abs(a) + 2.0,
                                                  beta=jnp.abs(b) + 1.0)),
    ("Laplace", lambda a, b: zd.Laplace(loc=a, scale=jnp.abs(b) + 0.5)),
]

BROADCAST_SHAPES = [
    ((), ()),
    ((3,), ()),
    ((2, 3), (3,)),
    ((2, 1), (1, 4)),
    ((5, 1, 3), (4, 3)),
]


@pytest.mark.parametrize("name,make", TWO_PARAM, ids=[t[0] for t in TWO_PARAM])
@pytest.mark.parametrize("s1,s2", BROADCAST_SHAPES,
                         ids=[str(s) for s in BROADCAST_SHAPES])
class TestTwoParamBroadcastMatrix:
    def test_batch_shape_and_sampling(self, name, make, s1, s2):
        a = jnp.zeros(s1, jnp.float32)
        b = jnp.zeros(s2, jnp.float32)
        dist = make(a, b)
        expect = tuple(np.broadcast_shapes(s1, s2))
        assert tuple(dist.batch_shape) == expect
        s = dist.sample(KEY, n_samples=2)
        assert s.shape == (2,) + expect
        lp = dist.log_prob(s)
        assert lp.shape == (2,) + expect


# --------------------------------------------------------------------- #
# Float dtype matrix (reference tests/distributions/utils.py:
# test_dtype_2parameter, :13-110): the distribution adopts its parameters'
# dtype for samples and log-probs.
# --------------------------------------------------------------------- #

FLOAT_DTYPES = [jnp.bfloat16, jnp.float32, jnp.float64]


@pytest.mark.parametrize("name,make", TWO_PARAM, ids=[t[0] for t in TWO_PARAM])
@pytest.mark.parametrize("dtype", FLOAT_DTYPES,
                         ids=[np.dtype(d).name for d in FLOAT_DTYPES])
class TestFloatDtypeMatrix:
    def test_dtype_propagation(self, name, make, dtype):
        a = jnp.zeros((3,), dtype)
        b = jnp.zeros((3,), dtype)
        dist = make(a, b)
        assert np.dtype(dist.dtype) == np.dtype(dtype)
        assert np.dtype(dist.param_dtype) == np.dtype(dtype)
        s = dist.sample(KEY)
        assert np.dtype(s.dtype) == np.dtype(dtype)
        lp = dist.log_prob(s)
        assert np.dtype(lp.dtype) == np.dtype(dtype)


class TestDiscreteOutputDtypeMatrix:
    """Discrete classes take an output ``dtype`` argument
    (reference: int32 default, float allowed; utils.py:127-138)."""

    @pytest.mark.parametrize(
        "dtype", [jnp.int32, jnp.int64, jnp.float32],
        ids=["int32", "int64", "float32"],
    )
    def test_output_dtype(self, dtype):
        for make in (
            lambda: zd.Bernoulli(jnp.zeros(3, jnp.float32), dtype=dtype),
            lambda: zd.Categorical(jnp.zeros((3, 4), jnp.float32),
                                   dtype=dtype),
            lambda: zd.Poisson(jnp.ones(3, jnp.float32), dtype=dtype),
            lambda: zd.Binomial(jnp.zeros(3, jnp.float32), 4, dtype=dtype),
            lambda: zd.Multinomial(jnp.zeros((4,), jnp.float32), 3,
                                   dtype=dtype),
            lambda: zd.OnehotCategorical(jnp.zeros((4,), jnp.float32),
                                         dtype=dtype),
        ):
            dist = make()
            assert np.dtype(dist.dtype) == np.dtype(dtype)
            s = dist.sample(KEY)
            assert np.dtype(s.dtype) == np.dtype(dtype)


# --------------------------------------------------------------------- #
# group_ndims sweep over every zoo head (reference log-prob-shape
# harnesses, utils.py:232-528)
# --------------------------------------------------------------------- #

@pytest.mark.parametrize(
    "name,make,batch,value,given_fn", _cases(),
    ids=[c[0] for c in _cases()],
)
class TestGroupNdimsSweep:
    def test_all_valid_group_ndims(self, name, make, batch, value,
                                   given_fn):
        for g in range(len(batch) + 1):
            dist = make()
            dist._group_ndims = g  # same class, varied reduction
            given = given_fn(dist, batch + value)
            lp = dist.log_prob(given)
            expect = batch[: len(batch) - g] if g else batch
            assert lp.shape == expect, (name, g)

    def test_group_ndims_beyond_rank_raises(self, name, make, batch, value,
                                            given_fn):
        dist = make()
        dist._group_ndims = len(batch) + len(value) + 1
        given = given_fn(dist, batch + value)
        with pytest.raises(ValueError):
            dist.log_prob(given)
