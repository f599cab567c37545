"""Per-class init-validation and error-path tests for all 26 distributions.

Mirrors the reference suite's explicit error-path coverage
(``/root/reference/tests/distributions/test_univariate.py`` init-validation
blocks, ``test_multivariate.py`` likewise, and the dtype harness in
``tests/distributions/utils.py:13-184``): every class must fail fast at
construction on bad parameters, with the reference's exception types.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu import distributions as d

KEY = jax.random.PRNGKey(0)

f32 = jnp.float32
f64 = jnp.float64


class TestNormalFamilyInit:
    @pytest.mark.parametrize("cls", [d.Normal, d.FoldNormal])
    def test_std_logstd_exclusive(self, cls):
        with pytest.raises(ValueError, match="std"):
            cls(mean=0.0, std=1.0, logstd=0.0)
        with pytest.raises(ValueError, match="std"):
            cls(mean=0.0)

    @pytest.mark.parametrize("cls", [d.Normal, d.FoldNormal])
    def test_positional_sentinel(self, cls):
        # Legacy positional Normal(mean, logstd) must fail loudly
        # (reference univariate.py:89, utils.py:327-334).
        with pytest.raises(ValueError, match="keyword"):
            cls(jnp.zeros(()), jnp.zeros(()))

    @pytest.mark.parametrize("cls", [d.Normal, d.FoldNormal])
    def test_dtype_mismatch(self, cls):
        with pytest.raises(TypeError, match="dtype"):
            cls(mean=jnp.zeros((), f32), std=jnp.ones((), f64))
        with pytest.raises(TypeError, match="dtype"):
            cls(mean=jnp.zeros((), f32), logstd=jnp.zeros((), f64))

    @pytest.mark.parametrize("cls", [d.Normal, d.FoldNormal])
    def test_non_float_params(self, cls):
        with pytest.raises(TypeError, match="float"):
            cls(mean=jnp.zeros((), jnp.int32), std=jnp.ones((), jnp.int32))

    @pytest.mark.parametrize("cls", [d.Normal, d.FoldNormal])
    def test_broadcast_mismatch(self, cls):
        with pytest.raises(ValueError, match="broadcast"):
            cls(mean=jnp.zeros(3), std=jnp.ones(4))


class TestUniformInit:
    def test_broadcast_mismatch(self):
        with pytest.raises(ValueError, match="broadcast"):
            d.Uniform(minval=jnp.zeros(3), maxval=jnp.ones(4))

    def test_dtype_mismatch(self):
        with pytest.raises(TypeError, match="dtype"):
            d.Uniform(minval=jnp.zeros((), f32), maxval=jnp.ones((), f64))


class TestTwoParamPositiveFamilies:
    """Gamma, Beta, InverseGamma share the (alpha, beta) contract; Laplace
    the (loc, scale) one (reference univariate.py:696,789,1104,1208)."""

    @pytest.mark.parametrize(
        "make",
        [
            lambda a, b: d.Gamma(alpha=a, beta=b),
            lambda a, b: d.Beta(alpha=a, beta=b),
            lambda a, b: d.InverseGamma(alpha=a, beta=b),
            lambda a, b: d.Laplace(loc=a, scale=b),
        ],
        ids=["gamma", "beta", "invgamma", "laplace"],
    )
    def test_broadcast_mismatch(self, make):
        with pytest.raises(ValueError, match="broadcast"):
            make(jnp.ones(3), jnp.ones(4))

    @pytest.mark.parametrize(
        "make",
        [
            lambda a, b: d.Gamma(alpha=a, beta=b),
            lambda a, b: d.Beta(alpha=a, beta=b),
            lambda a, b: d.InverseGamma(alpha=a, beta=b),
            lambda a, b: d.Laplace(loc=a, scale=b),
        ],
        ids=["gamma", "beta", "invgamma", "laplace"],
    )
    def test_dtype_mismatch(self, make):
        with pytest.raises(TypeError, match="dtype"):
            make(jnp.ones((), f32), jnp.ones((), f64))


class TestDiscreteScalarFamilies:
    def test_bernoulli_non_float_logits(self):
        with pytest.raises(TypeError, match="float"):
            d.Bernoulli(logits=jnp.zeros((), jnp.int32))

    def test_poisson_non_float_rate(self):
        with pytest.raises(TypeError, match="float"):
            d.Poisson(rate=jnp.ones((), jnp.int32))

    def test_categorical_scalar_logits(self):
        with pytest.raises(ValueError, match="1-D"):
            d.Categorical(logits=jnp.zeros(()))

    def test_binomial_n_experiments_validation(self):
        # Positive (reference univariate.py:975-982)...
        with pytest.raises(ValueError, match="positive"):
            d.Binomial(logits=jnp.zeros(3), n_experiments=0)
        with pytest.raises(ValueError, match="positive"):
            d.Binomial(logits=jnp.zeros(3), n_experiments=-3)
        # ... and integral (TypeError 'must be int32' analogue :984).
        with pytest.raises(ValueError, match="int"):
            d.Binomial(logits=jnp.zeros(3), n_experiments=2.5)

    def test_binomial_non_float_logits(self):
        with pytest.raises(TypeError, match="float"):
            d.Binomial(logits=jnp.zeros(3, jnp.int32), n_experiments=2)


class TestConcreteFamilies:
    @pytest.mark.parametrize(
        "make",
        [
            lambda t, lg: d.BinConcrete(temperature=t, logits=lg[0]),
            lambda t, lg: d.ExpConcrete(temperature=t, logits=lg),
            lambda t, lg: d.Concrete(temperature=t, logits=lg),
        ],
        ids=["binconcrete", "expconcrete", "concrete"],
    )
    def test_temperature_must_be_scalar(self, make):
        with pytest.raises(ValueError, match="scalar"):
            make(jnp.ones(2), jnp.zeros(3))

    @pytest.mark.parametrize(
        "make",
        [
            lambda lg: d.ExpConcrete(temperature=0.5, logits=lg),
            lambda lg: d.Concrete(temperature=0.5, logits=lg),
        ],
        ids=["expconcrete", "concrete"],
    )
    def test_logits_rank(self, make):
        with pytest.raises(ValueError, match="1-D"):
            make(jnp.zeros(()))

    def test_aliases(self):
        assert d.BinGumbelSoftmax is d.BinConcrete
        assert d.GumbelSoftmax is d.Concrete
        assert d.ExpGumbelSoftmax is d.ExpConcrete


class TestMultivariateNormalCholeskyInit:
    def test_mean_rank(self):
        with pytest.raises(ValueError, match="1-D"):
            d.MultivariateNormalCholesky(jnp.zeros(()), jnp.eye(1))

    def test_cov_tril_rank(self):
        with pytest.raises(ValueError, match="2-D"):
            d.MultivariateNormalCholesky(jnp.zeros(3), jnp.ones(3))

    def test_dim_mismatch(self):
        with pytest.raises(ValueError, match="d"):
            d.MultivariateNormalCholesky(jnp.zeros(3), jnp.eye(4))

    def test_non_square(self):
        with pytest.raises(ValueError):
            d.MultivariateNormalCholesky(jnp.zeros(3), jnp.ones((3, 4)))

    def test_dtype_mismatch(self):
        with pytest.raises(TypeError, match="dtype"):
            d.MultivariateNormalCholesky(
                jnp.zeros(3, f32), jnp.eye(3, dtype=f64)
            )


class TestMatrixVariateNormalCholeskyInit:
    def test_mean_rank(self):
        with pytest.raises(ValueError, match="2-D"):
            d.MatrixVariateNormalCholesky(jnp.zeros(3), jnp.eye(3), jnp.eye(3))

    def test_u_tril_shape(self):
        with pytest.raises(ValueError):
            d.MatrixVariateNormalCholesky(
                jnp.zeros((3, 4)), jnp.eye(5), jnp.eye(4)
            )

    def test_v_tril_shape(self):
        with pytest.raises(ValueError):
            d.MatrixVariateNormalCholesky(
                jnp.zeros((3, 4)), jnp.eye(3), jnp.eye(5)
            )


class TestMultinomialFamilies:
    def test_logits_rank(self):
        with pytest.raises(ValueError, match="1-D"):
            d.Multinomial(jnp.zeros(()), n_experiments=3)

    def test_sample_requires_n(self):
        dist = d.Multinomial(jnp.zeros(3), n_experiments=None)
        with pytest.raises(ValueError, match="n_experiments"):
            dist.sample(KEY)

    def test_bad_n(self):
        with pytest.raises(ValueError, match="positive"):
            d.Multinomial(jnp.zeros(3), n_experiments=-1)

    def test_unnormalized_sample_raises(self):
        dist = d.UnnormalizedMultinomial(jnp.zeros(3))
        with pytest.raises((ValueError, NotImplementedError)):
            dist.sample(KEY)

    def test_onehot_logits_rank(self):
        with pytest.raises(ValueError, match="1-D"):
            d.OnehotCategorical(jnp.zeros(()))

    def test_aliases(self):
        assert d.BagofCategoricals is d.UnnormalizedMultinomial
        assert d.OnehotDiscrete is d.OnehotCategorical
        assert d.Discrete is d.Categorical


class TestDirichletInit:
    def test_alpha_rank(self):
        with pytest.raises(ValueError, match="1-D"):
            d.Dirichlet(alpha=jnp.ones(()))

    def test_k_at_least_two(self):
        # Reference multivariate.py:607-612.
        with pytest.raises(ValueError, match="2"):
            d.Dirichlet(alpha=jnp.ones(1))


class TestSpecialDistributions:
    def test_empirical_has_no_sample_or_log_prob(self):
        dist = d.Empirical(jnp.float32, batch_shape=(2,), value_shape=())
        with pytest.raises(ValueError, match="[Ss]ample"):
            dist.sample(KEY)
        with pytest.raises(ValueError, match="log"):
            dist.log_prob(jnp.zeros(2))

    def test_implicit_sampling_returns_given(self):
        sample = jnp.asarray([1.0, 2.0])
        dist = d.Implicit(sample)
        out = dist.sample(KEY)
        np.testing.assert_allclose(np.asarray(out), np.asarray(sample))


class TestBaseContractErrors:
    def test_group_ndims_negative(self):
        with pytest.raises(ValueError, match="non-negative"):
            d.Normal(mean=0.0, std=1.0, group_ndims=-1)

    def test_log_prob_rank_too_low(self):
        dist = d.Normal(
            mean=jnp.zeros(3), std=jnp.ones(3), group_ndims=2
        )
        with pytest.raises(ValueError):
            dist.log_prob(jnp.zeros(3))

    def test_sample_n_samples_validation(self):
        dist = d.Normal(mean=0.0, std=1.0)
        with pytest.raises((ValueError, TypeError)):
            dist.sample(KEY, n_samples=-1)
