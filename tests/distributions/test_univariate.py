"""Univariate distribution tests.

Port of the contract in reference ``tests/distributions/test_univariate.py``:
init validation, shape contracts, and numerical agreement with scipy.stats
(e.g. stats.norm.logpdf at reference test_univariate.py:135-136, binom at
:928-936, invgamma at :1014).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as stats

from zhusuan_tpu import distributions as zd
from tests.distributions.utils import (
    check_batch_shape_2parameter_univariate,
    check_group_ndims,
    check_log_prob_shape,
    check_sample_shape,
)

KEY = jax.random.PRNGKey(0)


def _f64(x):
    return jnp.asarray(x, jnp.float64)


# --------------------------------------------------------------------- #
# Normal                                                                #
# --------------------------------------------------------------------- #
class TestNormal:
    def test_init(self):
        with pytest.raises(ValueError, match="Exactly one"):
            zd.Normal(0.0)
        with pytest.raises(ValueError, match="Exactly one"):
            zd.Normal(0.0, std=1.0, logstd=0.0)
        with pytest.raises(ValueError, match="order of `std` and `logstd`"):
            zd.Normal(0.0, 1.0)
        with pytest.raises(TypeError):
            zd.Normal(jnp.zeros(2, jnp.float32), std=jnp.ones(2, jnp.float64))
        with pytest.raises(ValueError):
            zd.Normal(jnp.zeros(2), std=jnp.ones(3))

    def test_shapes(self):
        check_batch_shape_2parameter_univariate(
            lambda m, s: zd.Normal(m, std=s)
        )
        check_sample_shape(
            lambda m, s: zd.Normal(m, std=s),
            [(0.0, 1.0), (jnp.zeros((2, 3)), jnp.ones((3,)))],
        )
        check_log_prob_shape(
            lambda m, s: zd.Normal(m, std=s),
            [(0.0, 1.0), (jnp.zeros((2, 3)), jnp.ones((3,)))],
            lambda shape, dist: jnp.zeros(shape),
        )

    def test_group_ndims(self):
        check_group_ndims(
            lambda g: zd.Normal(
                jnp.zeros((4, 3)), std=jnp.ones((4, 3)), group_ndims=g
            ),
            lambda shape, dist: jnp.zeros(shape),
        )

    def test_log_prob_vs_scipy(self):
        mean = _f64([0.0, 1.5, -2.0])
        std = _f64([1.0, 0.5, 3.0])
        x = _f64([0.3, -1.2, 4.0])
        dist = zd.Normal(mean, std=std)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)),
            stats.norm.logpdf(np.asarray(x), np.asarray(mean), np.asarray(std)),
            rtol=1e-10,
        )
        dist2 = zd.Normal(mean, logstd=jnp.log(std))
        np.testing.assert_allclose(
            np.asarray(dist2.log_prob(x)),
            stats.norm.logpdf(np.asarray(x), np.asarray(mean), np.asarray(std)),
            rtol=1e-10,
        )

    def test_sample_moments(self):
        dist = zd.Normal(_f64(2.0), std=_f64(3.0))
        samples = dist.sample(KEY, n_samples=200_000)
        assert abs(float(jnp.mean(samples)) - 2.0) < 0.05
        assert abs(float(jnp.std(samples)) - 3.0) < 0.05

    def test_reparameterized_gradients(self):
        def draw_mean(mean):
            return jnp.mean(
                zd.Normal(mean, std=1.0).sample(KEY, n_samples=10)
            )

        g = jax.grad(draw_mean)(_f64(0.0))
        np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-6)

        def draw_mean_norep(mean):
            return jnp.mean(
                zd.Normal(mean, std=1.0, is_reparameterized=False).sample(
                    KEY, n_samples=10
                )
            )

        g2 = jax.grad(draw_mean_norep)(_f64(0.0))
        np.testing.assert_allclose(np.asarray(g2), 0.0)

    def test_path_derivative(self):
        # use_path_derivative stops gradients through log_prob params.
        x = _f64(0.7)

        def lp(mean):
            return zd.Normal(mean, std=1.0, use_path_derivative=True).log_prob(x)

        np.testing.assert_allclose(np.asarray(jax.grad(lp)(_f64(0.0))), 0.0)

        def lp2(mean):
            return zd.Normal(mean, std=1.0).log_prob(x)

        np.testing.assert_allclose(np.asarray(jax.grad(lp2)(_f64(0.0))), 0.7)


class TestFoldNormal:
    def test_log_prob_vs_scipy(self):
        mean = _f64([0.5, 1.0])
        std = _f64([1.0, 2.0])
        x = _f64([0.3, 2.5])
        dist = zd.FoldNormal(mean, std=std)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)),
            stats.foldnorm.logpdf(
                np.asarray(x),
                np.asarray(mean) / np.asarray(std),
                scale=np.asarray(std),
            ),
            rtol=1e-8,
        )

    def test_samples_in_support(self):
        dist = zd.FoldNormal(_f64(-2.0), std=_f64(1.0))
        samples = dist.sample(KEY, n_samples=1000)
        assert bool(jnp.all(samples >= 0))


class TestBernoulli:
    def test_log_prob_vs_scipy(self):
        logits = _f64([-1.0, 0.5, 2.0])
        p = jax.nn.sigmoid(logits)
        dist = zd.Bernoulli(logits)
        for v in (0, 1):
            x = jnp.full((3,), v, jnp.int32)
            np.testing.assert_allclose(
                np.asarray(dist.log_prob(x)),
                stats.bernoulli.logpmf(v, np.asarray(p)),
                rtol=1e-10,
            )

    def test_sample_mean(self):
        dist = zd.Bernoulli(_f64(0.7))
        samples = dist.sample(KEY, n_samples=100_000)
        assert abs(float(jnp.mean(samples.astype(jnp.float64)))
                   - float(jax.nn.sigmoid(0.7))) < 0.01

    def test_dtype(self):
        dist = zd.Bernoulli(0.0, dtype=jnp.float32)
        assert dist.sample(KEY, 2).dtype == jnp.float32


class TestCategorical:
    def test_init(self):
        with pytest.raises(ValueError, match="at least 1-D"):
            zd.Categorical(jnp.asarray(1.0))

    def test_log_prob_vs_softmax(self):
        logits = _f64([[0.0, 1.0, 2.0], [2.0, 0.5, -1.0]])
        dist = zd.Categorical(logits)
        x = jnp.asarray([2, 0], jnp.int32)
        expected = np.log(
            np.exp(np.asarray(logits))
            / np.exp(np.asarray(logits)).sum(-1, keepdims=True)
        )[[0, 1], [2, 0]]
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)), expected, rtol=1e-10
        )

    def test_broadcast_given(self):
        logits = jnp.zeros((4, 3))
        dist = zd.Categorical(logits)
        # scalar given broadcasts over batch
        lp = dist.log_prob(jnp.asarray(1, jnp.int32))
        assert lp.shape == (4,)
        np.testing.assert_allclose(np.asarray(lp), np.log(1 / 3), rtol=1e-6)

    def test_sample_freqs(self):
        logits = _f64([0.0, 1.0, 2.0])
        dist = zd.Categorical(logits)
        samples = dist.sample(KEY, n_samples=100_000)
        freqs = np.bincount(np.asarray(samples), minlength=3) / 100_000
        probs = np.asarray(jax.nn.softmax(logits))
        np.testing.assert_allclose(freqs, probs, atol=0.01)


class TestUniform:
    def test_log_prob(self):
        dist = zd.Uniform(_f64(-1.0), _f64(3.0))
        np.testing.assert_allclose(
            float(dist.log_prob(_f64(0.0))), np.log(0.25), rtol=1e-10
        )
        assert np.isneginf(float(dist.log_prob(_f64(5.0))))

    def test_sample_range(self):
        dist = zd.Uniform(_f64(2.0), _f64(5.0))
        samples = dist.sample(KEY, n_samples=1000)
        assert bool(jnp.all((samples >= 2.0) & (samples < 5.0)))


class TestGamma:
    def test_log_prob_vs_scipy(self):
        alpha = _f64([1.0, 2.5])
        beta = _f64([0.5, 2.0])
        x = _f64([0.7, 1.3])
        dist = zd.Gamma(alpha, beta)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)),
            stats.gamma.logpdf(
                np.asarray(x), np.asarray(alpha), scale=1 / np.asarray(beta)
            ),
            rtol=1e-8,
        )

    def test_sample_mean(self):
        dist = zd.Gamma(_f64(3.0), _f64(2.0))
        samples = dist.sample(KEY, n_samples=100_000)
        assert abs(float(jnp.mean(samples)) - 1.5) < 0.02


class TestBeta:
    def test_log_prob_vs_scipy(self):
        alpha = _f64([0.5, 2.0])
        beta = _f64([0.5, 3.0])
        x = _f64([0.3, 0.6])
        dist = zd.Beta(alpha, beta)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)),
            stats.beta.logpdf(np.asarray(x), np.asarray(alpha), np.asarray(beta)),
            rtol=1e-8,
        )


class TestPoisson:
    def test_log_prob_vs_scipy(self):
        rate = _f64([0.5, 4.0, 20.0])
        x = jnp.asarray([0, 3, 25], jnp.int32)
        dist = zd.Poisson(rate)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)),
            stats.poisson.logpmf(np.asarray(x), np.asarray(rate)),
            rtol=1e-8,
        )

    def test_sample_mean(self):
        dist = zd.Poisson(_f64(7.0))
        samples = dist.sample(KEY, n_samples=100_000)
        assert abs(float(jnp.mean(samples.astype(jnp.float64))) - 7.0) < 0.05


class TestBinomial:
    def test_init(self):
        with pytest.raises(ValueError, match="positive"):
            zd.Binomial(0.0, 0)

    def test_log_prob_vs_scipy(self):
        logits = _f64([-0.5, 1.2])
        p = np.asarray(jax.nn.sigmoid(logits))
        dist = zd.Binomial(logits, n_experiments=10)
        x = jnp.asarray([3, 8], jnp.int32)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)),
            stats.binom.logpmf(np.asarray(x), 10, p),
            rtol=1e-8,
        )

    def test_sample_mean(self):
        dist = zd.Binomial(_f64(0.4), n_experiments=20)
        samples = dist.sample(KEY, n_samples=50_000)
        expect = 20 * float(jax.nn.sigmoid(0.4))
        assert abs(float(jnp.mean(samples.astype(jnp.float64))) - expect) < 0.1


class TestInverseGamma:
    def test_log_prob_vs_scipy(self):
        alpha = _f64([2.0, 3.0])
        beta = _f64([1.0, 0.5])
        x = _f64([0.8, 0.2])
        dist = zd.InverseGamma(alpha, beta)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)),
            stats.invgamma.logpdf(
                np.asarray(x), np.asarray(alpha), scale=np.asarray(beta)
            ),
            rtol=1e-8,
        )


class TestLaplace:
    def test_log_prob_vs_scipy(self):
        loc = _f64([0.0, -1.0])
        scale = _f64([1.0, 2.5])
        x = _f64([0.5, 3.0])
        dist = zd.Laplace(loc, scale)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)),
            stats.laplace.logpdf(
                np.asarray(x), np.asarray(loc), np.asarray(scale)
            ),
            rtol=1e-8,
        )

    def test_sample_moments(self):
        dist = zd.Laplace(_f64(1.0), _f64(2.0))
        samples = dist.sample(KEY, n_samples=200_000)
        assert abs(float(jnp.mean(samples)) - 1.0) < 0.03
        # Var of Laplace = 2 * scale^2 = 8.
        assert abs(float(jnp.var(samples)) - 8.0) < 0.2


class TestBinConcrete:
    def test_init(self):
        with pytest.raises(ValueError, match="scalar"):
            zd.BinConcrete(jnp.ones(2), jnp.zeros(3))

    def test_samples_in_unit_interval(self):
        dist = zd.BinConcrete(_f64(0.5), _f64([0.0, 2.0]))
        samples = dist.sample(KEY, n_samples=1000)
        assert bool(jnp.all((samples > 0) & (samples < 1)))

    def test_density_integrates_to_one(self):
        # Trapezoid integration of the density over (0,1).
        dist = zd.BinConcrete(_f64(0.7), _f64(0.4))
        x = jnp.linspace(1e-5, 1 - 1e-5, 20001, dtype=jnp.float64)
        p = jnp.exp(dist.log_prob(x))
        integral = float(jnp.trapezoid(p, x))
        assert abs(integral - 1.0) < 1e-3

    def test_temperature_limit_matches_bernoulli(self):
        # As temperature -> 0 samples approach {0,1} with Bernoulli probs.
        dist = zd.BinConcrete(_f64(0.01), _f64(1.2))
        samples = dist.sample(KEY, n_samples=100_000)
        frac = float(jnp.mean((samples > 0.5).astype(jnp.float64)))
        assert abs(frac - float(jax.nn.sigmoid(1.2))) < 0.01
