"""Mixture distribution tests: scipy agreement, analytic moments, exact
responsibility gradients, batched/MVN/discrete components, BayesianNet
integration. Beyond the reference (no mixture head upstream; see
``zhusuan_tpu/distributions/mixture.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import zhusuan_tpu as zs
from zhusuan_tpu import distributions as zd

KEY = jax.random.PRNGKey(7)

W = np.array([0.2, 0.5, 0.3])
MU = np.array([-3.0, 0.5, 4.0])
SD = np.array([0.6, 1.0, 2.0])


def scalar_gmm():
    return zd.Mixture(
        jnp.log(jnp.asarray(W)),
        zd.Normal(jnp.asarray(MU), std=jnp.asarray(SD)),
    )


class TestDensity:
    def test_log_prob_matches_scipy(self):
        m = scalar_gmm()
        x = np.linspace(-6, 8, 50)
        ours = np.asarray(m.log_prob(x))
        ref = np.log(sum(w * stats.norm.pdf(x, mu, sd)
                         for w, mu, sd in zip(W, MU, SD)))
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_prob_matches_exp_log_prob(self):
        m = scalar_gmm()
        x = np.linspace(-4, 6, 11)
        np.testing.assert_allclose(np.asarray(m.prob(x)),
                                   np.exp(np.asarray(m.log_prob(x))),
                                   rtol=1e-6)

    def test_unnormalized_logits_are_softmaxed(self):
        m1 = scalar_gmm()
        m2 = zd.Mixture(
            jnp.log(jnp.asarray(W)) + 11.7,  # shift-invariant
            zd.Normal(jnp.asarray(MU), std=jnp.asarray(SD)),
        )
        x = np.linspace(-4, 6, 7)
        np.testing.assert_allclose(np.asarray(m1.log_prob(x)),
                                   np.asarray(m2.log_prob(x)), rtol=1e-6)

    def test_logit_gradient_is_responsibility_minus_weight(self):
        """d log p(x) / d logit_k = r_k(x) - w_k exactly — the EM
        responsibility identity, a strong end-to-end gradient check."""
        logits = jnp.log(jnp.asarray(W))
        x = 1.3

        def lp(lg):
            return zd.Mixture(
                lg, zd.Normal(jnp.asarray(MU), std=jnp.asarray(SD))
            ).log_prob(x)

        g = np.asarray(jax.grad(lp)(logits))
        dens = W * stats.norm.pdf(x, MU, SD)
        r = dens / dens.sum()
        np.testing.assert_allclose(g, r - W, rtol=1e-5, atol=1e-7)

    def test_component_param_gradients_flow(self):
        def lp(mu):
            return zd.Mixture(
                jnp.log(jnp.asarray(W)),
                zd.Normal(mu, std=jnp.asarray(SD)),
            ).log_prob(0.0)

        g = np.asarray(jax.grad(lp)(jnp.asarray(MU)))
        # grad wrt mu_k = r_k * (x - mu_k)/sd_k^2
        dens = W * stats.norm.pdf(0.0, MU, SD)
        r = dens / dens.sum()
        np.testing.assert_allclose(g, r * (0.0 - MU) / SD ** 2, rtol=1e-5)

    def test_group_ndims(self):
        m = zd.Mixture(
            jnp.zeros((4, 3, 2)),
            zd.Normal(jnp.zeros((4, 3, 2)), std=jnp.ones((4, 3, 2))),
            group_ndims=2,
        )
        assert m.batch_shape == (4, 3)
        assert m.log_prob(jnp.zeros((4, 3))).shape == ()


class TestSampling:
    def test_moments(self):
        m = scalar_gmm()
        s = np.asarray(m.sample(KEY, n_samples=400_000))
        mean = float(np.dot(W, MU))
        var = float(np.dot(W, SD ** 2 + MU ** 2) - mean ** 2)
        assert abs(s.mean() - mean) < 0.02
        assert abs(s.std() - np.sqrt(var)) < 0.02

    def test_component_fractions(self):
        m = zd.Mixture(
            jnp.log(jnp.asarray([0.25, 0.75])),
            zd.Normal(jnp.asarray([-100.0, 100.0]), std=jnp.asarray(1.0)),
        )
        s = np.asarray(m.sample(KEY, n_samples=100_000))
        frac = float(np.mean(s > 0))
        assert abs(frac - 0.75) < 0.01

    def test_sample_none_squeezes(self):
        m = scalar_gmm()
        assert m.sample(KEY).shape == ()
        assert m.sample(KEY, 5).shape == (5,)

    def test_mvn_components(self):
        k = 3
        means = jnp.asarray(np.random.default_rng(0).normal(size=(k, 2)))
        tril = jnp.broadcast_to(0.4 * jnp.eye(2), (k, 2, 2))
        m = zd.Mixture(
            jnp.zeros((k,)), zd.MultivariateNormalCholesky(means, tril)
        )
        assert m.batch_shape == () and m.value_shape == (2,)
        s = m.sample(KEY, n_samples=60_000)
        assert s.shape == (60_000, 2)
        np.testing.assert_allclose(np.asarray(s.mean(0)),
                                   np.asarray(means.mean(0)), atol=0.02)
        # density agrees with the explicit mixture of scipy MVNs
        x = np.asarray([[0.3, -0.2], [1.0, 1.0]])
        ours = np.asarray(m.log_prob(jnp.asarray(x)))
        ref = np.log(np.mean([
            stats.multivariate_normal.pdf(x, np.asarray(means[i]),
                                          0.16 * np.eye(2))
            for i in range(k)
        ], axis=0))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_discrete_components(self):
        m = zd.Mixture(
            jnp.log(jnp.asarray([0.5, 0.5])),
            zd.Poisson(jnp.asarray([2.0, 20.0])),
        )
        assert not m.is_continuous
        s = np.asarray(m.sample(KEY, n_samples=50_000))
        assert abs(s.mean() - 11.0) < 0.2
        ours = float(m.log_prob(3))
        ref = np.log(0.5 * stats.poisson.pmf(3, 2.0)
                     + 0.5 * stats.poisson.pmf(3, 20.0))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestValidation:
    def test_component_group_ndims_rejected(self):
        with pytest.raises(ValueError, match="group_ndims=0"):
            zd.Mixture(jnp.zeros(3),
                       zd.Normal(jnp.zeros(3), std=1.0, group_ndims=1))

    def test_k_mismatch_rejected(self):
        with pytest.raises(ValueError, match="component axis K"):
            zd.Mixture(jnp.zeros(4), zd.Normal(jnp.zeros(3), std=1.0))

    def test_scalar_component_rejected(self):
        with pytest.raises(ValueError, match="batch axis"):
            zd.Mixture(jnp.zeros(1), zd.Normal(0.0, std=1.0))

    def test_non_distribution_rejected(self):
        with pytest.raises(TypeError, match="Distribution"):
            zd.Mixture(jnp.zeros(3), jnp.zeros(3))

    def test_not_reparameterized(self):
        assert not scalar_gmm().is_reparameterized


class TestBayesianNet:
    def test_node_and_log_joint(self):
        bn = zs.BayesianNet(key=KEY)
        node = bn.mixture(
            "z", jnp.log(jnp.asarray(W)),
            zd.Normal(jnp.asarray(MU), std=jnp.asarray(SD)),
            n_samples=8,
        )
        assert node.tensor.shape == (8,)
        lp = bn.cond_log_prob("z")
        np.testing.assert_allclose(
            np.asarray(lp),
            np.asarray(scalar_gmm().log_prob(node.tensor)), rtol=1e-6)

    def test_observed_scoring_in_meta_bn(self):
        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            bn.mixture(
                "z", jnp.log(jnp.asarray(W)),
                zd.Normal(jnp.asarray(MU), std=jnp.asarray(SD)),
            )
            return bn

        bn = model().observe(z=jnp.asarray(1.3))
        ref = np.log(sum(w * stats.norm.pdf(1.3, mu, sd)
                         for w, mu, sd in zip(W, MU, SD)))
        np.testing.assert_allclose(float(bn.log_joint()), ref, rtol=1e-6)
