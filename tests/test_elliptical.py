"""Elliptical slice sampling (beyond-reference; mcmc/elliptical.py).

The headline check is the GP-regression conjugate case: with a Gaussian
likelihood the ESS stationary distribution has a closed form, so sample
moments are compared to the analytic posterior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu.mcmc import EllipticalSlice


def _rbf(x, ls=0.5, var=1.0, jitter=1e-8):
    d2 = (x[:, None] - x[None, :]) ** 2
    return var * np.exp(-0.5 * d2 / ls**2) + jitter * np.eye(len(x))


class TestConjugateGaussian:
    def test_1d_posterior_moments(self):
        # prior N(0, 1), likelihood N(y=2 | f, 1) -> posterior N(1, 1/2).
        def log_lik(obs):
            return jnp.sum(-0.5 * (2.0 - obs["f"]) ** 2, axis=-1)

        ess = EllipticalSlice(prior_std=1.0)
        state = ess.init({"f": jnp.zeros((512, 1))}, n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: ess.run(log_lik, {}, s, k, n_iters=1500)
        )(state, jax.random.PRNGKey(0))
        s = np.asarray(out["samples"]["f"][500:]).ravel()
        assert abs(s.mean() - 1.0) < 0.03, s.mean()
        assert abs(s.std() - np.sqrt(0.5)) < 0.03, s.std()

    def test_gp_regression_posterior(self):
        # f ~ GP(0, K) on a grid, y = f + noise: posterior mean/marginal
        # std are closed-form; ESS with prior_chol must match both.
        m = 12
        x = np.linspace(-1.0, 1.0, m)
        K = _rbf(x)
        rng = np.random.RandomState(0)
        sigma = 0.3
        f_true = rng.multivariate_normal(np.zeros(m), K)
        y = f_true + sigma * rng.randn(m)

        A = K @ np.linalg.inv(K + sigma**2 * np.eye(m))
        post_mean = A @ y
        post_cov = K - A @ K
        post_std = np.sqrt(np.diag(post_cov))

        y_j = jnp.asarray(y)

        def log_lik(obs):
            return jnp.sum(
                -0.5 * ((y_j - obs["f"]) / sigma) ** 2, axis=-1
            )

        chol = jnp.asarray(np.linalg.cholesky(K))
        ess = EllipticalSlice(prior_chol={"f": chol})
        state = ess.init({"f": jnp.zeros((256, m))}, n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: ess.run(log_lik, {}, s, k, n_iters=2500)
        )(state, jax.random.PRNGKey(1))
        s = np.asarray(out["samples"]["f"][1000:]).reshape(-1, m)
        np.testing.assert_allclose(s.mean(axis=0), post_mean, atol=0.05)
        np.testing.assert_allclose(s.std(axis=0), post_std, atol=0.05)

    def test_shrink_counts_small(self):
        def log_lik(obs):
            return jnp.sum(-0.5 * (1.0 - obs["f"]) ** 2, axis=-1)

        ess = EllipticalSlice(prior_std=1.0)
        state = ess.init({"f": jnp.zeros((64, 2))}, n_chain_dims=1)
        state, out = ess.run(
            log_lik, {}, state, jax.random.PRNGKey(2), n_iters=200
        )
        shrinks = np.asarray(out["n_shrinks"])
        # Murray's loop needs only a handful of proposals per transition.
        assert shrinks.max() < 30
        assert shrinks.mean() < 10


class TestNonGaussianLikelihood:
    def test_probit_style_posterior_integrates(self):
        # Bernoulli-probit likelihood on a 1-d latent under N(0, 1) prior:
        # compare ESS moments against dense numerical quadrature.
        def log_lik(obs):
            f = obs["f"][..., 0]
            return 3.0 * jax.nn.log_sigmoid(4.0 * f)

        grid = np.linspace(-6.0, 6.0, 4001)
        prior = np.exp(-0.5 * grid**2)
        lik = np.exp(3.0 * np.log(1.0 / (1.0 + np.exp(-4.0 * grid))))
        post = prior * lik
        post /= post.sum() * (grid[1] - grid[0])
        mean_q = float((grid * post).sum() * (grid[1] - grid[0]))
        var_q = float(((grid - mean_q) ** 2 * post).sum()
                      * (grid[1] - grid[0]))

        ess = EllipticalSlice(prior_std=1.0)
        state = ess.init({"f": jnp.zeros((512, 1))}, n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: ess.run(log_lik, {}, s, k, n_iters=2000)
        )(state, jax.random.PRNGKey(3))
        s = np.asarray(out["samples"]["f"][800:]).ravel()
        assert abs(s.mean() - mean_q) < 0.05, (s.mean(), mean_q)
        assert abs(s.std() - np.sqrt(var_q)) < 0.05, (s.std(), var_q)


class TestMultiLatent:
    def test_independent_priors(self):
        # Two latents with different prior scales, likelihood ties each to
        # its own observation; conjugate per-name posteriors.
        def log_lik(obs):
            a = -0.5 * jnp.sum((1.0 - obs["a"]) ** 2, axis=-1)
            b = -0.5 * jnp.sum(((2.0 - obs["b"]) / 0.5) ** 2, axis=-1)
            return a + b

        ess = EllipticalSlice(prior_std={"a": 1.0, "b": 2.0})
        state = ess.init(
            {"a": jnp.zeros((512, 1)), "b": jnp.zeros((512, 1))},
            n_chain_dims=1,
        )
        state, out = jax.jit(
            lambda s, k: ess.run(log_lik, {}, s, k, n_iters=2500)
        )(state, jax.random.PRNGKey(4))
        a = np.asarray(out["samples"]["a"][1000:]).ravel()
        b = np.asarray(out["samples"]["b"][1000:]).ravel()
        # a: prior N(0,1) x lik N(1 | a, 1) -> N(0.5, 0.5).
        assert abs(a.mean() - 0.5) < 0.04
        assert abs(a.std() - np.sqrt(0.5)) < 0.04
        # b: prior N(0,4) x lik N(2 | b, 0.25) -> N(2*16/17, 4/17).
        post_mean = 2.0 * 4.0 / (4.0 + 0.25)
        post_var = 1.0 / (1.0 / 4.0 + 1.0 / 0.25)
        assert abs(b.mean() - post_mean) < 0.05, (b.mean(), post_mean)
        assert abs(b.std() - np.sqrt(post_var)) < 0.05


class TestValidation:
    def test_missing_prior_entry(self):
        with pytest.raises(KeyError, match="prior_std"):
            EllipticalSlice(prior_std={"a": 1.0}).init(
                {"a": jnp.zeros((4, 1)), "b": jnp.zeros((4, 1))},
                n_chain_dims=1,
            )

    def test_bad_max_shrink(self):
        with pytest.raises(ValueError, match="max_shrink"):
            EllipticalSlice(max_shrink=0)

    def test_bad_chain_dims(self):
        with pytest.raises(TypeError, match="Python int"):
            EllipticalSlice().init({"f": jnp.zeros((4, 1))},
                                   n_chain_dims="1")
