"""Automatic guide (ADVI) tests: exact density attribution, support
handling, and end-to-end convergence to analytically known posteriors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.variational import (
    FullRankGuide,
    MeanFieldGuide,
    elbo,
)

KEY = jax.random.PRNGKey(77)


@zs.meta_bayesian_net()
def unconstrained_model():
    bn = zs.BayesianNet()
    z = bn.normal("z", jnp.zeros(2), std=1.0, group_ndims=1)
    bn.normal("x", z.tensor[..., 0] + z.tensor[..., 1], std=0.5)
    return bn


@zs.meta_bayesian_net()
def constrained_model():
    bn = zs.BayesianNet()
    tau = bn.gamma("tau", 3.0, beta=2.0)
    bn.normal("y", 0.0, std=1.0 / jnp.sqrt(tau.tensor))
    return bn


def exact_posterior_2d(x, sigma=0.5):
    """Posterior of z in unconstrained_model: precision I + aa^T/s^2."""
    a = np.ones(2)
    prec = np.eye(2) + np.outer(a, a) / sigma**2
    cov = np.linalg.inv(prec)
    mean = cov @ (a * x / sigma**2)
    return mean, cov


class TestDensityAttribution:
    def test_meanfield_identity_matches_normal(self):
        g = MeanFieldGuide(unconstrained_model(), observed={"x": 1.0})
        p = g.init_params()
        p["loc"]["z"] = jnp.asarray([0.3, -0.7])
        p["log_scale"]["z"] = jnp.asarray([-0.2, 0.4])
        samples, lq = g.sample(p, KEY, n_samples=64)
        from scipy.stats import norm

        ref = norm.logpdf(
            np.asarray(samples["z"]),
            np.asarray(p["loc"]["z"]),
            np.exp(np.asarray(p["log_scale"]["z"])),
        ).sum(axis=-1)
        np.testing.assert_allclose(
            np.asarray(lq["z"]), ref, rtol=1e-5, atol=1e-5
        )

    def test_fullrank_conditionals_sum_to_joint(self):
        """The per-name autoregressive conditionals must sum to the
        joint MVN log density — checked against scipy."""

        @zs.meta_bayesian_net()
        def two_latents():
            bn = zs.BayesianNet()
            bn.normal("a", jnp.zeros(2), std=1.0, group_ndims=1)
            b = bn.normal("b", 0.0, std=1.0)
            bn.normal("x", b.tensor, std=1.0)
            return bn

        g = FullRankGuide(two_latents(), observed={"x": 0.0})
        p = g.init_params()
        # A deliberately non-trivial Cholesky (strict-lower + raw diag).
        rng = np.random.RandomState(0)
        p["chol_raw"] = jnp.asarray(
            np.tril(rng.randn(3, 3) * 0.5, k=-1)
            + np.diag(rng.randn(3) * 0.3)
        )
        p["loc"] = jnp.asarray(rng.randn(3) * 0.5)
        samples, lq = g.sample(p, KEY, n_samples=128)
        total = sum(np.asarray(lq[n]) for n in g.latent_names)

        from scipy.stats import multivariate_normal

        L = np.tril(np.asarray(p["chol_raw"]), k=-1) + np.diag(
            np.log1p(np.exp(np.diagonal(np.asarray(p["chol_raw"]))))
            + 1e-6
        )
        cov = L @ L.T
        # Identity bijectors: constrained == unconstrained; flat order
        # is sorted-name blocks: a (2 dims) then b (1 dim).
        flat = np.concatenate(
            [np.asarray(samples["a"]).reshape(-1, 2),
             np.asarray(samples["b"]).reshape(-1, 1)], axis=1
        )
        ref = multivariate_normal.logpdf(flat, np.asarray(p["loc"]), cov)
        np.testing.assert_allclose(total, ref, rtol=1e-5, atol=1e-5)

    def test_constrained_latent_log_prob_change_of_variables(self):
        """Softplus-bijected latent: log q must equal the base normal
        density minus the forward log-det at the unconstrained point."""
        g = MeanFieldGuide(constrained_model(), observed={"y": 0.3})
        assert type(g.bijectors["tau"]).__name__ == "Softplus"
        p = g.init_params()
        samples, lq = g.sample(p, KEY, n_samples=256)
        tau = np.asarray(samples["tau"])
        assert (tau > 0).all()
        # Invert: y_u = softplus^{-1}(tau)
        y_u = tau + np.log(-np.expm1(-tau))
        from scipy.stats import norm

        base = norm.logpdf(
            y_u, np.asarray(p["loc"]["tau"]),
            np.exp(np.asarray(p["log_scale"]["tau"])),
        )
        log_det = np.log1p(-np.exp(-np.maximum(tau, 1e-30)))
        # d softplus / dy = sigmoid(y); log sigmoid(y) = log(1 - e^-x)
        np.testing.assert_allclose(
            np.asarray(lq["tau"]), base - log_det, rtol=1e-4, atol=1e-4
        )


class TestValidation:
    def test_discrete_latent_raises(self):
        @zs.meta_bayesian_net()
        def m():
            bn = zs.BayesianNet()
            b = bn.bernoulli("b", jnp.zeros(()))
            bn.normal("x", jnp.asarray(b.tensor, jnp.float32), std=1.0)
            return bn

        with pytest.raises(ValueError, match="discrete"):
            MeanFieldGuide(m(), observed={"x": 0.0})

    def test_simplex_support_uses_stick_breaking(self):
        # Dirichlet latents are auto-mapped to K-1 stick-breaking
        # coordinates (round-3 upgrade; previously raised).
        @zs.meta_bayesian_net()
        def m():
            bn = zs.BayesianNet()
            w = bn.dirichlet("w", jnp.ones(3))
            bn.categorical("c", jnp.log(w.tensor), observed=1)
            return bn

        g = MeanFieldGuide(m(), observed={"c": jnp.asarray(1)})
        assert g.init_params()["loc"]["w"].shape == (2,)
        draws, _ = g.sample(g.init_params(), jax.random.PRNGKey(0), 16)
        w = np.asarray(draws["w"])
        assert w.shape == (16, 3)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-10)
        assert (w > 0).all()

    def test_pd_matrix_support_raises(self):
        @zs.meta_bayesian_net()
        def m():
            bn = zs.BayesianNet()
            from zhusuan_tpu.distributions import Wishart
            bn.stochastic("S", Wishart(5.0, jnp.eye(2)))
            return bn

        with pytest.raises(ValueError, match="PD-matrix"):
            MeanFieldGuide(m())

    def test_no_free_latents_raises(self):
        with pytest.raises(ValueError, match="no free latents"):
            MeanFieldGuide(
                unconstrained_model(),
                observed={"x": 0.0, "z": jnp.zeros(2)},
            )

    def test_bijector_override(self):
        g = MeanFieldGuide(
            constrained_model(), observed={"y": 0.0},
            bijectors={"tau": zs.bijectors.Exp()},
        )
        assert type(g.bijectors["tau"]).__name__ == "Exp"
        samples, _ = g.sample(g.init_params(), KEY, n_samples=8)
        assert (np.asarray(samples["tau"]) > 0).all()


def _fit(guide, model, observed, n_iters=600, n_particles=64, lr=5e-2,
         key=KEY):
    params = guide.init_params()
    opt = optax.adam(optax.cosine_decay_schedule(lr, n_iters, 1e-3))
    state = opt.init(params)

    @jax.jit
    def step(p, s, k):
        def loss(pp):
            lat = guide.latent(pp, k, n_samples=n_particles)
            return elbo(model, observed, latent=lat, axis=0).sgvb()

        val, grads = jax.value_and_grad(loss)(p)
        upd, s = opt.update(grads, s)
        return optax.apply_updates(p, upd), s, val

    for i in range(n_iters):
        key, sub = jax.random.split(key)
        params, state, val = step(params, state, sub)
    return params, float(val)


@pytest.mark.slow
class TestEndToEnd:
    def test_meanfield_recovers_marginal_moments(self):
        x = 1.0
        mean, cov = exact_posterior_2d(x)
        g = MeanFieldGuide(unconstrained_model(), observed={"x": x})
        params, _ = _fit(g, unconstrained_model(), {"x": x},
                         n_iters=1500, n_particles=128)
        draws = g.sample_posterior(
            params, jax.random.fold_in(KEY, 9), 20_000
        )["z"]
        np.testing.assert_allclose(
            np.asarray(draws).mean(axis=0), mean, atol=0.05
        )
        # Mean-field on a correlated posterior UNDERESTIMATES marginal
        # variance (the classic failure) — it matches the conditional,
        # not the marginal; just check it's in the right regime.
        assert np.all(np.asarray(draws).std(axis=0) <= np.sqrt(
            np.diag(cov)) + 0.05)

    def test_fullrank_recovers_covariance(self):
        x = 1.0
        mean, cov = exact_posterior_2d(x)
        g = FullRankGuide(unconstrained_model(), observed={"x": x})
        params, _ = _fit(g, unconstrained_model(), {"x": x},
                         n_iters=1500, n_particles=128)
        # The Gaussian posterior is inside the full-rank family: the
        # fitted unconstrained covariance must match EXACTLY (identity
        # bijector), cross-correlation included.
        np.testing.assert_allclose(
            np.asarray(g.covariance(params)), cov, atol=0.04
        )
        np.testing.assert_allclose(
            np.asarray(g.median(params)["z"]), mean, atol=0.05
        )

    def test_fullrank_beats_meanfield_elbo(self):
        x = 1.5
        mf = MeanFieldGuide(unconstrained_model(), observed={"x": x})
        fr = FullRankGuide(unconstrained_model(), observed={"x": x})
        _, l_mf = _fit(mf, unconstrained_model(), {"x": x})
        _, l_fr = _fit(fr, unconstrained_model(), {"x": x}, n_iters=800)
        # Losses are -ELBO estimates; full-rank must fit strictly
        # better on a correlated posterior.
        assert l_fr < l_mf - 0.05, (l_fr, l_mf)

    def test_constrained_model_fit_matches_conjugate(self):
        # tau ~ Gamma(3, 2), y | tau ~ N(0, 1/sqrt(tau)); Normal-Gamma
        # conjugacy: tau | y ~ Gamma(3.5, 2 + y^2/2).
        y = 0.8
        g = MeanFieldGuide(constrained_model(), observed={"y": y})
        params, _ = _fit(g, constrained_model(), {"y": y}, n_iters=800)
        draws = np.asarray(g.sample_posterior(
            params, jax.random.fold_in(KEY, 11), 50_000
        )["tau"])
        a, b = 3.5, 2.0 + y**2 / 2.0
        # Lognormal-vs-gamma family mismatch: means agree to a few
        # percent at this concentration.
        assert abs(draws.mean() - a / b) < 0.12 * a / b, draws.mean()
        assert abs(draws.std() - np.sqrt(a) / b) < 0.2 * np.sqrt(a) / b


class TestADVIOneCall:
    def test_advi_recovers_conjugate_posterior(self):
        # Conjugate normal-mean model: ADVI's mean-field Gaussian IS the
        # exact posterior family, so the fit must match the closed form.
        import zhusuan_tpu as zs

        sigma, tau = 1.0, 3.0
        y = np.asarray([1.2, 2.1, 1.7, 2.5, 0.9, 1.4, 2.2, 1.8])

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            mu = bn.normal("mu", jnp.asarray(0.0), std=jnp.asarray(tau))
            mean = jnp.broadcast_to(
                mu.tensor[..., None], mu.tensor.shape + (len(y),)
            )
            bn.normal("y", mean, std=jnp.asarray(sigma), group_ndims=1)
            return bn

        res = zs.variational.advi(
            model(), {"y": jnp.asarray(y)}, jax.random.PRNGKey(0),
            n_iters=2500, n_samples=64,
        )
        prec = 1 / tau**2 + len(y) / sigma**2
        post_mean = (y.sum() / sigma**2) / prec
        post_sd = 1 / np.sqrt(prec)
        draws = res.guide.sample_posterior(
            res.params, jax.random.PRNGKey(1), 8000
        )["mu"]
        assert abs(float(jnp.mean(draws)) - post_mean) < 0.05
        assert abs(float(jnp.std(draws)) - post_sd) < 0.05
        assert float(res.losses[-1]) < float(res.losses[0])
        assert res.losses.shape == (2500,)

    def test_advi_fullrank_and_validation(self):
        import zhusuan_tpu as zs

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            bn.normal("z", jnp.zeros(2), std=jnp.asarray(1.0),
                      group_ndims=1)
            return bn

        res = zs.variational.advi(
            model(), {}, jax.random.PRNGKey(0), guide="fullrank",
            n_iters=1500, n_samples=64,
        )
        cov = res.guide.covariance(res.params)
        np.testing.assert_allclose(np.asarray(cov), np.eye(2), atol=0.2)
        with pytest.raises(ValueError, match="guide must be"):
            zs.variational.advi(model(), {}, jax.random.PRNGKey(0),
                                guide="banana")
