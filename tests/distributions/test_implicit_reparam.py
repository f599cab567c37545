"""Implicit reparameterization gradients (Figurnov et al. 2018) for
Gamma / Beta / Dirichlet / InverseGamma / StudentT-df — a capability the
reference could NOT offer (it marks these non-reparameterized,
reference univariate.py:733-735). MC pathwise gradients of E[f(x)] are
checked against closed forms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.distributions import (
    Beta, Dirichlet, Gamma, InverseGamma, StudentT,
)

KEY = jax.random.PRNGKey(7)
# Round-5 thin: measured max rel-err at 60k draws is 0.004 (gamma) /
# 0.001 (beta, dirichlet) vs 0.05-0.08 bounds — 200k bought nothing.
N = 60_000


def mc_grad(build, f, params, n=N, key=KEY):
    """d/dparams E[f(x)] by differentiating through the sampler."""

    def obj(p):
        d = build(*p)
        x = d.sample(n_samples=n, key=key)
        return jnp.mean(f(x))

    return jax.grad(obj)(params)


class TestImplicitReparamGradients:
    def test_gamma_mean_gradients(self):
        # E[x] = alpha/beta: dE/dalpha = 1/beta, dE/dbeta = -alpha/beta^2
        alpha, beta = 3.0, 2.0
        g = mc_grad(
            lambda a, b: Gamma(a, b, is_reparameterized=True),
            lambda x: x, (jnp.asarray(alpha), jnp.asarray(beta)),
        )
        np.testing.assert_allclose(float(g[0]), 1 / beta, rtol=0.05)
        np.testing.assert_allclose(float(g[1]), -alpha / beta ** 2,
                                   rtol=0.05)

    def test_gamma_default_carries_no_gradient(self):
        g = mc_grad(
            lambda a, b: Gamma(a, b),  # reference-parity default
            lambda x: x, (jnp.asarray(3.0), jnp.asarray(2.0)),
            n=100,
        )
        assert float(g[0]) == 0.0 and float(g[1]) == 0.0

    def test_inverse_gamma_mean_gradients(self):
        # E[x] = beta/(alpha-1) for alpha > 1.
        alpha, beta = 5.0, 2.0
        g = mc_grad(
            lambda a, b: InverseGamma(a, b, is_reparameterized=True),
            lambda x: x, (jnp.asarray(alpha), jnp.asarray(beta)),
        )
        np.testing.assert_allclose(
            float(g[0]), -beta / (alpha - 1) ** 2, rtol=0.08)
        np.testing.assert_allclose(
            float(g[1]), 1 / (alpha - 1), rtol=0.08)

    def test_beta_mean_gradients(self):
        # E[x] = a/(a+b): dE/da = b/(a+b)^2, dE/db = -a/(a+b)^2
        a, b = 2.0, 3.0
        g = mc_grad(
            lambda aa, bb: Beta(aa, bb, is_reparameterized=True),
            lambda x: x, (jnp.asarray(a), jnp.asarray(b)),
        )
        np.testing.assert_allclose(float(g[0]), b / (a + b) ** 2,
                                   rtol=0.05)
        np.testing.assert_allclose(float(g[1]), -a / (a + b) ** 2,
                                   rtol=0.05)

    def test_dirichlet_mean_gradients(self):
        # E[x_0] = a_0/S: dE[x_0]/da_0 = (S - a_0)/S^2,
        # dE[x_0]/da_j = -a_0/S^2 (j != 0).
        alpha = np.array([2.0, 1.0, 3.0])
        S = alpha.sum()
        g = mc_grad(
            lambda a: Dirichlet(a, is_reparameterized=True),
            lambda x: x[..., 0],
            (jnp.asarray(alpha),),
        )[0]
        expect = np.full(3, -alpha[0] / S ** 2)
        expect[0] = (S - alpha[0]) / S ** 2
        np.testing.assert_allclose(np.asarray(g), expect, rtol=0.08,
                                   atol=5e-4)

    def test_dirichlet_samples_still_on_simplex(self):
        d = Dirichlet(jnp.asarray([0.5, 1.5, 2.5]),
                      is_reparameterized=True)
        x = np.asarray(d.sample(n_samples=1000, key=KEY))
        assert np.all(x >= 0)
        np.testing.assert_allclose(x.sum(-1), 1.0, rtol=1e-5)

    def test_studentt_df_gradient(self):
        # E[t^2] = df/(df-2): d/ddf = -2/(df-2)^2. Needs df > 4 for a
        # finite-variance estimator; clip the tail for stability.
        df = 10.0
        g = mc_grad(
            lambda d: StudentT(d, 0.0, 1.0, reparameterize_df=True),
            lambda x: jnp.clip(x, -30.0, 30.0) ** 2,
            (jnp.asarray(df),), n=150_000,  # err 0.007 vs 0.25 bound
        )[0]
        np.testing.assert_allclose(float(g), -2 / (df - 2) ** 2,
                                   rtol=0.25)

    def test_studentt_df_stopped_by_default(self):
        g = mc_grad(
            lambda d: StudentT(d, 0.0, 1.0),
            lambda x: x ** 2, (jnp.asarray(10.0),), n=100,
        )[0]
        assert float(g) == 0.0


class TestSGVBOnGammaPosterior:
    def test_fit_conjugate_gamma_posterior(self):
        """SGVB with a reparameterized Gamma variational posterior on a
        conjugate Poisson-Gamma model: q must recover the closed-form
        posterior Gamma(a0 + sum x, b0 + n) — the workload the reference
        could not train pathwise (its Gamma had no reparameterization)."""
        import optax

        a0, b0 = 2.0, 1.0
        x_obs = np.array([3.0, 4.0, 2.0, 5.0, 3.0])
        a_post = a0 + x_obs.sum()
        b_post = b0 + len(x_obs)

        def log_joint(obs):
            lam = obs["lam"]
            prior = Gamma(jnp.asarray(a0), jnp.asarray(b0)).log_prob(lam)
            lik = jnp.sum(
                x_obs[None, :] * jnp.log(lam)[:, None]
                - lam[:, None]
                - jax.lax.lgamma(jnp.asarray(x_obs + 1.0))[None, :],
                axis=-1,
            )
            return prior + lik

        def loss_fn(params, key):
            bn = zs.BayesianNet(key=key)
            bn.gamma(
                "lam", jnp.exp(params["log_a"]), jnp.exp(params["log_b"]),
                n_samples=256, is_reparameterized=True,
            )
            lb = zs.variational.elbo(log_joint, {}, variational=bn, axis=0)
            return jnp.mean(lb.sgvb())

        params = {"log_a": jnp.asarray(1.0), "log_b": jnp.asarray(0.5)}
        opt = optax.adam(5e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, o, k):
            loss, grads = jax.value_and_grad(loss_fn)(p, k)
            updates, o = opt.update(grads, o)
            return optax.apply_updates(p, updates), o, loss

        key = jax.random.PRNGKey(0)
        for _ in range(500):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
        a_hat = float(jnp.exp(params["log_a"]))
        b_hat = float(jnp.exp(params["log_b"]))
        # Posterior mean/variance matching (a, b individually are slower
        # to pin down than the moments they imply).
        np.testing.assert_allclose(a_hat / b_hat, a_post / b_post,
                                   rtol=0.05)
        np.testing.assert_allclose(
            a_hat / b_hat ** 2, a_post / b_post ** 2, rtol=0.25)
