"""VR (Renyi) and CUBO (chi-square) objective tests. Beyond reference
parity (Li & Turner 2016; Dieng et al. 2017).

Conjugate setup: z ~ N(0,1), x | z ~ N(z,1), x0 = 1, so
log Z = log N(x0; 0, sqrt(2)) is analytic and the sandwich
ELBO <= L_alpha (0 <= alpha <= 1) <= log Z <= CUBO_2 is checkable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.framework import BayesianNet
from zhusuan_tpu.variational import (
    cubo_objective,
    importance_weighted_objective,
    vr_objective,
)

X0 = 1.0
LOG_Z = float(
    zs.distributions.Normal(
        jnp.float64(0.0), std=jnp.float64(np.sqrt(2.0))
    ).log_prob(jnp.float64(X0))
)
POST_MEAN, POST_STD = 0.5, float(np.sqrt(0.5))


def log_joint(observed):
    z = observed["z"]
    one = jnp.float64(1.0)
    return (
        zs.distributions.Normal(jnp.float64(0.0), std=one).log_prob(z)
        + zs.distributions.Normal(z, std=one).log_prob(jnp.float64(X0))
    )


def make_q(mean_q, logstd_q, n_samples, key=jax.random.PRNGKey(3)):
    q = BayesianNet(key=key)
    q.normal(
        "z", jnp.float64(mean_q), logstd=jnp.float64(logstd_q),
        n_samples=n_samples, is_reparameterized=True,
    )
    return q


class TestRenyi:
    def test_alpha0_equals_iwae(self):
        q = make_q(0.2, 0.1, 64)
        vr = vr_objective(log_joint, {}, variational=q, axis=0, alpha=0.0)
        iw = importance_weighted_objective(
            log_joint, {}, variational=q, axis=0
        )
        np.testing.assert_allclose(
            float(vr.tensor), float(iw.tensor), rtol=1e-12
        )

    def test_alpha1_is_elbo_limit(self):
        q = make_q(0.2, 0.1, 200_000)
        vr1 = vr_objective(log_joint, {}, variational=q, axis=0, alpha=1.0)
        vr_near1 = vr_objective(
            log_joint, {}, variational=q, axis=0, alpha=1.0 - 1e-6
        )
        np.testing.assert_allclose(
            float(vr1.tensor), float(vr_near1.tensor), rtol=0, atol=1e-4
        )

    def test_monotone_nonincreasing_in_alpha(self):
        q = make_q(0.9, 0.4, 100_000)
        alphas = [-1.0, 0.0, 0.5, 1.0, 2.0]
        vals = [
            float(
                vr_objective(
                    log_joint, {}, variational=q, axis=0, alpha=a
                ).tensor
            )
            for a in alphas
        ]
        assert all(
            vals[i] >= vals[i + 1] - 1e-12 for i in range(len(vals) - 1)
        ), vals

    def test_sandwich_log_z(self):
        # ELBO <= L_0.5 <= log Z <= CUBO_2 on a displaced q, large K.
        q = make_q(0.8, 0.2, 200_000)
        elbo_v = float(
            vr_objective(log_joint, {}, variational=q, axis=0, alpha=1.0).tensor
        )
        vr_half = float(
            vr_objective(log_joint, {}, variational=q, axis=0, alpha=0.5).tensor
        )
        cubo2 = float(
            cubo_objective(log_joint, {}, variational=q, axis=0, n=2.0).tensor
        )
        assert elbo_v < vr_half < LOG_Z < cubo2, (
            elbo_v, vr_half, LOG_Z, cubo2,
        )

    def test_vr_optimization_recovers_posterior(self):
        def cost(params, key):
            q = BayesianNet(key=key)
            q.normal(
                "z", params["mu"], logstd=params["logstd"], n_samples=64,
                is_reparameterized=True,
            )
            return vr_objective(
                log_joint, {}, variational=q, axis=0, alpha=0.5
            ).sgvb()

        params = {"mu": jnp.float64(-1.5), "logstd": jnp.float64(0.8)}
        opt = optax.adam(5e-2)
        state = opt.init(params)

        @jax.jit
        def step(params, state, key):
            g = jax.grad(cost)(params, key)
            upd, state = opt.update(g, state)
            return optax.apply_updates(params, upd), state

        key = jax.random.PRNGKey(0)
        for _ in range(500):
            key, sub = jax.random.split(key)
            params, state = step(params, state, sub)
        assert abs(float(params["mu"]) - POST_MEAN) < 0.07
        assert abs(float(jnp.exp(params["logstd"])) - POST_STD) < 0.07

    def test_axis_required(self):
        q = make_q(0.2, 0.1, 8)
        with pytest.raises(ValueError, match="axis"):
            vr_objective(log_joint, {}, variational=q, alpha=0.5)


class TestCUBO:
    def test_equals_log_z_at_posterior(self):
        # w is constant when q == posterior, so CUBO == log Z pathwise.
        q = make_q(POST_MEAN, np.log(POST_STD), 128)
        cubo2 = float(
            cubo_objective(log_joint, {}, variational=q, axis=0, n=2.0).tensor
        )
        np.testing.assert_allclose(cubo2, LOG_Z, rtol=0, atol=1e-10)

    def test_n_below_one_rejected(self):
        q = make_q(0.2, 0.1, 8)
        with pytest.raises(ValueError, match="n >= 1"):
            cubo_objective(log_joint, {}, variational=q, axis=0, n=0.5)

    def test_exp_sgvb_optimization_recovers_posterior(self):
        def cost(params, key):
            q = BayesianNet(key=key)
            q.normal(
                "z", params["mu"], logstd=params["logstd"], n_samples=128,
                is_reparameterized=True,
            )
            return cubo_objective(
                log_joint, {}, variational=q, axis=0, n=2.0
            ).exp_sgvb()

        params = {"mu": jnp.float64(1.2), "logstd": jnp.float64(0.5)}
        opt = optax.adam(5e-2)
        state = opt.init(params)

        @jax.jit
        def step(params, state, key):
            g = jax.grad(cost)(params, key)
            upd, state = opt.update(g, state)
            return optax.apply_updates(params, upd), state

        key = jax.random.PRNGKey(1)
        for _ in range(600):
            key, sub = jax.random.split(key)
            params, state = step(params, state, sub)
        # chi^2 minimization overdisperses relative to the posterior by
        # design (mass-covering); mean must land, std >= posterior std.
        assert abs(float(params["mu"]) - POST_MEAN) < 0.1
        fitted_std = float(jnp.exp(params["logstd"]))
        assert POST_STD - 0.05 < fitted_std < POST_STD + 0.25


class TestExpSgvbGlobalShift:
    def test_batched_gradient_proportional_to_true_surrogate(self):
        # ADVICE r4: with extra batch dims, the aggregate gradient of the
        # summed exp_sgvb cost must be PROPORTIONAL to the gradient of the
        # true (unshifted) surrogate sum_b E[w_b^n] — a per-element shift
        # would reweight batch elements. Two batch elements with very
        # different weight magnitudes expose any per-element scaling.
        n = 2.0

        def batched_log_joint(obs):
            z = obs["z"]  # [K, B]
            mu_p = jnp.asarray([0.0, 6.0])  # element 2 far from q
            return -0.5 * (z - mu_p) ** 2

        def make_costs(params, key):
            q = BayesianNet(key=key)
            q.normal(
                "z",
                jnp.broadcast_to(params["mu"], (2,)),
                logstd=params["logstd"],
                n_samples=64,
                is_reparameterized=True,
            )
            obj = cubo_objective(
                batched_log_joint, {}, variational=q, axis=0, n=n
            )
            stable = jnp.sum(obj.exp_sgvb())
            # True surrogate (unshifted): mean over K of w^n, summed
            # over the batch — numerically fine at these scales in f64.
            lw = obj._log_joint_term() + obj._entropy_term()
            true = jnp.sum(jnp.mean(jnp.exp(n * lw), axis=0))
            return stable, true

        params = {"mu": jnp.float64(1.0), "logstd": jnp.float64(0.2)}
        key = jax.random.PRNGKey(3)
        g_stable = jax.grad(lambda p: make_costs(p, key)[0])(params)
        g_true = jax.grad(lambda p: make_costs(p, key)[1])(params)
        ratios = [
            float(g_stable[k]) / float(g_true[k]) for k in ("mu", "logstd")
        ]
        assert ratios[0] > 0.0
        np.testing.assert_allclose(ratios[0], ratios[1], rtol=1e-8)
