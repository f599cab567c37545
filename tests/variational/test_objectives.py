"""Variational objective tests: estimator values and gradients vs analytic
KL between Normals.

Port of the contract in reference ``tests/variational/test_exclusive_kl.py``
(ELBO value ≈ -KL at :26-47, SGVB grads ≈ analytic at :49-78, REINFORCE at
:80-111), ``test_monte_carlo.py`` (IWAE k=1 == ELBO, monotone in k at
:25-70, VIMCO ≈ SGVB grads at :104-142) and ``test_inclusive_kl.py``
(importance grads ≈ analytic KL(p||q) grads at :26-92).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.framework import BayesianNet
from zhusuan_tpu.variational import (
    elbo,
    importance_weighted_objective,
    klpq,
)
from tests.variational.utils import kl_normal_normal

KEY = jax.random.PRNGKey(1234)

MEAN_P, LOGSTD_P = 1.5, 0.2


def log_joint_p(observed):
    """log p(x) for p = N(MEAN_P, e^LOGSTD_P)."""
    return zs.distributions.Normal(MEAN_P, logstd=LOGSTD_P).log_prob(
        observed["x"]
    )


def make_q(mean_q, logstd_q, n_samples, key=KEY, reparam=True):
    q = BayesianNet(key=key)
    q.normal(
        "x", mean_q, logstd=logstd_q, n_samples=n_samples,
        is_reparameterized=reparam,
    )
    return q


class TestELBO:
    def test_value_matches_neg_kl(self):
        mean_q, logstd_q = jnp.float64(0.8), jnp.float64(-0.4)
        q = make_q(mean_q, logstd_q, 200_000)
        lb = elbo(log_joint_p, {}, variational=q, axis=0)
        analytic = -kl_normal_normal(mean_q, logstd_q, MEAN_P, LOGSTD_P)
        np.testing.assert_allclose(
            float(lb.tensor), float(analytic), rtol=1e-2, atol=1e-2
        )

    def test_sgvb_gradients(self):
        def cost(mean_q, logstd_q):
            q = make_q(mean_q, logstd_q, 100_000)
            return elbo(log_joint_p, {}, variational=q, axis=0).sgvb()

        g = jax.grad(cost, argnums=(0, 1))(
            jnp.float64(0.8), jnp.float64(-0.4)
        )
        tg = jax.grad(kl_normal_normal, argnums=(0, 1))(
            jnp.float64(0.8), jnp.float64(-0.4),
            jnp.float64(MEAN_P), jnp.float64(LOGSTD_P),
        )
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(tg), rtol=2e-2, atol=2e-2
        )

    def test_sgvb_gradients_at_p_equals_q(self):
        def cost(mean_q, logstd_q):
            q = make_q(mean_q, logstd_q, 50_000)
            return elbo(log_joint_p, {}, variational=q, axis=0).sgvb()

        g = jax.grad(cost, argnums=(0, 1))(
            jnp.float64(MEAN_P), jnp.float64(LOGSTD_P)
        )
        # At p == q the SGVB gradient is low-variance but not exactly 0.
        np.testing.assert_allclose(np.asarray(g), [0.0, 0.0], atol=2e-2)

    def test_reinforce_gradients(self):
        def cost(mean_q, logstd_q):
            q = make_q(mean_q, logstd_q, 1_000_000, reparam=False)
            c = elbo(log_joint_p, {}, variational=q, axis=0).reinforce()
            return c

        g = jax.grad(cost, argnums=(0, 1))(
            jnp.float64(0.8), jnp.float64(-0.2)
        )
        tg = jax.grad(kl_normal_normal, argnums=(0, 1))(
            jnp.float64(0.8), jnp.float64(-0.2),
            jnp.float64(MEAN_P), jnp.float64(LOGSTD_P),
        )
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(tg), rtol=0.1, atol=0.02
        )

    def test_reinforce_gradients_at_p_equals_q(self):
        # At p == q the learning signal is identically zero, so the
        # REINFORCE gradient is exactly zero (reference
        # test_exclusive_kl.py:109-111 atol 1e-6).
        def cost(mean_q, logstd_q):
            q = make_q(mean_q, logstd_q, 1000, reparam=False)
            return elbo(log_joint_p, {}, variational=q, axis=0).reinforce()

        g = jax.grad(cost, argnums=(0, 1))(
            jnp.float64(MEAN_P), jnp.float64(LOGSTD_P)
        )
        np.testing.assert_allclose(np.asarray(g), [0.0, 0.0], atol=1e-6)

    def test_reinforce_moving_mean_state(self):
        q = make_q(0.8, -0.2, 100, reparam=False)
        lb = elbo(log_joint_p, {}, variational=q, axis=0)
        cost, new_mm = lb.reinforce(moving_mean=jnp.float64(0.0), decay=0.9)
        assert np.isfinite(float(cost))
        assert np.isfinite(float(new_mm))

    def test_latent_interface(self):
        # Deprecated-style latent={name: (samples, log_probs)} still works.
        samples = jax.random.normal(KEY, (5000,), jnp.float64) * 0.7 + 0.8
        q_dist = zs.distributions.Normal(0.8, std=0.7)
        lb = elbo(
            log_joint_p, {}, latent={"x": (samples, q_dist.log_prob(samples))},
            axis=0,
        )
        analytic = -kl_normal_normal(
            jnp.float64(0.8), jnp.log(jnp.float64(0.7)),
            jnp.float64(MEAN_P), jnp.float64(LOGSTD_P),
        )
        np.testing.assert_allclose(
            float(lb.tensor), float(analytic), atol=0.05
        )

    def test_exclusive_latent_and_variational(self):
        q = make_q(0.0, 0.0, 10)
        with pytest.raises(ValueError, match="Exactly one"):
            elbo(log_joint_p, {}, latent={}, variational=q)
        with pytest.raises(ValueError, match="Exactly one"):
            elbo(log_joint_p, {})


class TestImportanceWeighted:
    def test_k1_equals_elbo(self):
        q = make_q(0.8, -0.4, 1)
        lb_elbo = elbo(log_joint_p, {}, variational=q, axis=0)
        q2 = make_q(0.8, -0.4, 1)
        lb_iw = importance_weighted_objective(
            log_joint_p, {}, variational=q2, axis=0
        )
        np.testing.assert_allclose(
            float(lb_iw.tensor), float(lb_elbo.tensor), rtol=1e-10
        )

    def test_monotone_in_k(self):
        # E[IW bound] is non-decreasing in k; average over replicates.
        values = []
        for k in (1, 5, 50, 500):
            keys = jax.random.split(KEY, 500)

            def one(key, k=k):
                q = make_q(0.5, -0.6, k, key=key)
                return importance_weighted_objective(
                    log_joint_p, {}, variational=q, axis=0
                ).tensor

            values.append(float(jnp.mean(jax.vmap(one)(keys))))
        assert values == sorted(values)

    def test_axis_required(self):
        q = make_q(0.0, 0.0, 10)
        with pytest.raises(ValueError, match="axis"):
            importance_weighted_objective(log_joint_p, {}, variational=q)

    def test_vimco_requires_k_ge_2(self):
        q = make_q(0.0, 0.0, 1)
        lb = importance_weighted_objective(
            log_joint_p, {}, variational=q, axis=0
        )
        with pytest.raises(ValueError, match="multi-sample"):
            lb.vimco()

    def test_vimco_gradients_match_sgvb(self):
        # VIMCO (score-function) and IWAE-SGVB (reparameterized) estimate
        # the same gradient; with many samples they should agree
        # (reference test_monte_carlo.py:104-142).
        k, n_rep = 10, 20_000

        def vimco_cost(mean_q, logstd_q):
            keys = jax.random.split(KEY, n_rep)

            def one(key):
                q = make_q(mean_q, logstd_q, k, key=key, reparam=False)
                lb = importance_weighted_objective(
                    log_joint_p, {}, variational=q, axis=0
                )
                return lb.vimco()

            return jnp.mean(jax.vmap(one)(keys))

        def sgvb_cost(mean_q, logstd_q):
            keys = jax.random.split(KEY, n_rep)

            def one(key):
                q = make_q(mean_q, logstd_q, k, key=key)
                lb = importance_weighted_objective(
                    log_joint_p, {}, variational=q, axis=0
                )
                return lb.sgvb()

            return jnp.mean(jax.vmap(one)(keys))

        args = (jnp.float64(0.8), jnp.float64(-0.2))
        g_vimco = jax.grad(vimco_cost, argnums=(0, 1))(*args)
        g_sgvb = jax.grad(sgvb_cost, argnums=(0, 1))(*args)
        np.testing.assert_allclose(
            np.asarray(g_vimco), np.asarray(g_sgvb), rtol=0.05, atol=0.02
        )

    def test_vimco_gradients_at_p_equals_q(self):
        # At p == q, on the same samples, the VIMCO gradient coincides with
        # the IWAE-SGVB gradient pointwise (both reduce to the score term);
        # reference test_monte_carlo.py:141-142 (atol 1e-6).
        def vimco_cost(mean_q, logstd_q):
            q = make_q(mean_q, logstd_q, 100, reparam=False)
            lb = importance_weighted_objective(
                log_joint_p, {}, variational=q, axis=0
            )
            return lb.vimco()

        def sgvb_cost(mean_q, logstd_q):
            q = make_q(mean_q, logstd_q, 100, reparam=True)
            lb = importance_weighted_objective(
                log_joint_p, {}, variational=q, axis=0
            )
            return lb.sgvb()

        args = (jnp.float64(MEAN_P), jnp.float64(LOGSTD_P))
        g_vimco = jax.grad(vimco_cost, argnums=(0, 1))(*args)
        g_sgvb = jax.grad(sgvb_cost, argnums=(0, 1))(*args)
        np.testing.assert_allclose(
            np.asarray(g_vimco), np.asarray(g_sgvb), atol=1e-6
        )


class TestInclusiveKL:
    def test_cannot_evaluate(self):
        q = make_q(0.0, 0.0, 10)
        obj = klpq(log_joint_p, {}, variational=q, axis=0)
        with pytest.raises(NotImplementedError, match="only be optimized"):
            _ = obj.tensor

    def test_importance_gradients(self):
        # Self-normalized IS gradient of KL(p||q) w.r.t. q params
        # (reference test_inclusive_kl.py:26-92; note KL(p||q) here).
        def kl_pq(mean_q, logstd_q):
            # KL(p || q) analytic.
            return kl_normal_normal(
                jnp.float64(MEAN_P), jnp.float64(LOGSTD_P), mean_q, logstd_q
            )

        def cost(mean_q, logstd_q):
            keys = jax.random.split(KEY, 2000)

            def one(key):
                q = make_q(mean_q, logstd_q, 1000, key=key, reparam=False)
                return klpq(
                    log_joint_p, {}, variational=q, axis=0
                ).importance()

            return jnp.mean(jax.vmap(one)(keys[:20]))

        args = (jnp.float64(1.0), jnp.float64(0.0))
        g = jax.grad(cost, argnums=(0, 1))(*args)
        tg = jax.grad(kl_pq, argnums=(0, 1))(*args)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(tg), rtol=0.1, atol=0.02
        )

    def test_single_sample_warns(self):
        q = make_q(0.0, 0.0, None)
        obj = klpq(log_joint_p, {}, variational=q)
        with pytest.warns(UserWarning, match="self-normalized"):
            obj.importance()


class TestReinforceCenterIsPreUpdate:
    def test_signal_centered_with_pre_update_mean(self):
        """The NVIL center must be the PRE-update moving mean (reference
        exclusive_kl.py:215-217 subtracts the variable read, not the
        assign result): a post-update center contains (1-decay) of the
        batch's own signal and biases the score gradient. Verified by
        reconstructing the surrogate from the centered signal."""
        samples = jax.random.normal(KEY, (64,), jnp.float64) * 0.7 + 0.8
        q_dist = zs.distributions.Normal(0.8, std=0.7)
        log_q = q_dist.log_prob(samples)
        lb = elbo(log_joint_p, {}, latent={"x": (samples, log_q)}, axis=0)
        m0, decay = jnp.float64(1.7), 0.9
        cost, new_mm = lb.reinforce(moving_mean=m0, decay=decay)

        l_signal = np.asarray(log_joint_p({"x": samples})) - np.asarray(
            log_q)
        np.testing.assert_allclose(
            float(new_mm),
            decay * float(m0) + (1 - decay) * l_signal.mean(), rtol=1e-6)
        # cost = -log_joint + sg(centered signal) * entropy, with
        # entropy = -log_q.
        expected_cost = np.mean(
            -np.asarray(log_joint_p({"x": samples}))
            - (l_signal - float(m0)) * np.asarray(log_q))
        np.testing.assert_allclose(float(cost), expected_cost, rtol=1e-6)
