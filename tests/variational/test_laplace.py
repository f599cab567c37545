"""Laplace approximation (beyond-reference; variational/laplace.py).

Gaussian targets are exact for Laplace — mode, covariance and evidence
must match closed forms; a logistic-regression posterior is compared to
quadrature within the known Laplace error."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu.variational import laplace_approximation


class TestGaussianExact:
    def test_conjugate_evidence_and_mode(self):
        # z ~ N(0,1), x ~ N(z, sigma): Laplace is EXACT.
        sigma, x_obs = 0.6, 1.3
        true_log_z = (
            -0.5 * math.log(2 * math.pi * (1 + sigma**2))
            - 0.5 * x_obs**2 / (1 + sigma**2)
        )

        def log_joint(obs):
            z = obs["z"]
            return (
                -0.5 * z**2 - 0.5 * math.log(2 * math.pi)
                - 0.5 * ((x_obs - z) / sigma) ** 2
                - math.log(sigma) - 0.5 * math.log(2 * math.pi)
            )

        res = laplace_approximation(
            log_joint, {}, {"z": jnp.float64(0.0)}, n_iters=100
        )
        post_mean = x_obs / (1 + sigma**2)
        post_var = sigma**2 / (1 + sigma**2)
        np.testing.assert_allclose(float(res.mode["z"]), post_mean,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(res.log_evidence), true_log_z,
                                   rtol=1e-6)
        # chol_precision is the sqrt of 1/post_var here.
        np.testing.assert_allclose(
            float(res.chol_precision[0, 0]) ** -2, post_var, rtol=1e-6
        )
        assert float(res.grad_norm) < 1e-6

    def test_multivariate_multi_latent(self):
        # Two independent Gaussian blocks; evidence adds exactly.
        A = jnp.asarray(np.linalg.cholesky(
            np.asarray([[2.0, 0.6], [0.6, 1.0]])))
        prec = jnp.linalg.inv(A @ A.T)
        _, ld = np.linalg.slogdet(np.asarray(A @ A.T))

        def log_joint(obs):
            a, b = obs["a"], obs["b"]
            lp = -0.5 * jnp.einsum("i,ij,j->", a - 1.0, prec, a - 1.0)
            lp += -0.5 * (float(ld) + 2 * math.log(2 * math.pi))
            lp += jnp.sum(-0.5 * ((b + 2.0) / 0.5) ** 2
                          - math.log(0.5) - 0.5 * math.log(2 * math.pi))
            return lp

        res = laplace_approximation(
            log_joint, {},
            {"a": jnp.zeros(2, jnp.float64),
             "b": jnp.zeros((3,), jnp.float64)},
            n_iters=200,
        )
        # Both blocks are normalized densities: total evidence = 0.
        np.testing.assert_allclose(float(res.log_evidence), 0.0,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.mode["a"]), 1.0,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(res.mode["b"]), -2.0,
                                   atol=1e-5)


class TestNonGaussian:
    def test_logistic_regression_evidence_near_quadrature(self):
        x_data = np.asarray([0.5, -1.2, 2.0, 0.3, -0.7])
        y_data = np.asarray([1.0, 0.0, 1.0, 1.0, 0.0])
        xj, yj = jnp.asarray(x_data), jnp.asarray(y_data)

        def log_joint(obs):
            w = obs["w"]
            logits = w * xj
            return (
                -0.5 * w**2 - 0.5 * math.log(2 * math.pi)
                + jnp.sum(yj * jax.nn.log_sigmoid(logits)
                          + (1 - yj) * jax.nn.log_sigmoid(-logits))
            )

        grid = np.linspace(-10, 10, 20001)
        lp = np.asarray(jax.vmap(
            lambda w: log_joint({"w": w}))(jnp.asarray(grid)))
        h = grid[1] - grid[0]
        from scipy.special import logsumexp
        true_log_z = float(logsumexp(lp) + math.log(h))

        res = laplace_approximation(
            log_joint, {}, {"w": jnp.float64(0.0)}, n_iters=200
        )
        # Laplace error on this nearly-Gaussian posterior is small.
        assert abs(float(res.log_evidence) - true_log_z) < 0.02, (
            float(res.log_evidence), true_log_z)

    def test_constrained_via_bijector(self):
        # sigma ~ Exponential(1), x ~ N(0, sigma) observed at 0.8:
        # Laplace in softplus-unconstrained coordinates approximates the
        # quadrature evidence.
        from zhusuan_tpu.bijectors import Softplus, transform_log_joint

        x_obs = 0.8

        def log_joint(obs):
            s = obs["sigma"]
            return (
                -s  # Exponential(1) log-density (log rate = 0)
                - 0.5 * (x_obs / s) ** 2 - jnp.log(s)
                - 0.5 * math.log(2 * math.pi)
            )

        grid = np.linspace(1e-3, 30.0, 200001)
        lp = np.asarray(jax.vmap(
            lambda s: log_joint({"sigma": s}))(jnp.asarray(grid)))
        from scipy.special import logsumexp
        true_log_z = float(logsumexp(lp) + math.log(grid[1] - grid[0]))

        ulj, to_u, to_c = transform_log_joint(
            log_joint, {"sigma": Softplus()}
        )
        res = laplace_approximation(
            ulj, {}, to_u({"sigma": jnp.float64(1.0)}), n_iters=300
        )
        assert abs(float(res.log_evidence) - true_log_z) < 0.1, (
            float(res.log_evidence), true_log_z)
        sigma_map = float(to_c(res.mode)["sigma"])
        assert 0.1 < sigma_map < 2.0


class TestValidation:
    def test_batched_latent_rejected(self):
        def log_joint(obs):
            return -0.5 * jnp.sum(obs["z"] ** 2, axis=-1)

        with pytest.raises(ValueError, match="UNBATCHED"):
            laplace_approximation(log_joint, {}, {"z": jnp.zeros((4, 2))})


class TestRobustness:
    def test_plain_optimizer_supported(self):
        # Regression: optimizer=optax.adam crashed (value_and_grad_from_
        # state requires linesearch-carrying optimizer state).
        import optax

        def log_joint(obs):
            return -0.5 * jnp.sum((obs["z"] - 2.0) ** 2)

        res = laplace_approximation(
            log_joint, {}, {"z": jnp.zeros(3, jnp.float64)},
            n_iters=2000, optimizer=optax.adam(0.05),
        )
        np.testing.assert_allclose(np.asarray(res.mode["z"]), 2.0,
                                   atol=1e-3)
        assert bool(res.pd_hessian)

    def test_non_pd_hessian_flagged(self):
        # A maximizer-free direction: the "posterior" is log-CONVEX in z,
        # so the optimizer walks away and/or curvature is negative —
        # pd_hessian must be False and log_evidence NaN, not a silent
        # plausible number.
        def log_joint(obs):
            return 0.5 * jnp.sum(obs["z"] ** 2)  # wrong-sign quadratic

        res = laplace_approximation(
            log_joint, {}, {"z": jnp.ones(2, jnp.float64)}, n_iters=5
        )
        assert not bool(res.pd_hessian)
        assert np.isnan(float(res.log_evidence))
