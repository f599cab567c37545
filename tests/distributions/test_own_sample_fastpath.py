"""Own-sample fast-path tests for MultivariateNormalCholesky.log_prob.

Scoring a distribution's OWN reparameterized sample (the q-entropy term of
every variational objective) uses ``L^{-1}(z - mean) == eps`` and skips the
triangular solve. Values and gradients must match the solve path exactly;
the path must disengage for observed values, non-reparameterized samples,
``use_path_derivative``, and across trace boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.distributions import MultivariateNormalCholesky

D = 4
KEY = jax.random.PRNGKey(11)


def make_params(dtype=jnp.float64):
    a = jax.random.normal(jax.random.PRNGKey(0), (D, D), dtype)
    tril = jnp.tril(a, -1) + jnp.diag(jnp.exp(a.diagonal() * 0.3) + 0.5)
    mean = jnp.arange(D, dtype=dtype) * 0.5
    return mean, tril


class TestOwnSampleFastPath:
    def test_value_matches_solve_path(self):
        mean, tril = make_params()
        d = MultivariateNormalCholesky(mean, tril)
        s = d.sample(KEY, n_samples=7)
        lp_fast = d.log_prob(s)            # own object: eps path
        lp_slow = d.log_prob(s * 1.0)      # new object: solve path
        np.testing.assert_allclose(
            np.asarray(lp_fast), np.asarray(lp_slow), rtol=0, atol=1e-10
        )

    def test_value_matches_solve_path_squeezed(self):
        mean, tril = make_params()
        d = MultivariateNormalCholesky(mean, tril)
        s = d.sample(KEY)                  # n_samples=None squeeze branch
        np.testing.assert_allclose(
            np.asarray(d.log_prob(s)), np.asarray(d.log_prob(s * 1.0)),
            rtol=0, atol=1e-10,
        )

    def test_grads_match_solve_path(self):
        # Gradients are compared through the standard raw->tril
        # parameterization (jnp.tril + softplus-ish diag). Raw grads of the
        # two paths agree; comparing grads wrt the tril MATRIX directly
        # would differ only in the strictly-UPPER entries, where the solve
        # path leaks a spurious sampling-path gradient through entries the
        # density ignores (and which jnp.tril masks to zero anyway).
        def lp_sum(mean, raw, fast):
            tril = jnp.tril(raw, -1) + jnp.diag(
                jnp.exp(raw.diagonal() * 0.3) + 0.5
            )
            d = MultivariateNormalCholesky(mean, tril)
            s = d.sample(KEY, n_samples=9)
            target = s if fast else s * 1.0
            return jnp.sum(d.log_prob(target))

        mean = jnp.arange(D, dtype=jnp.float64) * 0.5
        raw = jax.random.normal(jax.random.PRNGKey(0), (D, D), jnp.float64)
        g_fast = jax.grad(lp_sum, argnums=(0, 1))(mean, raw, True)
        g_slow = jax.grad(lp_sum, argnums=(0, 1))(mean, raw, False)
        for a, b in zip(g_fast, g_slow):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10
            )

    def test_path_derivative_falls_back_to_stl_grads(self):
        # With use_path_derivative the substitution is invalid; the STL
        # gradient differs from the plain one — verify the flagged dist
        # produces the STL (stopped-params) gradient, not the eps one.
        def lp_sum(mean, tril, path_derivative):
            d = MultivariateNormalCholesky(
                mean, tril, use_path_derivative=path_derivative
            )
            s = d.sample(KEY, n_samples=9)
            return jnp.sum(d.log_prob(s))

        def lp_sum_manual_stl(mean, tril):
            d = MultivariateNormalCholesky(mean, tril)
            s = d.sample(KEY, n_samples=9)
            d_sg = MultivariateNormalCholesky(
                jax.lax.stop_gradient(mean), jax.lax.stop_gradient(tril)
            )
            return jnp.sum(d_sg.log_prob(s * 1.0))

        mean, tril = make_params()
        g_stl = jax.grad(lp_sum, argnums=(0, 1))(mean, tril, True)
        g_manual = jax.grad(lp_sum_manual_stl, argnums=(0, 1))(mean, tril)
        g_plain = jax.grad(lp_sum, argnums=(0, 1))(mean, tril, False)
        for a, b in zip(g_stl, g_manual):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10
            )
        assert not np.allclose(np.asarray(g_stl[1]), np.asarray(g_plain[1]))

    def test_non_reparameterized_keeps_score_gradient(self):
        def lp_sum(mean, tril):
            d = MultivariateNormalCholesky(
                mean, tril, is_reparameterized=False
            )
            s = d.sample(KEY, n_samples=9)
            return jnp.sum(d.log_prob(s))

        mean, tril = make_params()
        g = jax.grad(lp_sum, argnums=(0, 1))(mean, tril)
        # Score-function gradients through log_prob must survive (the eps
        # path would zero the mean gradient's score part entirely only in
        # expectation, not pathwise — here it must be the exact score).
        d = MultivariateNormalCholesky(mean, tril, is_reparameterized=False)
        s = d.sample(KEY, n_samples=9)
        expected_mean_grad = jax.grad(
            lambda m: jnp.sum(
                MultivariateNormalCholesky(m, tril).log_prob(s * 1.0)
            )
        )(mean)
        np.testing.assert_allclose(
            np.asarray(g[0]), np.asarray(expected_mean_grad),
            rtol=1e-8, atol=1e-10,
        )

    def test_cross_trace_falls_back(self):
        mean, tril = make_params()
        d = MultivariateNormalCholesky(mean, tril)
        s = jax.jit(lambda k: d.sample(k, n_samples=3))(KEY)
        # The cached own-sample is a tracer from the dead jit trace; the
        # identity check must miss and the solve path must score cleanly.
        lp = d.log_prob(s)
        assert np.all(np.isfinite(np.asarray(lp)))

    def test_bn_node_cond_log_p_uses_identical_value(self):
        bn = zs.BayesianNet(key=KEY)
        mean, tril = make_params()
        node = bn.multivariate_normal_cholesky("fz", mean, tril, n_samples=5)
        np.testing.assert_allclose(
            np.asarray(node.cond_log_p),
            np.asarray(node.dist.log_prob(node.tensor * 1.0)),
            rtol=0, atol=1e-10,
        )
