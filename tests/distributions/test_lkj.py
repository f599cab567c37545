"""LKJCholesky prior (beyond-reference; distributions/lkj.py).

Validation anchors:
- d=2 closed form: density over r = L_21 is
  (1-r^2)^(eta-1) / (2^(2eta-1) B(eta, eta)).
- Known theorem: EVERY off-diagonal r_ij of C = L L^T is marginally
  2*Beta(a, a) - 1 with a = eta + (d-2)/2 — a strong cross-pair
  constraint on the sampler's column concentrations.
- Quadrature normalization and sample/log_prob importance consistency.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from zhusuan_tpu.distributions import LKJCholesky

KEY = jax.random.PRNGKey(11)


def _valid_chol(L):
    C = L @ np.swapaxes(L, -1, -2)
    ok_diag = np.allclose(np.diagonal(C, axis1=-2, axis2=-1), 1.0,
                          atol=1e-5)
    ok_tri = np.allclose(np.triu(L, k=1), 0.0)
    ok_pos = np.all(np.diagonal(L, axis1=-2, axis2=-1) > 0)
    return ok_diag and ok_tri and ok_pos


class TestSampler:
    def test_samples_are_correlation_cholesky(self):
        for d, eta in [(2, 1.0), (3, 0.7), (5, 2.0)]:
            dist = LKJCholesky(d, jnp.float64(eta))
            L = np.asarray(dist.sample(jax.random.fold_in(KEY, d),
                                       n_samples=500))
            assert L.shape == (500, d, d)
            assert _valid_chol(L)

    def test_offdiagonal_marginals(self):
        # r_ij ~ 2*Beta(a, a) - 1 with a = eta + (d-2)/2, for EVERY pair.
        d, eta = 4, 1.5
        a = eta + (d - 2) / 2.0
        dist = LKJCholesky(d, jnp.float64(eta))
        L = np.asarray(dist.sample(KEY, n_samples=40_000))
        C = L @ np.swapaxes(L, -1, -2)
        for i in range(d):
            for j in range(i):
                r = C[:, i, j]
                u = (r + 1.0) / 2.0
                _, p = stats.kstest(u, stats.beta(a, a).cdf)
                assert p > 0.005, (i, j, p)

    def test_eta_one_uniform_d3(self):
        # eta=1, d=3: off-diagonals marginally 2*Beta(1.5, 1.5)-1.
        dist = LKJCholesky(3, jnp.float64(1.0))
        L = np.asarray(dist.sample(jax.random.PRNGKey(5),
                                   n_samples=40_000))
        C = L @ np.swapaxes(L, -1, -2)
        u = (C[:, 2, 1] + 1.0) / 2.0
        _, p = stats.kstest(u, stats.beta(1.5, 1.5).cdf)
        assert p > 0.005, p

    def test_large_eta_concentrates_near_identity(self):
        d = 3
        loose = LKJCholesky(d, jnp.float64(1.0))
        tight = LKJCholesky(d, jnp.float64(50.0))
        Ll = np.asarray(loose.sample(KEY, n_samples=2000))
        Lt = np.asarray(tight.sample(KEY, n_samples=2000))
        off = lambda L: np.abs(
            (L @ np.swapaxes(L, -1, -2))[:, 1, 0]
        ).mean()
        assert off(Lt) < 0.25 * off(Ll)


class TestLogProb:
    def test_d2_closed_form(self):
        for eta in (0.5, 1.0, 2.5):
            dist = LKJCholesky(2, jnp.float64(eta))
            for r in (-0.8, -0.2, 0.0, 0.5, 0.95):
                L = jnp.asarray(
                    [[1.0, 0.0], [r, math.sqrt(1 - r**2)]], jnp.float64
                )
                want = (
                    (eta - 1.0) * math.log(1 - r**2)
                    - (2 * eta - 1) * math.log(2.0)
                    - (math.lgamma(eta) * 2 - math.lgamma(2 * eta))
                )
                np.testing.assert_allclose(
                    float(dist.log_prob(L)), want, rtol=1e-8,
                )

    def test_d2_normalizes_by_quadrature(self):
        # The free coordinate is r = L_21; integrate the density over it.
        eta = 1.7
        dist = LKJCholesky(2, jnp.float64(eta))
        r = jnp.linspace(-0.9999, 0.9999, 20001, dtype=jnp.float64)
        Ls = jnp.stack(
            [
                jnp.stack([jnp.ones_like(r), jnp.zeros_like(r)], -1),
                jnp.stack([r, jnp.sqrt(1 - r * r)], -1),
            ],
            axis=-2,
        )
        dens = jnp.exp(dist.log_prob(Ls))
        total = float(jnp.trapezoid(dens, r))
        assert abs(total - 1.0) < 1e-3, total

    def test_importance_consistency_d4(self):
        # E_{L ~ LKJ(eta0)}[exp(lp_eta1 - lp_eta0)] = 1 iff both
        # normalizing constants (and the map) are right.
        eta0, eta1 = 1.0, 2.0
        d0 = LKJCholesky(4, jnp.float64(eta0))
        d1 = LKJCholesky(4, jnp.float64(eta1))
        # 60k draws (round-5 thin): measured |mean-1| = 0.0039 vs the
        # 0.02 bound (0.0004 at 200k) — 7s saved, margin intact.
        L = d0.sample(jax.random.PRNGKey(9), n_samples=60_000)
        ratio = jnp.exp(d1.log_prob(L) - d0.log_prob(L))
        assert abs(float(jnp.mean(ratio)) - 1.0) < 0.02, float(
            jnp.mean(ratio))

    def test_log_prob_of_own_samples_finite(self):
        dist = LKJCholesky(5, jnp.float64(0.8))
        L = dist.sample(KEY, n_samples=100)
        lp = np.asarray(dist.log_prob(L))
        assert np.all(np.isfinite(lp))

    def test_group_ndims_and_batch_given(self):
        dist = LKJCholesky(3, jnp.float64(1.0))
        L = dist.sample(KEY, n_samples=7)
        assert dist.log_prob(L).shape == (7,)


class TestValidation:
    def test_bad_d(self):
        with pytest.raises(ValueError, match="d must be"):
            LKJCholesky(1, 1.0)

    def test_bad_eta_shape(self):
        with pytest.raises(ValueError, match="scalar"):
            LKJCholesky(3, jnp.ones(2))


class TestSupport:
    def test_out_of_support_is_neg_inf(self):
        dist = LKJCholesky(3, jnp.float64(1.0))
        eye = jnp.eye(3, dtype=jnp.float64)
        # Valid: identity IS a correlation Cholesky factor.
        assert np.isfinite(float(dist.log_prob(eye)))
        # Scaled identity: rows not unit norm.
        assert float(dist.log_prob(2.0 * eye)) == -np.inf
        # Non-zero upper triangle.
        bad_u = eye.at[0, 2].set(0.5)
        assert float(dist.log_prob(bad_u)) == -np.inf
        # |L_21| > 1 (would be clipped silently before the fix).
        bad_r = jnp.asarray(
            [[1.0, 0.0, 0.0], [1.5, 0.1, 0.0], [0.0, 0.0, 1.0]],
            jnp.float64,
        )
        assert float(dist.log_prob(bad_r)) == -np.inf
        # Negative diagonal.
        bad_d = eye.at[1, 1].set(-1.0)
        assert float(dist.log_prob(bad_d)) == -np.inf
