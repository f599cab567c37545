"""Wishart prior (beyond-reference; distributions/wishart.py):
scipy-verified density, Bartlett-sampler moments, support semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from zhusuan_tpu.distributions import Wishart

KEY = jax.random.PRNGKey(13)


def _scale(d=3, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(d, d) * 0.4
    return np.eye(d) + a @ a.T


class TestLogProbVsScipy:
    @pytest.mark.parametrize("d,df", [(2, 3.0), (3, 5.5), (4, 8.0)])
    def test_matches_scipy(self, d, df):
        s = _scale(d)
        dist = Wishart(df, jnp.asarray(s, jnp.float64))
        sp = stats.wishart(df=df, scale=s)
        rng = np.random.RandomState(1)
        xs = sp.rvs(size=6, random_state=rng)
        got = np.asarray(dist.log_prob(jnp.asarray(xs)))
        want = sp.logpdf(np.transpose(xs, (1, 2, 0)))
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_non_pd_is_neg_inf(self):
        dist = Wishart(4.0, jnp.eye(2, dtype=jnp.float64))
        bad = jnp.asarray([[1.0, 2.0], [2.0, 1.0]], jnp.float64)  # indef
        assert float(dist.log_prob(bad)) == -np.inf


class TestSampler:
    def test_mean_and_variance(self):
        d, df = 3, 6.0
        s = _scale(d, seed=2)
        dist = Wishart(df, jnp.asarray(s, jnp.float64))
        w = np.asarray(dist.sample(KEY, n_samples=40_000))
        # E[W] = df * S.
        np.testing.assert_allclose(w.mean(axis=0), df * s, rtol=0.03,
                                   atol=0.08)
        # Var[W_ij] = df (S_ij^2 + S_ii S_jj).
        var = w.var(axis=0)
        expect = df * (s**2 + np.outer(np.diag(s), np.diag(s)))
        np.testing.assert_allclose(var, expect, rtol=0.08)

    def test_samples_are_pd_and_scorable(self):
        dist = Wishart(5.0, jnp.asarray(_scale(4, 3), jnp.float64))
        w = dist.sample(KEY, n_samples=200)
        eigs = np.linalg.eigvalsh(np.asarray(w))
        assert eigs.min() > 0
        lp = np.asarray(dist.log_prob(w))
        assert np.all(np.isfinite(lp))

    def test_marginal_diagonal_chi2(self):
        # W_ii / S_ii ~ chi2(df) marginally.
        df = 7.0
        s = np.diag([2.0, 0.5])
        dist = Wishart(df, jnp.asarray(s, jnp.float64))
        w = np.asarray(dist.sample(KEY, n_samples=60_000))
        for i in range(2):
            _, p = stats.kstest(w[:, i, i] / s[i, i],
                                stats.chi2(df).cdf)
            assert p > 0.005, (i, p)


class TestValidation:
    def test_bad_scale_shape(self):
        with pytest.raises(ValueError, match="square"):
            Wishart(4.0, jnp.zeros((2, 3)))

    def test_df_too_small(self):
        with pytest.raises(ValueError, match="df"):
            Wishart(1.5, jnp.eye(3, dtype=jnp.float64))
