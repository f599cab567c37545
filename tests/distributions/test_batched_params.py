"""Batched-parameter VALUE agreement with scipy, per distribution family.

The contract sweep (test_contract.py) proves batched parameters give the
right SHAPES; the per-class scipy tests (test_univariate/_multivariate.py)
prove the right VALUES at one parameter point. This file closes the gap
between them — wrong-axis broadcasting inside a log-prob formula produces
correctly-shaped wrong numbers, which only a per-batch-element scipy loop
catches (the reference suite's batched blocks in
tests/distributions/test_multivariate.py are the model).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from zhusuan_tpu import distributions as zd

KEY = jax.random.PRNGKey(0)
RNG = np.random.RandomState(7)


def _f64(x):
    return jnp.asarray(x, jnp.float64)


class TestBatchedUnivariate:
    """[3, 2]-batched parameters scored at [5, 3, 2] points, compared
    element-by-element against scipy."""

    CASES = [
        (
            "Normal",
            lambda m, s: zd.Normal(mean=_f64(m), std=_f64(s)),
            lambda x, m, s: stats.norm.logpdf(x, m, s),
        ),
        (
            "Gamma",
            lambda a, b: zd.Gamma(_f64(a), _f64(b)),
            lambda x, a, b: stats.gamma.logpdf(x, a, scale=1.0 / b),
        ),
        (
            "Beta",
            lambda a, b: zd.Beta(_f64(a), _f64(b)),
            lambda x, a, b: stats.beta.logpdf(x, a, b),
        ),
        (
            "Laplace",
            lambda l, s: zd.Laplace(_f64(l), _f64(s)),
            lambda x, l, s: stats.laplace.logpdf(x, l, s),
        ),
        (
            "InverseGamma",
            lambda a, b: zd.InverseGamma(_f64(a), _f64(b)),
            lambda x, a, b: stats.invgamma.logpdf(x, a, scale=b),
        ),
        (
            "Uniform",
            lambda lo, w: zd.Uniform(_f64(lo), _f64(lo + w)),
            lambda x, lo, w: stats.uniform.logpdf(x, lo, w),
        ),
    ]

    @pytest.mark.parametrize("name,make,ref", CASES,
                             ids=[c[0] for c in CASES])
    def test_batched_log_prob(self, name, make, ref):
        p1 = 0.5 + RNG.rand(3, 2) * 2.0
        p2 = 0.5 + RNG.rand(3, 2) * 2.0
        dist = make(p1, p2)
        assert dist.batch_shape == (3, 2)
        x = np.asarray(dist.sample(KEY, n_samples=5), np.float64)
        got = np.asarray(dist.log_prob(_f64(x)))
        want = np.empty_like(got)
        for i in range(3):
            for j in range(2):
                want[:, i, j] = ref(x[:, i, j], p1[i, j], p2[i, j])
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)

    def test_batched_poisson(self):
        rate = 0.5 + RNG.rand(3, 2) * 5.0
        dist = zd.Poisson(_f64(rate), dtype=jnp.float64)
        x = np.asarray(dist.sample(KEY, n_samples=5), np.float64)
        got = np.asarray(dist.log_prob(_f64(x)))
        want = np.empty_like(got)
        for i in range(3):
            for j in range(2):
                want[:, i, j] = stats.poisson.logpmf(x[:, i, j], rate[i, j])
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)

    def test_batched_binomial(self):
        logits = RNG.randn(3, 2)
        p = 1.0 / (1.0 + np.exp(-logits))
        dist = zd.Binomial(_f64(logits), n_experiments=9, dtype=jnp.float64)
        x = np.asarray(dist.sample(KEY, n_samples=5), np.float64)
        got = np.asarray(dist.log_prob(_f64(x)))
        want = np.empty_like(got)
        for i in range(3):
            for j in range(2):
                want[:, i, j] = stats.binom.logpmf(x[:, i, j], 9, p[i, j])
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


class TestBatchedMultivariate:
    def test_batched_mvn_cholesky(self):
        # Batch of 3 DIFFERENT covariances: per-element scipy agreement.
        d, B = 4, 3
        covs, chols, means = [], [], []
        for b in range(B):
            a = RNG.randn(d, d)
            cov = a @ a.T + d * np.eye(d)
            covs.append(cov)
            chols.append(np.linalg.cholesky(cov))
            means.append(RNG.randn(d))
        dist = zd.MultivariateNormalCholesky(
            _f64(np.stack(means)), _f64(np.stack(chols))
        )
        assert dist.batch_shape == (B,)
        x = np.asarray(dist.sample(KEY, n_samples=6), np.float64)
        got = np.asarray(dist.log_prob(_f64(x)))
        want = np.empty_like(got)
        for b in range(B):
            want[:, b] = stats.multivariate_normal.logpdf(
                x[:, b, :], means[b], covs[b]
            )
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_batched_dirichlet(self):
        B, k = 4, 3
        alpha = 0.5 + RNG.rand(B, k) * 3.0
        dist = zd.Dirichlet(_f64(alpha))
        x = np.asarray(dist.sample(KEY, n_samples=5), np.float64)
        got = np.asarray(dist.log_prob(_f64(x)))
        want = np.empty_like(got)
        for b in range(B):
            # Renormalize defensively (float64 sum ~1 within eps).
            xs = x[:, b, :] / x[:, b, :].sum(-1, keepdims=True)
            want[:, b] = stats.dirichlet.logpdf(xs.T, alpha[b])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_batched_multinomial(self):
        B, k, n_exp = 3, 4, 12
        logits = RNG.randn(B, k)
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        dist = zd.Multinomial(_f64(logits), n_experiments=n_exp,
                              dtype=jnp.float64)
        x = np.asarray(dist.sample(KEY, n_samples=5), np.float64)
        got = np.asarray(dist.log_prob(_f64(x)))
        want = np.empty_like(got)
        for b in range(B):
            want[:, b] = stats.multinomial.logpmf(x[:, b, :], n_exp,
                                                  probs[b])
        np.testing.assert_allclose(got, want, rtol=1e-7)

    def test_batched_onehot_categorical(self):
        B, k = 3, 5
        logits = RNG.randn(B, k)
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        dist = zd.OnehotCategorical(_f64(logits), dtype=jnp.float64)
        x = np.asarray(dist.sample(KEY, n_samples=6), np.float64)
        got = np.asarray(dist.log_prob(_f64(x)))
        want = np.log((x * probs[None]).sum(-1))
        np.testing.assert_allclose(got, want, rtol=1e-7)

    def test_batched_matrix_variate_normal(self):
        # Batch of 2 different (U, V) pairs vs kron-MVN per element.
        n, m, B = 3, 2, 2
        us, vs = [], []
        for _ in range(B):
            a = RNG.randn(n, n)
            us.append(np.linalg.cholesky(a @ a.T + n * np.eye(n)))
            c = RNG.randn(m, m)
            vs.append(np.linalg.cholesky(c @ c.T + m * np.eye(m)))
        mean = RNG.randn(B, n, m)
        dist = zd.MatrixVariateNormalCholesky(
            _f64(mean), _f64(np.stack(us)), _f64(np.stack(vs))
        )
        x = np.asarray(dist.sample(KEY, n_samples=4), np.float64)
        got = np.asarray(dist.log_prob(_f64(x)))
        want = np.empty_like(got)
        for b in range(B):
            u = us[b] @ us[b].T
            v = vs[b] @ vs[b].T
            cov = np.kron(u, v)  # row-major vec of [n, m]
            want[:, b] = stats.multivariate_normal.logpdf(
                x[:, b].reshape(-1, n * m), mean[b].reshape(n * m), cov
            )
        np.testing.assert_allclose(got, want, rtol=1e-7)
